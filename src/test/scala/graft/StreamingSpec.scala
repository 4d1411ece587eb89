package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Structured Streaming parity: the streaming windowed aggregation
  * over the events parquet must reproduce the batch hourly counts
  * once all input is processed (memory sink, synchronous drain).
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)

  test("streaming hourly counts == batch hourly counts") {
    val dir = "/root/testdata/sf0.001"
    val batch = EventStreams.hourlyTypeCounts(EventStreams.events(spark, dir))
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap

    val q = EventStreams.streamingHourlyCounts(spark, dir)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hourly_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hourly_out")
        .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
        .toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("sessionization: gap breaks create new sessions") {
    val s = EventStreams.sessionize(EventStreams.events(spark, dir = "/root/testdata/sf0.001"))
      .collect()
    assert(s.nonEmpty)
    // session ids are 1-based consecutive per user
    val byUser = s.groupBy(_.getLong(0))
    byUser.foreach { case (_, rows) =>
      val ids = rows.map(_.getLong(1)).sorted
      assert(ids.head == 1L && ids.last == ids.length.toLong)
    }
  }
}
