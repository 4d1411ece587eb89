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

  test("native session_window sessions == gap-break sessions") {
    val ev = EventStreams.events(spark, "/root/testdata/sf0.001")
    def key(df: org.apache.spark.sql.DataFrame, cols: Seq[String]) =
      df.selectExpr(cols: _*).collect().map(_.toSeq).toSet
    val a = key(EventStreams.sessionizeNative(ev),
      Seq("user_id", "session_start", "session_end", "n_events", "sum_value"))
    val b = key(EventStreams.sessionize(ev),
      Seq("user_id", "session_start", "session_end", "n_events", "sum_value"))
    assert(a == b)
  }

  test("streaming parquet sink: finalized hourly windows match batch") {
    val dir = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft_stream_out").toString
    val q = EventStreams.streamingHourlyCounts(spark, dir)
      .writeStream.outputMode("append")
      .format("parquet")
      .option("path", s"$out/data")
      .option("checkpointLocation", s"$out/ckpt")
      .start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.read.parquet(s"$out/data")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val batch = EventStreams.hourlyTypeCounts(EventStreams.events(spark, dir))
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    // append mode emits only watermark-finalized windows: a nonempty
    // subset of the batch result, with identical values where emitted
    assert(streamed.nonEmpty)
    streamed.foreach { case (k, v) => assert(batch(k) == v) }
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
