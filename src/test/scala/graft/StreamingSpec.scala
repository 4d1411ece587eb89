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

  test("streaming trending top-k (rank in foreachBatch) == batch trendingTopK") {
    val dir = "/root/testdata/sf0.001"
    val batch = EventStreams.trendingTopK(EventStreams.events(spark, dir))
      .collect().map(r => (r.getString(0), r.getInt(4)) -> (r.getString(1), r.getLong(2)))
      .toMap
    // the documented streaming deployment: stateful hourly counts →
    // rankWindows applied per micro-batch (complete mode ⇒ the last
    // batch carries the full state, so its rank equals the batch op)
    var lastRanked: Map[(String, Int), (String, Long)] = Map.empty
    val q = EventStreams.streamingHourlyCounts(spark, dir)
      .writeStream.outputMode("complete")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        lastRanked = EventStreams.rankWindows(df)
          .collect().map(r => (r.getString(0), r.getInt(4)) -> (r.getString(1), r.getLong(2)))
          .toMap
      }.start()
    try {
      q.processAllAvailable()
      assert(lastRanked.nonEmpty && lastRanked == batch)
    } finally q.stop()
  }

  test("streaming burst flags (foreachBatch over bucket counts) == batch burstWindows") {
    val dir = "/root/testdata/sf0.001"
    val batch = graft.queries.TemporalOps
      .burstWindows(EventStreams.events(spark, dir))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    var lastFlags: Map[(String, Long), (Long, Long)] = Map.empty
    val q = EventStreams.streamingBucketCounts(spark, dir)
      .writeStream.outputMode("complete")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        lastFlags = graft.queries.TemporalOps.burstFlags(df)
          .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
          .toMap
      }.start()
    try {
      q.processAllAvailable()
      assert(lastFlags.nonEmpty && lastFlags == batch)
    } finally q.stop()
  }

  test("streaming quantile sketch (foreachBatch over bin histogram) == batch sketch") {
    val dir = "/root/testdata/sf0.001"
    val batch = graft.queries.TemporalOps
      .quantileSketch(EventStreams.events(spark, dir))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    var last: Map[String, (Long, Long, Long, Long)] = Map.empty
    val q = EventStreams.streamingQuantileBins(spark, dir)
      .writeStream.outputMode("complete")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        last = graft.queries.TemporalOps.quantilesFromBins(df)
          .collect().map(r => r.getString(0) ->
            ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      }.start()
    try {
      q.processAllAvailable()
      assert(last.nonEmpty && last == batch)
    } finally q.stop()
  }

  test("stream-static broadcast enrich == batch enrich") {
    val dir = "/root/testdata/sf0.001"
    val batch = EventStreams.enrichByNation(
      EventStreams.events(spark, dir),
      spark.read.parquet(s"$dir/nation.parquet"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val q = EventStreams.streamingEnriched(spark, dir)
      .writeStream.outputMode("complete")
      .format("memory").queryName("enrich_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("enrich_out")
        .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
        .toMap
      assert(streamed.nonEmpty && streamed == batch)
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

  test("stateful streaming: event-time timeout flushes an idle session") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val sdf = mem.toDF.toDF("user_id", "ts", "value")
    val q = graft.streaming.EventStreams.sessionizeStreaming(spark, sdf)
      .writeStream.outputMode("append").format("memory").queryName("sess_out").start()
    // base offset: epoch-0 events would be dropped by the initial
    // watermark's strict ts > wm late filter
    def ts(min: Long) = new java.sql.Timestamp((60 + min) * 60000L)
    try {
      // user 1 emits two events then goes idle forever
      mem.addData((1L, ts(0), 1.0), (1L, ts(5), 2.0))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() == 0) // session still open
      // another user's far-future events advance the watermark past
      // user 1's gap boundary (5min + 30min)…
      mem.addData((2L, ts(120), 9.0))
      q.processAllAvailable()
      // …and the next micro-batch fires the event-time timeout.
      mem.addData((2L, ts(125), 9.0))
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3), r.getString(4), r.getDouble(5)))
      // exactly the row the batch formulation produces for user 1
      val batch = graft.streaming.EventStreams.sessionize(
        Seq((1L, ts(0), 1.0), (1L, ts(5), 2.0)).toDF("user_id", "ts", "value"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3), r.getString(4), r.getDouble(5)))
      assert(rows.toSeq == batch.toSeq)
      assert(rows.head == ((1L, 1L, 2L, "1970-01-01 01:00:00", "1970-01-01 01:05:00", 3.0)))
    } finally q.stop()
  }

  test("stateful streaming: a user resuming after a timeout continues session numbering") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val sdf = mem.toDF.toDF("user_id", "ts", "value")
    val q = graft.streaming.EventStreams.sessionizeStreaming(spark, sdf)
      .writeStream.outputMode("append").format("memory").queryName("sess_resume").start()
    def ts(min: Long) = new java.sql.Timestamp((60 + min) * 60000L)
    try {
      // user 1's first session; user 2 advances the watermark far past
      // the gap boundary so the event-time timeout flushes it
      mem.addData((1L, ts(0), 1.0))
      q.processAllAvailable()
      mem.addData((2L, ts(120), 9.0))
      q.processAllAvailable()
      mem.addData((2L, ts(121), 9.0))
      q.processAllAvailable()
      // user 1 RESUMES after the flush — the tombstone state must carry
      // the last-used sid so this opens session 2, not a duplicate 1
      mem.addData((1L, ts(130), 5.0))
      q.processAllAvailable()
      mem.addData((2L, ts(300), 9.0))
      q.processAllAvailable()
      mem.addData((2L, ts(301), 9.0))
      q.processAllAvailable()
      val u1 = spark.table("sess_resume")
        .filter("user_id = 1").collect()
        .map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      assert(u1.toSeq == Seq((1L, 1L), (2L, 1L))) // two sessions, distinct ids
    } finally q.stop()
  }

  test("streaming dedup: redelivered keys within the watermark emit once") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val sdf = mem.toDF.toDF("doc_id", "ts", "text")
    val q = EventStreams.dedupStream(sdf, Seq("doc_id"))
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    def ts(min: Long) = new java.sql.Timestamp((60 + min) * 60000L)
    try {
      mem.addData((1L, ts(0), "a"), (2L, ts(1), "b"))
      q.processAllAvailable()
      // doc 1 redelivered in a later micro-batch, still inside the
      // 1-hour watermark horizon: must be dropped; doc 3 is new
      mem.addData((1L, ts(5), "a"), (3L, ts(6), "c"))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("stream-stream interval join: purchases attribute to in-window views only") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val pm = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val vm = MemoryStream[(Long, java.sql.Timestamp, Double)]
    def ts(min: Long) = new java.sql.Timestamp((600 + min) * 60000L)
    val q = EventStreams.attributePurchases(
        pm.toDF.toDF("user_id", "ts", "value"),
        vm.toDF.toDF("user_id", "ts", "value"), windowMinutes = 60)
      .writeStream.outputMode("append").format("memory").queryName("attr_out").start()
    try {
      // view 30 min before the purchase: attributed; view 2 h before:
      // outside the window; other user's view: no match
      vm.addData((1L, ts(0), 5.0), (1L, ts(-120), 7.0), (2L, ts(10), 9.0))
      pm.addData((1L, ts(30), 42.0))
      q.processAllAvailable()
      val rows = spark.table("attr_out").collect()
        .map(r => (r.getLong(0), r.getDouble(3), r.getDouble(4)))
      assert(rows.toSeq == Seq((1L, 42.0, 5.0)))
      // batch mode: identical semantics without watermarks
      val batch = EventStreams.attributePurchases(
        Seq((1L, ts(30), 42.0)).toDF("user_id", "ts", "value"),
        Seq((1L, ts(0), 5.0), (1L, ts(-120), 7.0), (2L, ts(10), 9.0))
          .toDF("user_id", "ts", "value"), windowMinutes = 60)
        .collect().map(r => (r.getLong(0), r.getDouble(3), r.getDouble(4)))
      assert(batch.toSeq == rows.toSeq)
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

  test("sliding windows: every event lands in exactly width/slide windows") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    val day = 86400000L // 1970-01-02 00:00, on the 30-min epoch grid
    val ev = Seq(
      (1L, day + 10 * 60000L, "x", 1.0),  // 00:10 → windows 23:30, 00:00
      (2L, day + 40 * 60000L, "x", 2.0))  // 00:40 → windows 00:00, 00:30
      .toDF("event_id", "ms", "event_type", "value")
      .withColumn("ts", timestamp_millis(col("ms")))
    val out = EventStreams.slidingTypeCounts(ev)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out == Map(
      "1970-01-01 23:30:00" -> 1L,
      "1970-01-02 00:00:00" -> 2L,
      "1970-01-02 00:30:00" -> 1L))
  }

  test("streaming HLL registers == batch sketch after every micro-batch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val sdf = mem.toDF.toDF("event_type", "event_id")
    val q = graft.streaming.EventStreams.hllStreaming(spark, sdf)
      .writeStream.outputMode("update").format("memory").queryName("hll_out").start()
    def batchOn(rows: Seq[(String, Long)]) =
      graft.functions.Sketches
        .hllDistinct(rows.toDF("event_type", "event_id"), "event_id", "event_type")
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def streamedRows() = spark.table("hll_out").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toSet
    val chunk1 = (1 to 300).map(i => ("a", i.toLong)) :+ (("b", 1L))
    val chunk2 = (200 to 500).map(i => ("a", i.toLong)) ++ Seq(("b", 2L))
    try {
      mem.addData(chunk1: _*)
      q.processAllAvailable()
      batchOn(chunk1).foreach { case (t, v) =>
        assert(streamedRows().contains(t -> v), s"batch-1 parity broke for $t")
      }
      mem.addData(chunk2: _*)
      q.processAllAvailable()
      // the state carried batch 1's registers into batch 2: the final
      // emission equals the batch sketch over the UNION of both chunks
      batchOn(chunk1 ++ chunk2).foreach { case (t, v) =>
        assert(streamedRows().contains(t -> v), s"cross-batch parity broke for $t")
      }
    } finally q.stop()
  }

  test("streaming CMS cells == batch sketch cells across batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.functions.Sketches
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Long]
    val sdf = mem.toDF.toDF("user_id")
    val q = graft.streaming.EventStreams.cmsStreaming(spark, sdf)
      .writeStream.outputMode("update").format("memory").queryName("cms_out").start()
    // latest (max ver) snapshot per shard, elementwise-summed = the
    // full sketch (update-mode memory sinks accumulate rows)
    def streamedCells(): Array[Long] = {
      val acc = Array.fill(Sketches.CmsD * Sketches.CmsW)(0L)
      spark.table("cms_out").collect()
        .groupBy(_.getLong(0)).values
        .map(_.maxBy(_.getLong(1)))
        .foreach { r =>
          r.getSeq[Long](2).zipWithIndex.foreach { case (v, i) => acc(i) += v }
        }
      acc
    }
    def batchCells(rows: Seq[Long]): Array[Long] = {
      val acc = Array.fill(Sketches.CmsD * Sketches.CmsW)(0L)
      Sketches.cmsRows(rows.toDF("user_id"), "user_id").collect()
        .foreach(r => acc(r.getInt(0) * Sketches.CmsW + r.getLong(1).toInt) += r.getLong(2))
      acc
    }
    val chunk1 = (1L to 400L) ++ Seq.fill(50)(42L)
    val chunk2 = (300L to 700L) ++ Seq.fill(9)(42L)
    try {
      mem.addData(chunk1: _*)
      q.processAllAvailable()
      assert(streamedCells().toSeq == batchCells(chunk1).toSeq,
        "batch-1 cell parity broke")
      mem.addData(chunk2: _*)
      q.processAllAvailable()
      assert(streamedCells().toSeq == batchCells(chunk1 ++ chunk2).toSeq,
        "cross-batch cell parity broke")
    } finally q.stop()
  }

  test("streaming CDC upsert state == batch latestState compaction") {
    val dir = "/root/testdata/sf0.001"
    def toMap(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val batch = toMap(
      EventStreams.latestState(EventStreams.events(spark, dir)).collect())
    val q = EventStreams.streamingLatest(spark, dir)
      .writeStream.outputMode("complete")
      .format("memory").queryName("cdc_out").start()
    try {
      q.processAllAvailable()
      assert(toMap(spark.table("cdc_out").collect()) == batch)
    } finally q.stop()
  }
  test("streaming ohlc bars == batch ohlc bars") {
    val dir = "/root/testdata/sf0.001"
    val batch = graft.queries.TemporalOps.ohlcBars(EventStreams.events(spark, dir))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    val q = EventStreams.streamingOhlc(spark, dir)
      .writeStream.outputMode("complete")
      .format("memory").queryName("ohlc_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ohlc_out")
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
        .toMap
      assert(streamed.nonEmpty && streamed == batch)
    } finally q.stop()
  }

  test("streaming space-saving top-k: exact batch parity below capacity, state carries") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Long]
    val sdf = mem.toDF.toDF("user_id")
    val q = graft.streaming.EventStreams.heavyStreaming(spark, sdf)
      .writeStream.outputMode("update").format("memory").queryName("hh_out").start()
    // latest (max ver) snapshot per shard, flattened to key -> (cnt, err)
    def streamed(): Map[Long, (Long, Long)] =
      spark.table("hh_out").collect()
        .groupBy(_.getLong(0)).values
        .map(_.maxBy(_.getLong(1)))
        .flatMap { r =>
          val ks = r.getSeq[Long](2); val cs = r.getSeq[Long](3)
          val es = r.getSeq[Long](4)
          ks.indices.map(i => ks(i) -> ((cs(i), es(i))))
        }.toMap
    def batchCounts(rows: Seq[Long]): Map[Long, (Long, Long)] =
      rows.groupBy(identity).map { case (k, v) => k -> ((v.size.toLong, 0L)) }
    // 40 distinct keys over 8 shards = 5 per shard << capacity 16:
    // no eviction fires, so streamed counts are EXACT
    val chunk1 = (1L to 40L) ++ Seq.fill(25)(7L) ++ Seq.fill(10)(13L)
    val chunk2 = (21L to 40L) ++ Seq.fill(5)(7L)
    try {
      mem.addData(chunk1: _*)
      q.processAllAvailable()
      assert(streamed() == batchCounts(chunk1), "batch-1 parity broke")
      mem.addData(chunk2: _*)
      q.processAllAvailable()
      assert(streamed() == batchCounts(chunk1 ++ chunk2),
        "cross-batch parity broke")
    } finally q.stop()
  }

  test("space-saving fold: total-ordered eviction, overcount bound holds") {
    import graft.functions.Sketches
    val counts = scala.collection.mutable.LongMap.empty[Long]
    val errs = scala.collection.mutable.LongMap.empty[Long]
    // capacity 2: fill with a,a,b — then c evicts the (count asc,
    // key desc)-min entry b and adopts (2, 1)
    Seq(1L, 1L, 2L).foreach(k => Sketches.ssUpdate(counts, errs, k, 2))
    Sketches.ssUpdate(counts, errs, 3L, 2)
    assert(counts.toMap == Map(1L -> 2L, 3L -> 2L), s"${counts.toMap}")
    assert(errs(3L) == 1L && errs(1L) == 0L, s"${errs.toMap}")
    // tie on count=2: evictee is the LARGER key (3), not the heavy 1
    Sketches.ssUpdate(counts, errs, 4L, 2)
    assert(counts.contains(1L) && counts(4L) == 3L && errs(4L) == 2L,
      s"${counts.toMap} ${errs.toMap}")
  }

}
