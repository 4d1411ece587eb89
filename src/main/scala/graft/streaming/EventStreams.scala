package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators (SURVEY.md §2 E5).
  *
  * The same transform functions serve batch DataFrames (driver
  * correctness gate) and Structured Streaming DataFrames (watermark
  * applied only when the input is streaming) — write once, run in
  * either mode. Session windows use the classic gap-break cumulative
  * sum in batch and would map to
  * `session_window`/`flatMapGroupsWithState` in continuous mode.
  */
object EventStreams {

  /** Normalize `events.ts` to a plain session-zone TIMESTAMP whatever
    * the generator wrote: historical testdata used parquet
    * TIMESTAMP(NANOS), which Spark only reads via
    * `nanosAsLong` → BIGINT nanos (truncate to µs, identical to
    * DuckDB's ns→µs read); newer drops write plain µs, surfacing as
    * TIMESTAMP_NTZ (cast to LTZ — the session zone is UTC everywhere,
    * so the instant equals the naive wall clock DuckDB sees). Keyed
    * on the OBSERVED column type, not the generator's era, so a
    * regenerated dataset never breaks the reader again. */
  private[graft] def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }

  /** Events reader: nanos-era AND micros-era parquet (see
    * [[normalizeTs]]). */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(s.read.parquet(s"$dir/events.parquet"))
  }

  /** Tumbling 1-hour windowed counts/sums per event type. In
    * streaming mode add `.withWatermark("ts", ...)` upstream; the
    * aggregation itself is mode-agnostic. */
  def hourlyTypeCounts(events: DataFrame): DataFrame = {
    val in = if (events.isStreaming) events.withWatermark("ts", "1 hour") else events
    in.groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
        .as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy("hour", "event_type")
  }

  /** Event types present in the corpus — the STATIC pivot schema. */
  val PivotTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** Static-schema per-user event-type counts — the pivot formulated
    * as a fixed conditional-aggregate column set rather than
    * `pivot()`: relational `pivot()` first collect()s the distinct
    * pivot values to the driver (an extra pass over 100 TB) and
    * cannot run on an unbounded stream, while a fixed `sum(when(...))`
    * list is ONE partially-aggregated user-keyed shuffle and is
    * streaming-safe (each column is an ordinary incremental
    * aggregate). Unknown types are surfaced in n_total so schema
    * drift is visible rather than silently dropped. */
  def typePivot(events: DataFrame): DataFrame = {
    val perType = PivotTypes.map(t =>
      sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t"))
    val aggs = perType :+ count(lit(1)).as("n_total")
    events.groupBy("user_id")
      .agg(aggs.head, aggs.tail: _*)
      .orderBy("user_id")
  }

  /** Sliding-window counts (1-hour windows every 30 minutes): the
    * native `window(ts, width, slide)` generator — each event lands in
    * width/slide windows, aggregation is per (window, type). Epoch-
    * aligned starts, so the oracle replays the window assignment with
    * pure ⌊ms/slide⌋ integer arithmetic. Mode-agnostic: add a
    * watermark upstream for streaming (same shape as
    * [[hourlyTypeCounts]]).
    */
  def slidingTypeCounts(events: DataFrame): DataFrame = {
    val in = if (events.isStreaming) events.withWatermark("ts", "1 hour") else events
    in.groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("win_start", "event_type")
  }

  /** Sessionization: a new session starts after a >30 min gap per
    * user. Batch formulation: gap-break flag → cumulative sum →
    * per-session aggregate; all three windows share the (user_id ×
    * ts) sort so Spark runs one partition-local sort. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts")
    val gapMicros = gapMinutes * 60L * 1000000L
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("brk",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapMicros, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        round(sum(col("value")), 2).as("sum_value"))
      .orderBy("user_id", "session_id")
  }

  /** Sessionization via Spark's native `session_window` (gap-merge
    * semantics; identical sessions to [[sessionize]] except on
    * exact-gap boundaries, which ns-resolution timestamps never hit).
    * This is the formulation that runs unchanged under Structured
    * Streaming with a watermark. */
  def sessionizeNative(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val in = if (events.isStreaming)
      events.withWatermark("ts", s"$gapMinutes minutes") else events
    in.groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        round(sum(col("value")), 2).as("sum_value"))
      .select("user_id", "session_start", "session_end", "n_events", "sum_value")
      .orderBy("user_id", "session_start")
  }

  case class Ev(user_id: Long, ts_us: Long, value: Double)
  case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
      session_start: String, session_end: String, sum_value: Double)

  /** Sessionization via `flatMapGroupsWithState` — the custom-state
    * formulation that carries over to continuous streaming (state =
    * open session per user; with a real stream you'd add an event-time
    * timeout to flush idle sessions). On batch input each user group
    * arrives once and all its sessions are emitted. Produces exactly
    * the same rows as the window-based [[sessionize]].
    */
  def sessionizeStateful(spark: SparkSession, events: DataFrame,
      gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapUs = gapMinutes * 60L * 1000000L
    // NOTE: DateTimeFormatter is not Serializable — construct inside
    // the executor-side closure, not in the driver scope.
    def fmtUs(us: Long): String =
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochSecond(us / 1000000L))

    val ds = events.select(col("user_id").cast("long").as("user_id"),
      unix_micros(col("ts")).as("ts_us"), col("value").cast("double").as("value")).as[Ev]

    def emit(userId: Long, evs: Iterator[Ev],
        state: GroupState[Long]): Iterator[SessionOut] = {
      val sorted = evs.toSeq.sortBy(_.ts_us)
      if (sorted.isEmpty) Iterator.empty
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
        var sid = 0L; var start = 0L; var last = 0L; var n = 0L; var sum = 0.0
        sorted.foreach { e =>
          if (n == 0L || e.ts_us - last > gapUs) {
            if (n > 0L)
              out += SessionOut(userId, sid, n, fmtUs(start), fmtUs(last),
                math.rint(sum * 100) / 100)
            sid += 1L; start = e.ts_us; n = 0L; sum = 0.0
          }
          last = e.ts_us; n += 1L; sum += e.value
        }
        out += SessionOut(userId, sid, n, fmtUs(start), fmtUs(last),
          math.rint(sum * 100) / 100)
        state.update(sid)
        out.iterator
      }
    }
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(emit)
      .toDF()
      .orderBy("user_id", "session_id")
  }

  /** Open-session state for [[sessionizeStreaming]]. */
  case class OpenSession(sid: Long, start_us: Long, last_us: Long, n: Long, sum: Double)

  /** Streaming element with the watermarked event-time column intact. */
  case class EvT(user_id: Long, ts: java.sql.Timestamp, value: Double)

  /** TRUE streaming sessionization: `flatMapGroupsWithState` with an
    * EVENT-TIME TIMEOUT. Closed-by-gap sessions are emitted as soon
    * as the closing event arrives; an idle open session is flushed
    * when the watermark passes `last_event + gap` — so sessions of
    * users who simply stop emitting still complete, with exactly the
    * rows the batch [[sessionize]] would produce. State per user is
    * one [[OpenSession]]; the timeout timestamp is re-armed on every
    * update. A flushed session leaves an n=0 TOMBSTONE holding the
    * last-used session id, so a user who resumes emitting continues
    * the batch numbering instead of duplicating (user_id, session_id)
    * keys — one small state entry per idle user, the price of exact
    * batch parity.
    *
    * `events` must be a streaming DataFrame with (user_id, ts, value);
    * a watermark on `ts` is applied here.
    */
  def sessionizeStreaming(spark: SparkSession, events: DataFrame,
      gapMinutes: Int = 30, watermarkDelay: String = "1 second",
      tombstoneTtlMinutes: Int = 24 * 60): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapUs = gapMinutes * 60L * 1000000L
    def fmtUs(us: Long): String =
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochSecond(us / 1000000L))
    def closed(userId: Long, s: OpenSession): SessionOut =
      SessionOut(userId, s.sid, s.n, fmtUs(s.start_us), fmtUs(s.last_us),
        math.rint(s.sum * 100) / 100)

    // The watermarked event-time column must flow INTO the stateful
    // operator (projecting it away fails the streaming checker), so
    // the element type keeps the raw timestamp.
    val ds = events.withWatermark("ts", watermarkDelay)
      .select(col("user_id").cast("long").as("user_id"), col("ts"),
        col("value").cast("double").as("value"))
      .as[EvT]

    // Microsecond event time (same timeline as the batch path's
    // unix_micros) — getTime() would truncate to milliseconds and can
    // split/merge sessions differently at exact gap boundaries.
    def micros(ts: java.sql.Timestamp): Long = {
      val i = ts.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }

    def emit(userId: Long, evs: Iterator[EvT],
        state: GroupState[OpenSession]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        if (s.n == 0L) {
          // tombstone TTL expired: drop it so state stays bounded by
          // RECENTLY-idle users, not lifetime-distinct users; a user
          // returning after the TTL restarts numbering at 1 — the
          // documented trade for bounded state.
          state.remove()
          Iterator.empty
        } else {
          // Keep a tombstone (n = 0) holding the last-used sid so a user
          // who resumes emitting continues the batch numbering instead of
          // restarting at 1; it self-expires after tombstoneTtlMinutes.
          // The TTL is anchored to last_us, which may already be far
          // behind the watermark (restart after downtime, a big
          // watermark jump, or ttl <= gap) — setTimeoutTimestamp
          // throws if handed a pre-watermark time, so clamp forward.
          state.update(s.copy(n = 0L, sum = 0.0))
          state.setTimeoutTimestamp(math.max(
            state.getCurrentWatermarkMs() + 1L,
            s.last_us / 1000L + tombstoneTtlMinutes * 60L * 1000L))
          Iterator.single(closed(userId, s))
        }
      } else {
        val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
        var cur = state.getOption
        evs.toSeq.sortBy(e => micros(e.ts)).foreach { e =>
          val us = micros(e.ts)
          cur = cur match {
            case Some(s) if s.n == 0L => // tombstone: resume numbering
              Some(OpenSession(s.sid + 1, us, us, 1L, e.value))
            case Some(s) if us - s.last_us > gapUs =>
              out += closed(userId, s)
              Some(OpenSession(s.sid + 1, us, us, 1L, e.value))
            case Some(s) =>
              Some(s.copy(last_us = us, n = s.n + 1, sum = s.sum + e.value))
            case None =>
              Some(OpenSession(1L, us, us, 1L, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // Flush when the watermark passes the session gap boundary.
          state.setTimeoutTimestamp(s.last_us / 1000L + gapMinutes * 60L * 1000L)
        }
        out.iterator
      }
    }
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(emit)
      .toDF()
  }

  /** Streaming ingestion dedup (E11): drop duplicate records by key
    * within the watermark horizon — the streaming twin of
    * `Dedup.exact` for continuous corpus ingestion (at-least-once
    * sources redeliver; a re-crawled document arrives twice). Built on
    * `dropDuplicatesWithinWatermark`, so the dedup state is EVICTED
    * once the watermark passes a key's event time: state is bounded by
    * the delay window (the documented trade vs global-history dedup,
    * which is the batch operator's job downstream). Keys typically:
    * a content hash (`md5(text)`) or an event id. `tsCol` names the
    * event-time column the watermark rides on.
    */
  def dedupStream(stream: DataFrame, keyCols: Seq[String],
      watermarkDelay: String = "1 hour", tsCol: String = "ts"): DataFrame = {
    require(keyCols.nonEmpty, "dedupStream needs at least one key column")
    stream.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
  }

  /** Stream-stream INTERVAL JOIN (E12): attribute each purchase to
    * the same user's view events within the trailing `windowMinutes`
    * — the classic streaming attribution join. Both sides are
    * watermarked so Spark can bound the join state: the views buffer
    * is evicted once the watermark passes `view.ts + window`, and
    * late rows beyond `watermarkDelay` drop. Works identically on
    * batch DataFrames (watermarks skipped) for backtesting.
    */
  def attributePurchases(purchases: DataFrame, views: DataFrame,
      windowMinutes: Int = 60, watermarkDelay: String = "10 minutes"): DataFrame = {
    require(windowMinutes >= 1, "attribution window must be at least one minute")
    val p0 = purchases.select(col("user_id").as("p_user"), col("ts").as("p_ts"),
      col("value").as("purchase_value"))
    val v0 = views.select(col("user_id").as("v_user"), col("ts").as("v_ts"),
      col("value").as("view_value"))
    val (p, v) =
      if (p0.isStreaming) (p0.withWatermark("p_ts", watermarkDelay),
        v0.withWatermark("v_ts", watermarkDelay))
      else (p0, v0)
    p.join(v,
      col("p_user") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("p_user").as("user_id"), col("p_ts"), col("v_ts"),
        col("purchase_value"), col("view_value"))
  }

  /** E14 trending top-k: the k most frequent event types per hourly
    * window, rank fully deterministic via the (count desc, type)
    * tiebreak. Batch: one agg + one per-window rank (the window
    * partition is an hour bucket — bounded rows, never a skew risk).
    *
    * Streaming: rank-over-window isn't expressible inside a streaming
    * agg, so the streaming deployment runs [[hourlyTypeCounts]] as
    * the stateful stage and applies [[rankWindows]] per micro-batch
    * in `foreachBatch` — same code path, spec-checked for batch
    * parity (StreamingSpec).
    */
  def trendingTopK(events: DataFrame, k: Int = 3): DataFrame =
    rankWindows(hourlyTypeCounts(events), k)

  /** The rank tail shared by the batch operator and the streaming
    * foreachBatch deployment. */
  def rankWindows(hourCounts: DataFrame, k: Int = 3): DataFrame =
    hourCounts
      .withColumn("rnk", row_number().over(
        Window.partitionBy("hour").orderBy(col("n").desc, col("event_type"))))
      .filter(col("rnk") <= k)
      .select("hour", "event_type", "n", "sum_value", "rnk")
      .orderBy("hour", "rnk")

  /** Streaming entry: wire a parquet-dir source through
    * [[hourlyTypeCounts]] with watermarking — used by the streaming
    * spec via the memory sink. */
  def streamingHourlyCounts(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    val stream = normalizeTs(s.readStream.schema(schema).parquet(dir))
      .withWatermark("ts", "1 hour")
    stream
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("sum_value"))
  }

  /** Streaming bucket counts for the burst detector: watermarked
    * per-(type, fixed window) counts whose output shape feeds
    * [[graft.queries.TemporalOps.burstFlags]] unchanged per
    * micro-batch (complete mode ⇒ the last batch carries full state,
    * so its flags equal the batch operator's — the
    * [[streamingHourlyCounts]]/rankWindows deployment shape). */
  def streamingBucketCounts(s: SparkSession, dir: String,
      windowMs: Long = 3600000L): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    normalizeTs(s.readStream.schema(schema).parquet(dir))
      .withWatermark("ts", "1 hour")
      .groupBy(col("event_type"), window(col("ts"), s"$windowMs milliseconds"))
      .agg(count(lit(1)).as("c"))
      .select(col("event_type"),
        expr(s"unix_millis(window.start) div $windowMs").as("w"), col("c"))
  }

  /** Streaming twin of [[graft.queries.TemporalOps.ohlcBars]]: the
    * struct-argmin open/close are ordinary incremental min/max
    * aggregates (the SAME ohlcAggs list, so parity cannot drift), so
    * each live bar holds 4 longs + 2 small structs of state — no
    * per-bar sort, no raw-event retention; the watermark closes bars
    * an hour after their window passes. Hour ids come from the
    * window start, which for a 1-hour epoch-aligned window equals
    * the batch side's `unix_millis div 3600000`. */
  def streamingOhlc(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    val aggs = graft.queries.TemporalOps.ohlcAggs
    normalizeTs(s.readStream.schema(schema).parquet(dir))
      .withWatermark("ts", "1 hour")
      .select(col("event_type"), col("ts"),
        expr("unix_millis(ts)").as("ms"), col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long").as("c"))
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("event_type"),
        expr("unix_millis(window.start) div 3600000").as("hr"),
        col("open_cents"), col("high_cents"), col("low_cents"),
        col("close_cents"), col("n_events"))
  }

  /** Streaming twin of [[graft.queries.TemporalOps.quantileSketch]]:
    * the per-(type, cent-bin) counts are an ordinary complete-mode
    * streaming aggregation, so the ENTIRE live state is the
    * ≤ types·bins mergeable histogram — never raw values; each
    * micro-batch replays the shared
    * [[graft.queries.TemporalOps.quantilesFromBins]] read-off over
    * it (the streamingBucketCounts/burstFlags deployment shape). */
  def streamingQuantileBins(s: SparkSession, dir: String,
      binCents: Long = 100L): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    // the windowed twins drop the base-dir glob's foreign-table rows
    // implicitly (their window(ts) key nulls out); this GLOBAL
    // grouping must drop them explicitly or a foreign row becomes a
    // null state key (events.parquet is a single file, so the source
    // must still point at the directory)
    normalizeTs(s.readStream.schema(schema).parquet(dir))
      .filter(col("event_type").isNotNull && col("value").isNotNull)
      .select(col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .withColumn("bin", expr(s"cents div $binCents"))
      .groupBy("event_type", "bin").agg(count(lit(1)).as("c"))
  }

  /** The enrich+aggregate core shared VERBATIM by the batch entry and
    * the streaming deployment (the rankWindows pattern — one body, two
    * execution modes), so batch/stream parity can't drift apart. No
    * orderBy here: a streaming aggregation can't sort. */
  private def enrichCore(events: DataFrame, nation: DataFrame): DataFrame =
    events
      .withColumn("nk", pmod(col("user_id"), lit(25L)))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("nk") === col("n_nationkey"))
      .groupBy("n_name", "event_type")
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))

  /** Stream-static enrichment: events joined to a broadcast dimension
    * (nation, via the synthetic user→nation key user_id mod 25), then
    * aggregated per (nation, type). The join is the canonical
    * stream-static broadcast enrich — the static side is read once,
    * broadcast to every micro-batch, and adds NO streaming state; the
    * only stateful op is the downstream aggregation. Identical
    * semantics on a batch frame (this entry) and a streaming one
    * ([[streamingEnriched]] — StreamingSpec parity).
    */
  def enrichByNation(events: DataFrame, nation: DataFrame): DataFrame =
    enrichCore(events, nation).orderBy("n_name", "event_type")

  /** Streaming twin of [[enrichByNation]] over a parquet-dir source
    * (complete-mode aggregation; the enrich join itself is stateless). */
  def streamingEnriched(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    enrichCore(s.readStream.schema(schema).parquet(dir),
      s.read.parquet(s"$dir/nation.parquet"))
  }

  /** The CDC-compaction core shared by the batch entry and the
    * streaming twin (the enrichCore discipline). Last-write-wins is a
    * single max(struct(ms, event_id, value_cents)) argmax per key —
    * the q2_mincost struct-ordering trick — with arrival totally
    * ordered by (epoch-ms, event_id), so the winner is deterministic
    * even on timestamp ties; value_cents rides along and never decides
    * (ids are unique). One narrow key-shuffle with map-side partials;
    * as a streaming agg this is exactly an upsert state store. */
  private def latestCore(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), col("event_type"),
        struct(unix_millis(col("ts")).as("ms"), col("event_id"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("value_cents"))
          .as("st"))
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n_versions"), max(col("st")).as("m"))
      .select(col("user_id"), col("event_type"), col("n_versions"),
        col("m.event_id").as("last_event_id"),
        col("m.value_cents").as("last_value_cents"))

  /** E15 CDC upsert compaction: the LATEST value per (user, type) key
    * under last-write-wins — the MERGE-style state a change-data feed
    * compacts to. Batch form of the streaming upsert (see
    * [[streamingLatest]]); both run [[latestCore]] verbatim.
    */
  def latestState(events: DataFrame): DataFrame =
    latestCore(events).orderBy("user_id", "event_type")

  /** Streaming twin of [[latestState]] over a parquet-dir source —
    * a complete-mode keyed aggregation whose state IS the upsert
    * table. */
  def streamingLatest(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    // glob-filter to the events FILE (the source's basePath must stay
    // a directory): the other tables' parquet would surface as
    // all-NULL rows, and a keyed groupBy — unlike window(ts), which
    // drops null event times — would keep them as a junk NULL group
    latestCore(normalizeTs(s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)))
  }

  case class HllIn(event_type: String, event_id: Long)
  case class HllState(regs: Array[Int])
  case class HllOut(event_type: String, zero_regs: Long, est_distinct: Long)

  /** Streaming twin of [[graft.functions.Sketches.hllDistinct]]:
    * sketch-as-state. Per event_type the `mapGroupsWithState` state
    * is the 256-register array itself — a FIXED ~1 KB per key forever,
    * the defining property that makes distinct-counting viable on an
    * unbounded stream (exact streaming distinct state grows with
    * cardinality; watermarked dedup forgets history). Each micro-batch
    * folds its keys in with the same md5 hash ([[graft.functions
    * .Sketches.keyHashScala]] ≡ the Column path by construction) and
    * emits the current (zero_regs, est_distinct) through the SAME
    * integer estimate the batch aggregate and the DuckDB oracle run —
    * StreamingSpec asserts value-for-value parity with the batch
    * sketch after the last batch. Update output mode; no timeout
    * (registers never expire — HLL forgets nothing and stays tiny).
    */
  case class CmsIn(shard: Long, user_id: Long)
  case class CmsState(ver: Long, cells: Array[Long])
  case class CmsOut(shard: Long, ver: Long, cells: Array[Long])

  /** Streaming count-min twin of [[graft.functions.Sketches.countMin]]
    * (the E26 hllStreaming discipline applied to E25): the sketch
    * lives as d×w = 192 additive counter cells, SHARDED by
    * user_id % `shards` so state updates parallelize — CMS cells are
    * elementwise-additive, so the full sketch is the sum of the shard
    * outputs (the production merge shape; a single global group would
    * serialize every update through one task). Each micro-batch folds
    * its keys through [[graft.functions.Sketches.cmsColScala]] — ≡
    * the batch Column path by construction — and emits the shard's
    * current cells; StreamingSpec sums the shards after the last
    * batch and asserts cell-for-cell parity with the batch sketch.
    * Update output mode; no timeout (counters never expire). */
  def cmsStreaming(spark: SparkSession, events: DataFrame,
      shards: Int = 8): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    import graft.functions.Sketches
    val ds = events
      .select((col("user_id").cast("long") % shards).as("shard"),
        col("user_id").cast("long").as("user_id"))
      .as[CmsIn]
    def fold(shard: Long, evs: Iterator[CmsIn],
        state: GroupState[CmsState]): CmsOut = {
      val prior = state.getOption
      val cells = prior.map(_.cells)
        .getOrElse(Array.fill(Sketches.CmsD * Sketches.CmsW)(0L))
      evs.foreach { e =>
        val cols = Sketches.cmsColsScala(e.user_id)
        var i = 0
        while (i < Sketches.CmsD) {
          cells(i * Sketches.CmsW + cols(i)) += 1L
          i += 1
        }
      }
      // ver stamps each emission so an update-mode sink's accumulated
      // rows resolve to the latest snapshot per shard
      val ver = prior.map(_.ver).getOrElse(0L) + 1L
      state.update(CmsState(ver, cells))
      CmsOut(shard, ver, cells)
    }
    ds.groupByKey(_.shard)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fold)
      .toDF()
  }

  def hllStreaming(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    import graft.functions.Sketches
    val ds = events
      .select(col("event_type"), col("event_id").cast("long").as("event_id"))
      .as[HllIn]
    def fold(t: String, evs: Iterator[HllIn],
        state: GroupState[HllState]): HllOut = {
      val regs = state.getOption.map(_.regs).getOrElse(Array.fill(Sketches.HllM)(0))
      evs.foreach(e => Sketches.updateRegisters(regs, Sketches.keyHashScala(e.event_id)))
      state.update(HllState(regs))
      val (zero, est) = Sketches.estimateFromRegisters(regs)
      HllOut(t, zero, est)
    }
    ds.groupByKey(_.event_type)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fold)
      .toDF()
  }
  case class HhIn(shard: Long, key: Long)
  case class HhState(ver: Long, keys: Array[Long], counts: Array[Long],
    errs: Array[Long])
  case class HhOut(shard: Long, ver: Long, keys: Array[Long],
    counts: Array[Long], errs: Array[Long])

  /** Streaming space-saving top-k twin of [[graft.functions.Sketches
    * .heavyHitters]] — the E63 sharded-sketch discipline applied to
    * E52, completing the sketch-as-state trio (HLL distinct, CMS
    * frequency, space-saving top-k). Per shard the state is a
    * CAPACITY-bounded (key, count, err) summary folded through
    * [[graft.functions.Sketches.ssUpdate]]; keys shard by
    * key % `shards`, so each key's entire truth lives in exactly ONE
    * shard — the union of shard summaries is a valid space-saving
    * summary of the whole stream (no per-key splitting, updates
    * parallel across shards), and state is ≤ shards·capacity entries
    * forever, the property that makes unbounded-stream top-k viable.
    * Whenever per-shard distinct keys ≤ capacity no eviction ever
    * fires and counts are EXACT — StreamingSpec pins batch parity in
    * that regime and carries state across micro-batches; the
    * eviction path's determinism is pinned sequentially on
    * ssUpdate's total-ordered evictee. Emissions are ver-stamped,
    * keys sorted ascending, update output mode, no timeout. */
  def heavyStreaming(spark: SparkSession, events: DataFrame,
      shards: Int = 8, capacity: Int = 16): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    import graft.functions.Sketches
    val ds = events
      .select((col("user_id").cast("long") % shards).as("shard"),
        col("user_id").cast("long").as("key"))
      .as[HhIn]
    def fold(shard: Long, evs: Iterator[HhIn],
        state: GroupState[HhState]): HhOut = {
      val counts = scala.collection.mutable.LongMap.empty[Long]
      val errs = scala.collection.mutable.LongMap.empty[Long]
      state.getOption.foreach { st =>
        var i = 0
        while (i < st.keys.length) {
          counts(st.keys(i)) = st.counts(i); errs(st.keys(i)) = st.errs(i)
          i += 1
        }
      }
      evs.foreach(e => Sketches.ssUpdate(counts, errs, e.key, capacity))
      val ks = counts.keysIterator.toArray.sorted
      val cs = ks.map(counts(_))
      val es = ks.map(errs(_))
      val ver = state.getOption.map(_.ver).getOrElse(0L) + 1L
      state.update(HhState(ver, ks, cs, es))
      HhOut(shard, ver, ks, cs, es)
    }
    ds.groupByKey(_.shard)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fold)
      .toDF()
  }
}
