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

  /** The testdata `events.ts` column is parquet TIMESTAMP(NANOS),
    * which Spark cannot read natively — read nanos as long and
    * truncate to microseconds (identical to DuckDB's ns→µs read). */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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

  /** Streaming entry: wire a parquet-dir source through
    * [[hourlyTypeCounts]] with watermarking — used by the streaming
    * spec via the memory sink. */
  def streamingHourlyCounts(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    val stream = s.readStream.schema(schema).parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 hour")
    stream
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("sum_value"))
  }
}
