package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated TPC-H-ish parquet tables.
  *
  * At 100 TB these would be partitioned/bucketed parquet on object
  * storage; `spark.read.parquet` already yields a partition-prunable,
  * filter-pushdown-capable scan, so every downstream operator keeps
  * declarative access (no RDDs).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** IDENTITY-STABLE documents frame: one DataFrame object per
    * (session, dir), so the identity-keyed derived-artifact memos
    * (TextOps.shinglesShared / shingleDfShared, Dedup.minhashSigsShared)
    * hit across every board query instead of once per call — the
    * GraphQueries.edgeMemo discipline applied to the text family. The
    * frame itself is just the parquet scan (nothing cached here; the
    * heavy shared artifacts are checkpointed behind their own memos). */
  private val docsMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  def documentsShared(s: SparkSession, d: String): DataFrame =
    docsMemo.getOrElseUpdate((s, d), table(s, d, "documents"))

  /** IDENTITY-STABLE embeddings frame — the [[documentsShared]]
    * discipline for the vector family, so Similarity's identity-keyed
    * shared-rerank memo (bruteTopKMemo) hits across the D6/D64/D69
    * trio instead of re-scanning the corpus per query. */
  private val embMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  def embeddingsShared(s: SparkSession, d: String): DataFrame =
    embMemo.getOrElseUpdate((s, d), table(s, d, "embeddings"))
}

/** Session factory for tests / standalone use. */
object GraftSession {
  def local(threads: Int = 4): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$threads]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // backstop for memo-eviction block release (KeyedFrameMemo
      // drops references; ContextCleaner unpersists on GC — the
      // default 30min periodic GC is too slow for a board, and the
      // eviction-time nudge is a no-op under -XX:+DisableExplicitGC)
      .config("spark.cleaner.periodicGC.interval", "2min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
