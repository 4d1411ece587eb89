package graft.importer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, row_number}

/** Columnar persistence for [[BinaryGraph]] — the analogue of the
  * reference's schema init / constraints / indexes
  * (neo4j/schema.rs): uniqueness is enforced on write (tables are
  * deduped by construction), and "indexes" become physical layout:
  * every table is repartitioned by its lookup key and sorted within
  * partitions, so parquet row-group min/max statistics give
  * index-like skipping on uid/hash point lookups, and co-partitioned
  * reads make the CALLS ⋈ functions joins shuffle-free after load.
  * (On a cluster with a catalog this is `bucketBy(n, key)`; plain
  * path-based parquet gets the same effect via repartition + sort.)
  */
object GraphStore {

  private def writeKeyed(df: DataFrame, key: String, path: String, n: Int): Unit =
    df.repartition(n, col(key)).sortWithinPartitions(key)
      .write.mode("overwrite").parquet(path)

  /** `database init` + import persistence in one: write all tables. */
  def save(g: BinaryGraph, dir: String, partitions: Int = 32): Unit = {
    writeKeyed(g.binaries, "hash", s"$dir/binaries", math.max(1, partitions / 8))
    writeKeyed(g.functions, "uid", s"$dir/functions", partitions)
    writeKeyed(g.strings, "uid", s"$dir/strings", partitions)
    writeKeyed(g.libraries, "name", s"$dir/libraries", 1)
    writeKeyed(g.contains, "function_uid", s"$dir/contains", partitions)
    writeKeyed(g.importsFn, "function_uid", s"$dir/imports_fn", partitions)
    writeKeyed(g.importsLib, "binary_hash", s"$dir/imports_lib", 1)
    writeKeyed(g.belongsTo, "function_uid", s"$dir/belongs_to", partitions)
    writeKeyed(g.containsString, "string_uid", s"$dir/contains_string", partitions)
    writeKeyed(g.calls, "from_uid", s"$dir/calls", partitions)
    writeKeyed(g.callSites, "from_uid", s"$dir/call_sites", partitions)
  }

  /** Load a persisted graph (lazy scans — nothing materializes until
    * a query runs). */
  def load(spark: SparkSession, dir: String): BinaryGraph = {
    def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name")
    val calls = t("calls")
    // Graphs persisted before the call_sites table existed still load:
    // absent directory degrades to an empty frame with the calls schema
    // (call_sites is per-site rows of the same shape).
    val fs = new org.apache.hadoop.fs.Path(s"$dir/call_sites")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sites =
      if (fs.exists(new org.apache.hadoop.fs.Path(s"$dir/call_sites"))) t("call_sites")
      else calls.limit(0)
    BinaryGraph(
      binaries = t("binaries"), functions = t("functions"), strings = t("strings"),
      libraries = t("libraries"), contains = t("contains"), importsFn = t("imports_fn"),
      importsLib = t("imports_lib"), belongsTo = t("belongs_to"),
      containsString = t("contains_string"), calls = calls,
      callSites = sites)
  }

  /** Bucketed CATALOG persistence — the cluster path the plain-parquet
    * [[save]] doc comment promises: every table is written
    * `bucketBy(buckets, key).sortBy(key)` as `<prefix>_<table>`, so an
    * equi-join between co-bucketed tables on their bucket keys (calls
    * ⋈ functions on uid, membership ⋈ functions, …) is a SHUFFLE-FREE
    * sort-merge join — Spark recognizes the matching bucket specs and
    * elides both Exchanges (spec-checked) — while sorted buckets keep
    * row-group skipping for point lookups. Needs a session catalog;
    * path-based [[save]] stays the catalog-less fallback.
    */
  def saveBucketed(g: BinaryGraph, prefix: String = "graft",
      buckets: Int = 32): Unit = {
    def w(df: DataFrame, key: String, table: String): Unit =
      df.write.mode("overwrite").format("parquet")
        .bucketBy(buckets, key).sortBy(key)
        .saveAsTable(s"${prefix}_$table")
    w(g.binaries, "hash", "binaries")
    w(g.functions, "uid", "functions")
    w(g.strings, "uid", "strings")
    w(g.libraries, "name", "libraries")
    w(g.contains, "function_uid", "contains")
    w(g.importsFn, "function_uid", "imports_fn")
    w(g.importsLib, "binary_hash", "imports_lib")
    w(g.belongsTo, "function_uid", "belongs_to")
    w(g.containsString, "string_uid", "contains_string")
    w(g.calls, "from_uid", "calls")
    w(g.callSites, "from_uid", "call_sites")
  }

  /** Load a bucketed catalog graph written by [[saveBucketed]]. */
  def loadBucketed(spark: SparkSession, prefix: String = "graft"): BinaryGraph =
    BinaryGraph(
      binaries = spark.table(s"${prefix}_binaries"),
      functions = spark.table(s"${prefix}_functions"),
      strings = spark.table(s"${prefix}_strings"),
      libraries = spark.table(s"${prefix}_libraries"),
      contains = spark.table(s"${prefix}_contains"),
      importsFn = spark.table(s"${prefix}_imports_fn"),
      importsLib = spark.table(s"${prefix}_imports_lib"),
      belongsTo = spark.table(s"${prefix}_belongs_to"),
      containsString = spark.table(s"${prefix}_contains_string"),
      calls = spark.table(s"${prefix}_calls"),
      callSites = spark.table(s"${prefix}_call_sites"))

  /** Incremental import: merge a newly-imported batch into an
    * existing graph with the reference's MERGE-then-SET semantics
    * (neo4j/importer.rs `MERGE (n {key}) SET n.prop = …`): new rows
    * win on key collision, everything else is preserved. One
    * union + keyed dedup per table — no read-modify-write loops, so
    * a nightly increment over a 100 TB store is a normal batch job.
    */
  def merge(existing: BinaryGraph, incoming: BinaryGraph): BinaryGraph = {
    def newerWins(old: DataFrame, neu: DataFrame, keys: Seq[String]): DataFrame = {
      val tagged = old.withColumn("_gen", lit(0))
        .unionByName(neu.withColumn("_gen", lit(1)))
      tagged.withColumn("_rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(keys.map(col): _*)
            .orderBy(col("_gen").desc)))
        .filter(col("_rn") === 1)
        .drop("_gen", "_rn")
    }
    def unionDistinct(old: DataFrame, neu: DataFrame): DataFrame =
      old.unionByName(neu).distinct()
    BinaryGraph(
      binaries = newerWins(existing.binaries, incoming.binaries, Seq("hash")),
      functions = newerWins(existing.functions, incoming.functions, Seq("uid")),
      strings = newerWins(existing.strings, incoming.strings, Seq("uid")),
      libraries = unionDistinct(existing.libraries, incoming.libraries),
      contains = unionDistinct(existing.contains, incoming.contains),
      importsFn = newerWins(existing.importsFn, incoming.importsFn,
        Seq("binary_hash", "function_uid")),
      importsLib = unionDistinct(existing.importsLib, incoming.importsLib),
      belongsTo = unionDistinct(existing.belongsTo, incoming.belongsTo),
      containsString = unionDistinct(existing.containsString, incoming.containsString),
      calls = newerWins(existing.calls, incoming.calls,
        Seq("from_uid", "to_uid")),
      callSites = newerWins(existing.callSites, incoming.callSites,
        Seq("from_uid", "to_uid", "call_offset")))
  }

  /** `database clear` (commands/database.rs:40). */
  def clear(spark: SparkSession, dir: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) { fs.delete(path, true); () }
  }

  /** Staged-swap directory promotion — the shared crash-safety
    * protocol for every persisted store (graph tables, fulltext
    * index, dedup signatures): the live dir is renamed aside to
    * `live.old` BEFORE staging is promoted, so at every instant a
    * complete store exists under either `live` or `live.old` (crash
    * recovery: move `.old` back). Each rename's boolean result is
    * checked — a filesystem whose rename returns false (cross-volume
    * moves on some Hadoop FS impls) aborts with the original
    * restored instead of silently leaving no store. The `.old` copy
    * is retained; callers drop it via [[dropAside]] only after the
    * promoted store proves loadable. */
  def promote(spark: SparkSession, staging: String, live: String): Unit = {
    val hLive = new org.apache.hadoop.fs.Path(live)
    val fs = hLive.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hStaging = new org.apache.hadoop.fs.Path(staging)
    val hOld = new org.apache.hadoop.fs.Path(s"$live.old")
    fs.delete(hOld, true)
    if (fs.exists(hLive) && !fs.rename(hLive, hOld))
      throw new java.io.IOException(
        s"promote: cannot move live store aside ($live -> $hOld); " +
          "store left untouched")
    if (!fs.rename(hStaging, hLive)) {
      fs.rename(hOld, hLive) // restore; best-effort, original data intact
      throw new java.io.IOException(
        s"promote: cannot promote staging ($staging -> $live); " +
          "original store restored")
    }
  }

  /** Drop the [[promote]]-saved `.old` copy once the promoted store
    * has proven loadable. */
  def dropAside(spark: SparkSession, live: String): Unit =
    clear(spark, s"$live.old")
}
