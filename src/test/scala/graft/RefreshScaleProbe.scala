package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.importer.{GraphStore, Refresh}

/** Times the composed incremental refresh (SURVEY §2 A8) at ORGANIC
  * scale — the reference's operational story (re-import into a live
  * store, api/session.rs:19) measured on a corpus the size a daily
  * operator would actually hold, not just the gate-SF spec fixtures.
  *
  * The probe derives an analysis-JSON corpus from the organic tables
  * (deterministic, so re-runs are comparable): functions = the
  * derived callgraph's nodes, calls = its edges re-keyed intra-binary
  * (uid resolution is per-binary address-map joins, as in the
  * reference), strings = the documents table's text values. Binaries
  * partition the nodes by `node % B`; the DELTA is the last
  * `B/deltaFrac` binaries plus one RE-imported old binary (the
  * update path must upsert, not duplicate). It then times
  *   1. bootstrap(old)   — from-scratch init of graph+index+sigs,
  *   2. refresh(delta)   — the composed incremental upsert,
  *   3. bootstrap(all)   — the rebuild the refresh claims to equal,
  * and digest-compares every store of (2) against (3): per-table
  * (count, Σ xxhash64(row)) over sorted column concatenation — the
  * merge≡rebuild contract at scale. Prints one JSON line.
  *
  * Usage: RefreshScaleProbe <sfDir> [nBinaries] [deltaFrac]
  */
object RefreshScaleProbe {

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** (count, Σxxhash64 over the sorted-column row image) — engine-
    * order-independent store digest; the sum rides DECIMAL(38,0) —
    * xxhash64 spans the full long range, so a long SUM overflows
    * under ANSI after a few million rows. */
  private def digest(df: DataFrame): (Long, String) = {
    val cols = df.columns.sorted.map(c => col(c).cast("string"))
    val r = df.select(
      count(lit(1)).as("n"),
      coalesce(sum(xxhash64(concat_ws("", cols: _*)).cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")).as("h"))
      .head()
    (r.getLong(0), r.getDecimal(1).toBigInteger.toString)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/organic/sf1")
    val nBin = args.lift(1).map(_.toInt).getOrElse(120)
    val deltaFrac = args.lift(2).map(_.toInt).getOrElse(30)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import java.nio.file.{Files, Paths}
    val work = Files.createTempDirectory("graft_refresh_sf").toString
    val oldDir = s"$work/json_old"; val deltaDir = s"$work/json_delta"
    val allDir = s"$work/json_all"
    Seq(oldDir, deltaDir, allDir).foreach(d => Files.createDirectories(Paths.get(d)))

    // ---- derive the corpus -------------------------------------------
    val edges = queries.GraphQueries.callEdges(spark, dir)
      .select("src", "dst").localCheckpoint(true)
    val docs = Tables.documents(spark, dir)
    val nEdges = edges.count()

    def addr(c: org.apache.spark.sql.Column) =
      concat(lit("0x"), lpad(hex(c), 8, "0"))
    val B = lit(nBin.toLong)
    val fnRows = edges.select(explode(array(col("src"), col("dst"))).as("n"))
      .distinct()
      .select(pmod(col("n"), B).as("bin"),
        struct(concat(lit("fn_"), col("n")).as("name"),
          addr(col("n")).as("address"), lit(64L).as("size")).as("f"))
    // intra-binary re-key: keep dst's node "row", shift into src's
    // binary column — per-binary address maps then resolve every call
    val callRows = edges
      .select(pmod(col("src"), B).as("bin"),
        struct(addr(col("src")).as("from_address"),
          addr((col("dst") - pmod(col("dst"), B)) + pmod(col("src"), B))
            .as("to_address"),
          addr(col("src") + lit(4L)).as("offset"),
          lit("direct").as("type")).as("c"))
    val strRows = docs.select(pmod(col("doc_id"), B).as("bin"),
      struct(col("text").as("value"),
        addr(col("doc_id")).as("address")).as("s"))

    val perBin = fnRows.groupBy("bin").agg(collect_list(col("f")).as("functions"))
      .join(callRows.groupBy("bin").agg(collect_list(col("c")).as("calls")), Seq("bin"), "left")
      .join(strRows.groupBy("bin").agg(collect_list(col("s")).as("strings")), Seq("bin"), "left")
      .select(col("bin"), to_json(struct(
        struct(
          struct(md5(concat(lit("bin"), col("bin"))).as("sha256")).as("hashes"),
          concat(lit("binary_"), col("bin"), lit(".exe")).as("name"),
          concat(lit("/corpus/binary_"), col("bin")).as("file_path"),
          lit(4096L).as("file_size"),
          struct(lit("ELF64").as("type"), lit("x86_64").as("architecture"))
            .as("file_type")).as("binary_info"),
        col("functions"), col("strings"), col("calls"))).as("doc"))

    val (nOld, nDelta, jsonBytes) = {
      var old = 0; var dl = 0; var bytes = 0L
      val it = perBin.select("bin", "doc").toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        val b = r.getLong(0); val doc = r.getString(1)
        bytes += doc.length
        val isDelta = b >= nBin - nBin / deltaFrac
        val f = if (isDelta) { dl += 1; s"$deltaDir/bin_$b.json" }
        else { old += 1; s"$oldDir/bin_$b.json" }
        Files.writeString(Paths.get(f), doc)
        Files.writeString(Paths.get(s"$allDir/bin_$b.json"), doc)
      }
      // update path: re-import one unchanged old binary in the delta
      Files.copy(Paths.get(s"$oldDir/bin_0.json"),
        Paths.get(s"$deltaDir/bin_0.json"))
      (old, dl, bytes)
    }

    // ---- time the three operations -----------------------------------
    val rootA = s"$work/stores_inc"; val rootB = s"$work/stores_full"
    val (_, tBootstrap) = timed { Refresh.bootstrap(spark, oldDir, rootA) }
    val (res, tRefresh) = timed {
      val r = Refresh.refresh(spark, deltaDir, rootA)
      r.report.count() // materialize the near-dup report too
      r
    }
    val (_, tRebuild) = timed { Refresh.bootstrap(spark, allDir, rootB) }

    // ---- merge≡rebuild digests over every store -----------------------
    def load(root: String) = GraphStore.load(spark, s"$root/graph")
    val gA = load(rootA); val gB = load(rootB)
    val tables = Seq(
      "binaries" -> ((g: importer.BinaryGraph) => g.binaries),
      "functions" -> ((g: importer.BinaryGraph) => g.functions),
      "strings" -> ((g: importer.BinaryGraph) => g.strings),
      "contains" -> ((g: importer.BinaryGraph) => g.contains),
      "calls" -> ((g: importer.BinaryGraph) => g.calls),
      "call_sites" -> ((g: importer.BinaryGraph) => g.callSites))
    val graphOk = tables.map { case (n, f) =>
      val (da, db) = (digest(f(gA)), digest(f(gB)))
      require(da == db, s"graph table $n diverged: $da vs $db")
      n -> da
    }
    val idxA = spark.read.parquet(s"$rootA/index/postings")
    val idxB = spark.read.parquet(s"$rootB/index/postings")
    val (ia, ib) = (digest(idxA), digest(idxB))
    require(ia == ib, s"fulltext postings diverged: $ia vs $ib")
    val (sa, sb) = (digest(spark.read.parquet(s"$rootA/sigs")),
      digest(spark.read.parquet(s"$rootB/sigs")))
    require(sa == sb, s"signature stores diverged: $sa vs $sb")

    println(
      s"""{"probe":"refresh_scale","dir":"$dir","n_binaries":$nBin,""" +
        s""""n_old":$nOld,"n_delta":$nDelta,"json_mb":${jsonBytes / 1048576},""" +
        s""""n_edges":$nEdges,"bootstrap_s":$tBootstrap,""" +
        s""""refresh_s":$tRefresh,"rebuild_s":$tRebuild,""" +
        s""""speedup_vs_rebuild":${tRebuild / tRefresh},""" +
        s""""stores_digest_equal":true,""" +
        s""""graph_rows":${graphOk.map { case (n, (c, _)) => s""""$n":$c""" }
          .mkString("{", ",", "}")},""" +
        s""""delta_report_rows":${res.report.count()}}""")
    spark.stop()
  }
}
