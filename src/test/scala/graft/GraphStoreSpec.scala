package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.importer.{GraphStore, JsonImporter}
import graft.queries.GraphQueryEngine
import graft.streaming.EventStreams

class GraphStoreSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)

  test("graph save/load round-trip preserves tables and queries") {
    val g = JsonImporter.importAnalysis(spark,
      getClass.getResource("/analysis").getPath)
    val dir = java.nio.file.Files.createTempDirectory("graft_store").toString
    GraphStore.save(g, dir, partitions = 4)
    val loaded = GraphStore.load(spark, dir)
    assert(loaded.functions.count() == g.functions.count())
    assert(loaded.calls.count() == g.calls.count())
    val engine = new GraphQueryEngine(loaded)
    val x = engine.xrefs("0x403000").collect()
    assert(x.length == 1 && x(0).getString(1) == "imp:kernel32.dll:CreateFileA")
    GraphStore.clear(spark, dir)
    assert(!new java.io.File(dir).exists())
  }

  test("load degrades gracefully when call_sites is absent (pre-upgrade store)") {
    val g = JsonImporter.importAnalysis(spark,
      getClass.getResource("/analysis").getPath)
    val dir = java.nio.file.Files.createTempDirectory("graft_store_old").toString
    GraphStore.save(g, dir, partitions = 4)
    // simulate a store written before the call_sites table existed
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/call_sites"), true)
    val loaded = GraphStore.load(spark, dir)
    assert(loaded.callSites.count() == 0)
    assert(loaded.callSites.columns.toSeq == loaded.calls.columns.toSeq)
    assert(loaded.calls.count() == g.calls.count()) // everything else intact
    GraphStore.clear(spark, dir)
  }

  test("bucketed catalog save: co-bucketed equi-join runs shuffle-free") {
    val g = JsonImporter.importAnalysis(spark,
      getClass.getResource("/analysis").getPath)
    GraphStore.saveBucketed(g, prefix = "bspec", buckets = 4)
    try {
      val loaded = GraphStore.loadBucketed(spark, "bspec")
      assert(loaded.functions.count() == g.functions.count())
      // force a sort-merge join; matching bucket specs must elide BOTH
      // shuffle Exchanges (bucket join), leaving no Exchange in the plan
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = loaded.calls.join(loaded.functions,
          loaded.calls("from_uid") === loaded.functions("uid"))
        assert(j.count() > 0)
        val plan = j.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally
      Seq("binaries", "functions", "strings", "libraries", "contains",
        "imports_fn", "imports_lib", "belongs_to", "contains_string",
        "calls", "call_sites").foreach(t => spark.sql(s"DROP TABLE IF EXISTS bspec_$t"))
  }

  test("incremental merge: re-import is idempotent, new rows win") {
    val g = JsonImporter.importAnalysis(spark,
      getClass.getResource("/analysis").getPath)
    // re-importing the same batch changes nothing
    val same = GraphStore.merge(g, g)
    assert(same.functions.count() == g.functions.count())
    assert(same.calls.count() == g.calls.count())
    // an updated function row (same uid, new size) replaces the old
    import org.apache.spark.sql.functions._
    val updated = g.copy(functions =
      g.functions.filter("uid = 'aaa111:0x401200'").withColumn("size", lit(999L)))
    val merged = GraphStore.merge(g, updated)
    assert(merged.functions.count() == g.functions.count())
    assert(merged.functions.filter("uid = 'aaa111:0x401200'")
      .collect()(0).getAs[Long]("size") == 999L)
  }

  test("mergeAnalysis into a persisted store ≡ full rebuild on overlapping imports") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // Batch A = the two resource fixtures; batch B = an OVERLAPPING
    // re-analysis of aaa111 (same helper function, same import, but
    // the helper→CreateFileA call carries a NEW offset) plus a brand
    // new binary ccc333. File names are chosen so lexical order =
    // import order (buildGraph's last-write-wins orders by file name,
    // the sequential reference's visit order).
    val dirA = Files.createTempDirectory("graft_mrg_a").toString
    val dirB = Files.createTempDirectory("graft_mrg_b").toString
    val dirAll = Files.createTempDirectory("graft_mrg_all").toString
    val res = getClass.getResource("/analysis").getPath
    Seq("bin1.json" -> "a1_bin1.json", "bin2.json" -> "a2_bin2.json")
      .foreach { case (src, dst) =>
        Files.copy(Paths.get(res, src), Paths.get(dirA, dst),
          StandardCopyOption.REPLACE_EXISTING)
        Files.copy(Paths.get(res, src), Paths.get(dirAll, dst),
          StandardCopyOption.REPLACE_EXISTING)
      }
    val update =
      """{
        |  "binary_info": {
        |    "hashes": {"sha256": "aaa111"},
        |    "name": "sample.exe",
        |    "file_path": "/tmp/sample.exe",
        |    "file_size": 2048,
        |    "file_type": {"type": "PE32", "architecture": "x86_64"}
        |  },
        |  "functions": [ {"name": "helper", "address": "0x401200", "size": 64} ],
        |  "imports": [
        |    {"name": "CreateFileA", "library": "KERNEL32.dll", "address": "0x403000"}
        |  ],
        |  "calls": [
        |    {"from_address": "0x401200", "to_address": "0x403000",
        |     "offset": "0x401299", "type": "indirect"}
        |  ]
        |}""".stripMargin
    val fresh =
      """{
        |  "binary_info": {
        |    "hashes": {"sha256": "ccc333"},
        |    "name": "third.exe",
        |    "file_path": "/tmp/third.exe",
        |    "file_size": 512,
        |    "file_type": {"type": "PE32", "architecture": "x86_64"}
        |  },
        |  "functions": [ {"name": "entry", "address": "0x500000", "size": 16} ],
        |  "strings": [ {"value": "hello world", "address": "0x5100"} ],
        |  "calls": [
        |    {"from_address": "0x500000", "to_address": "0x500000",
        |     "offset": "0x500004", "type": "direct"}
        |  ]
        |}""".stripMargin
    Seq(dirB, dirAll).foreach { d =>
      Files.writeString(Paths.get(d, "b1_update.json"), update)
      Files.writeString(Paths.get(d, "b2_new.json"), fresh)
    }
    val store = Files.createTempDirectory("graft_mrg_store").toString + "/db"
    GraphStore.save(JsonImporter.importAnalysis(spark, dirA), store, 2)
    val merged = JsonImporter.mergeAnalysis(spark, store, dirB, partitions = 2)
    val rebuilt = JsonImporter.importAnalysis(spark, dirAll)
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] = {
      val cols = df.columns.sorted
      df.selectExpr(cols: _*).collect().map(_.mkString("|")).toSet
    }
    val tables = Seq[(String, graft.importer.BinaryGraph => org.apache.spark.sql.DataFrame)](
      "binaries" -> (_.binaries), "functions" -> (_.functions),
      "strings" -> (_.strings), "libraries" -> (_.libraries),
      "contains" -> (_.contains), "importsFn" -> (_.importsFn),
      "importsLib" -> (_.importsLib), "belongsTo" -> (_.belongsTo),
      "containsString" -> (_.containsString), "calls" -> (_.calls),
      "callSites" -> (_.callSites))
    tables.foreach { case (name, f) =>
      assert(rows(f(merged)) == rows(f(rebuilt)), s"table $name diverged")
    }
    // CALLS last-write-wins across imports: the overlapping edge
    // carries batch B's offset; the old site row survives in callSites
    val edge = merged.calls
      .filter("from_uid = 'aaa111:0x401200' and to_uid = 'imp:kernel32.dll:CreateFileA'")
      .collect()
    assert(edge.length == 1 && edge(0).getAs[String]("call_offset") == "0x401299")
    assert(merged.callSites
      .filter("from_uid = 'aaa111:0x401200' and to_uid = 'imp:kernel32.dll:CreateFileA'")
      .count() == 2)
    // the new binary landed
    assert(merged.binaries.filter("hash = 'ccc333'").count() == 1)
    // promotion protocol left no residue: neither the staging dir nor
    // the saved-aside original survives a successful merge
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$store.staging")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$store.old")))
    GraphStore.clear(spark, store)
  }

  test("stateful sessionize matches window-based sessionize") {
    val dir = "/root/testdata/sf0.001"
    val ev = EventStreams.events(spark, dir)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
      .toSet
    assert(key(EventStreams.sessionizeStateful(spark, ev)) ==
      key(EventStreams.sessionize(ev)))
  }
}
