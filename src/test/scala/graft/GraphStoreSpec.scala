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
