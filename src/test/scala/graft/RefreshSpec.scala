package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.importer.{GraphStore, JsonImporter, Refresh}
import graft.pipeline.Dedup
import graft.search.Fulltext

/** End-to-end contract for the composed incremental refresh (SURVEY
  * §2 A8): one delta import must leave ALL THREE derived stores —
  * graph tables, strings fulltext index, minhash signature store —
  * in exactly the state a from-scratch bootstrap over the full corpus
  * produces, and the near-dup report must match the batch LSH
  * restricted to pairs touching the delta.
  */
class RefreshSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] = {
    val cols = df.columns.sorted
    df.selectExpr(cols.map(c => s"`$c`"): _*).collect().map(_.mkString("|")).toSet
  }

  test("refresh ≡ bootstrap-from-scratch across graph, index, and signature stores") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dirA = Files.createTempDirectory("graft_rfr_a").toString
    val dirB = Files.createTempDirectory("graft_rfr_b").toString
    val dirAll = Files.createTempDirectory("graft_rfr_all").toString
    val res = getClass.getResource("/analysis").getPath
    Seq("bin1.json" -> "a1_bin1.json", "bin2.json" -> "a2_bin2.json")
      .foreach { case (src, dst) =>
        Files.copy(Paths.get(res, src), Paths.get(dirA, dst),
          StandardCopyOption.REPLACE_EXISTING)
        Files.copy(Paths.get(res, src), Paths.get(dirAll, dst),
          StandardCopyOption.REPLACE_EXISTING)
      }
    // Delta: a new binary whose strings include an EXACT re-import of
    // an existing value (content-addressed uid → update path, must
    // not duplicate postings or signatures) and a NEAR-dup of it
    // (shares a 3-gram shingle → must surface in the report).
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
        |  "strings": [
        |    {"value": "Pay Bitcoin now", "address": "0x5100"},
        |    {"value": "Pay Bitcoin now please", "address": "0x5200"}
        |  ],
        |  "calls": [
        |    {"from_address": "0x500000", "to_address": "0x500000",
        |     "offset": "0x500004", "type": "direct"}
        |  ]
        |}""".stripMargin
    Seq(dirB, dirAll).foreach { d =>
      Files.writeString(Paths.get(d, "b2_new.json"), fresh)
    }
    val root = Files.createTempDirectory("graft_rfr_store").toString + "/db"
    val rootAll = Files.createTempDirectory("graft_rfr_full").toString + "/db"

    Refresh.bootstrap(spark, dirA, root, partitions = 2)
    val r = Refresh.refresh(spark, dirB, root, partitions = 2)
    Refresh.bootstrap(spark, dirAll, rootAll, partitions = 2)

    // 1. graph tables ≡ full rebuild's persisted store
    val inc = GraphStore.load(spark, s"$root/graph")
    val full = GraphStore.load(spark, s"$rootAll/graph")
    val tables = Seq[(String, graft.importer.BinaryGraph => org.apache.spark.sql.DataFrame)](
      "binaries" -> (_.binaries), "functions" -> (_.functions),
      "strings" -> (_.strings), "calls" -> (_.calls),
      "callSites" -> (_.callSites), "containsString" -> (_.containsString))
    tables.foreach { case (name, f) =>
      assert(rows(f(inc)) == rows(f(full)), s"graph table $name diverged")
    }

    // 2. fulltext index ≡ full rebuild: postings sets, corpus count,
    // and an actual search through both
    val idx = Fulltext.loadIndex(spark, s"$root/index")
    val idxAll = Fulltext.loadIndex(spark, s"$rootAll/index")
    assert(rows(idx.postings) == rows(idxAll.postings), "postings diverged")
    assert(idx.meta.collect().head.getLong(0) ==
      idxAll.meta.collect().head.getLong(0), "corpus count diverged")
    assert(rows(Fulltext.searchIndex(idx, Seq("bitcoin", "hello"))) ==
      rows(Fulltext.searchIndex(idxAll, Seq("bitcoin", "hello"))))

    // 3. signature store ≡ full rebuild's signatures
    assert(rows(spark.read.parquet(s"$root/sigs")) ==
      rows(spark.read.parquet(s"$rootAll/sigs")), "signature store diverged")

    // 4. report ≡ batch LSH over the full corpus restricted to pairs
    // touching a delta doc (the dedupIncremental equivalence, here
    // executed THROUGH the persisted stores)
    val allDocs = full.strings
      .select(col("uid").as("doc_id"), col("value").as("text"))
    val deltaIds = JsonImporter
      .buildGraph(JsonImporter.readAnalysis(spark, dirB)).strings
      .select(col("uid")).collect().map(_.getString(0)).toSet
    val batch = Dedup.minhashLsh(allDocs)
      .filter(col("doc_a").isin(deltaIds.toSeq: _*) ||
        col("doc_b").isin(deltaIds.toSeq: _*))
      .select("doc_a", "doc_b", "est_jaccard")
    assert(rows(r.report.select("doc_a", "doc_b", "est_jaccard")) == rows(batch))
    // the near-dup string pair actually surfaced
    assert(r.report.count() >= 1, "expected the planted near-dup pair")

    // 5. crash-safety residue: no staging/aside dirs survive
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("graph", "index", "sigs").foreach { s =>
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/$s.staging")), s)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/$s.old")), s)
    }
    Seq(root, rootAll).foreach(d => GraphStore.clear(spark, d))
  }
}
