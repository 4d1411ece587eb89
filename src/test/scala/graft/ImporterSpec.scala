package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.importer.JsonImporter

/** Import semantics parity with the reference (api/session.rs):
  * uid construction, address→uid resolution priority, string dedup
  * across binaries, unresolved-call skipping, library normalization.
  */
class ImporterSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)

  lazy val g = JsonImporter.importAnalysis(spark,
    getClass.getResource("/analysis").getPath)

  test("binaries parsed with format + arch normalization") {
    val b = g.binaries.orderBy("hash").collect()
    assert(b.length == 2)
    assert(b(0).getAs[String]("hash") == "aaa111")
    assert(b(0).getAs[String]("format") == "PE")
    assert(b(1).getAs[String]("format") == "Elf")
    assert(b(1).getAs[String]("arch") == "aarch64")
  }

  test("function uids: internal hash:0xaddr, imports global imp:lib:name") {
    val uids = g.functions.select("uid").collect().map(_.getString(0)).toSet
    assert(uids.contains("aaa111:0x401200"))
    assert(uids.contains("bbb222:0x1000"))          // decimal 4096 → 0x1000
    assert(uids.contains("imp:kernel32.dll:CreateFileA"))
    // shared import across binaries (case-insensitive library) → ONE node
    assert(uids.count(_ == "imp:ws2_32.dll:send") == 1)
  }

  test("export overwrites internal type at same address (reference MERGE order)") {
    val m = g.functions.filter("uid = 'aaa111:0x401000'").collect()
    assert(m.length == 1)
    assert(m(0).getAs[String]("fn_type") == "Export")
    assert(m(0).getAs[String]("name") == "exported_entry")
  }

  test("strings dedup by content hash across binaries") {
    assert(g.strings.count() == 2) // "Pay Bitcoin now", "hello world" (shared)
    assert(g.containsString.count() == 3) // 2 + 1 occurrences
    val uid = g.strings.filter("value = 'hello world'").select("uid")
      .collect()(0).getString(0)
    assert(uid.startsWith("str:"))
    assert(g.containsString.filter(s"string_uid = '$uid'").count() == 2)
  }

  test("calls resolved via address map; unresolved skipped; self-loop kept") {
    val c = g.calls.collect()
    assert(c.length == 4) // 3 resolved in bin1 + 1 in bin2; 0x999999 skipped
    val selfLoop = g.calls.filter("from_uid = to_uid").collect()
    assert(selfLoop.length == 1 && selfLoop(0).getString(0) == "aaa111:0x401400")
    val imp = g.calls.filter("to_uid = 'imp:kernel32.dll:CreateFileA'").collect()
    assert(imp.length == 1 && imp(0).getAs[String]("call_type") == "Indirect")
    val t = g.calls.filter("call_type = 'Tail'").collect()
    assert(t.length == 1 && t(0).getAs[String]("to_uid") == "imp:ws2_32.dll:send")
  }

  test("libraries lowercased and deduped; stats counts line up") {
    assert(g.libraries.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("kernel32.dll", "ws2_32.dll"))
    val s = JsonImporter.stats(g).collect()(0)
    assert(s.getAs[Long]("n_binaries") == 2)
    assert(s.getAs[Long]("n_functions") == 4 + 2) // 4 internal/export + 2 global imports
    assert(s.getAs[Long]("n_strings") == 2)
    assert(s.getAs[Long]("n_libraries") == 2)
    assert(s.getAs[Long]("n_calls") == 4)
  }

  test("graph export round-trips as JSON") {
    val dir = java.nio.file.Files.createTempDirectory("graft_export").toString
    JsonImporter.exportJson(g, dir)
    val back = spark.read.json(s"$dir/functions")
    assert(back.count() == g.functions.count())
  }
}
