package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.search.Fulltext
import graft.search.Fulltext.{And, Or, Prefix, Term}

/** Boolean ("raw Lucene") query parity: parser shape + search
  * semantics on hand-checked docs (reference README:
  * `query strings --pattern "ransom* AND (bitcoin OR wallet)" --raw`).
  */
class BooleanSearchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)

  def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("parser: precedence, parens, wildcards, bare-OR adjacency") {
    assert(Fulltext.parseQuery("a AND b OR c") ==
      Or(And(Term("a"), Term("b")), Term("c")))
    assert(Fulltext.parseQuery("ransom* AND (bitcoin OR wallet)") ==
      And(Prefix("ransom"), Or(Term("bitcoin"), Term("wallet"))))
    assert(Fulltext.parseQuery("pay bitcoin") == Or(Term("pay"), Term("bitcoin")))
  }

  test("AND requires both atoms; OR either; wildcard matches prefix") {
    val d = docs(
      1L -> "ransomware detected pay bitcoin to this wallet",
      2L -> "ransom note mentions wallet",
      3L -> "bitcoin price news today",
      4L -> "nothing relevant at all")
    def ids(q: String) =
      Fulltext.booleanSearch(d, q).collect().map(_.getLong(0)).toSet
    assert(ids("ransom* AND (bitcoin OR wallet)") == Set(1L, 2L))
    assert(ids("bitcoin OR wallet") == Set(1L, 2L, 3L))
    assert(ids("ransomware AND bitcoin") == Set(1L))
    assert(ids("pay bitcoin") == Set(1L, 3L))
    assert(ids("missing AND bitcoin") == Set())
  }

  test("scoring still tf-idf over matched atoms") {
    val d = docs(
      1L -> "alpha alpha alpha beta",
      2L -> "alpha gamma delta epsilon")
    val rows = Fulltext.booleanSearch(d, "alpha").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L)) // tf 3 beats tf 1
  }
}
