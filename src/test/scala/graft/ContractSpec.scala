package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants that need no SparkSession: the queries
  * map and the oracle map must stay in 1:1 correspondence — a query
  * without an oracle silently downgrades to the driver's weaker
  * rows-only check, and an orphan oracle is dead weight that can
  * drift unnoticed.
  */
class ContractSpec extends AnyFunSuite {

  test("every gated query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"orphan oracles: ${(o -- q).toSeq.sorted}")
  }

  test("oracle SQL is non-empty and references no Spark-only syntax") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name: empty oracle")
      // lateral view / array_intersect etc. are Spark SQL; DuckDB
      // would throw at driver time — catch the obvious ones early.
      // SQL comments are allowed to mention anything.
      val code = sql.linesIterator.map(l => l.split("--", 2)(0)).mkString("\n")
      Seq("LATERAL VIEW", "array_intersect", "posexplode").foreach { kw =>
        assert(!code.contains(kw), s"$name: Spark-only '$kw' in oracle SQL")
      }
    }
  }
}
