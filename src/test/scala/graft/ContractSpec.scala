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

  test("scale oracles target gated queries and carry both SQL sides") {
    // ScaleOracles is the sf1 replay path for the oracle-environment-
    // heavy queries: each entry must shadow a REAL gated query (its
    // primary oracle still gates at the gate SFs) and ship both the
    // base-table digest and the output digest.
    val s = graft.queries.ScaleOracles.sql
    val orphans = s.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"scale oracles without a gated query: $orphans")
    val unoracled = s.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty,
      s"scale oracles must shadow a primary oracle, not replace it: $unoracled")
    s.foreach { case (name, (oracle, output)) =>
      assert(oracle.trim.nonEmpty && output.trim.nonEmpty,
        s"$name: empty scale-oracle side")
      assert(output.contains("out"), s"$name: output SQL must read view `out`")
    }
  }

  test("every gated query has a SURVEY §2 inventory row") {
    // §2 is the coverage contract the per-round audit runs against —
    // a gated query with no inventory row is exactly how a future
    // regression hides (the r5 verdict found 16 such orphans). The
    // check is textual on purpose: a query name must appear verbatim
    // (backtick-quoted, as the Query/API column writes it) between
    // the §2 heading and the next section heading.
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), java.nio.charset.StandardCharsets.UTF_8)
    val start = survey.indexOf("## §2")
    assert(start >= 0, "SURVEY.md has no §2 heading")
    val rest = survey.substring(start + 5)
    val end = rest.indexOf("\n## §")
    val section = if (end >= 0) rest.substring(0, end) else rest
    val missing = SparkEntry.queries.keySet
      .filterNot(name => section.contains(s"`$name`"))
    assert(missing.isEmpty,
      s"gated queries with no SURVEY §2 row: ${missing.toSeq.sorted}")
  }

  test("SURVEY §2 operator ids are unique") {
    // the r5 audit found E23 used for two different operators — an
    // id collision makes the inventory ambiguous for the line-by-line
    // coverage check
    val lines = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")),
      java.nio.charset.StandardCharsets.UTF_8).linesIterator.toVector
    val s = lines.dropWhile(!_.startsWith("## §2"))
      .drop(1).takeWhile(!_.startsWith("## §"))
    val ids = s.filter(l => l.startsWith("| ") && l.count(_ == '|') >= 5)
      .map(_.split("\\|")(1).trim)
      .filter(_.matches("[A-E][0-9]+[a-z]?"))
    val dups = ids.groupBy(identity).collect { case (id, g) if g.size > 1 => id }
    assert(dups.isEmpty, s"duplicate SURVEY §2 ids: ${dups.toSeq.sorted}")
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
