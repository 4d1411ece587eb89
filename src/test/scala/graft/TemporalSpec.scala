package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TemporalOps

/** As-of join semantics on a hand-checked timeline. */
class TemporalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)

  test("asof join picks latest right row at or before left time") {
    import spark.implicits._
    val left = Seq((1L, 10L), (1L, 25L), (2L, 5L))
      .toDF("k", "lt")
    val right = Seq((1L, 5L, 100.0), (1L, 10L, 200.0), (1L, 20L, 300.0),
      (2L, 9L, 400.0)).toDF("k", "rt", "v")
    val out = TemporalOps.asofJoin(left, right, "k", "lt", "rt", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
    assert(out == Set(
      (1L, 10L, Some(200.0)),  // equal time → right visible
      (1L, 25L, Some(300.0)),  // latest before 25 is 20
      (2L, 5L, None)))         // nothing at or before 5
  }
}
