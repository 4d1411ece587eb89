package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.Components

/** stronglyConnected == brute-force closure ground truth on graph
  * shapes that exercise every branch: trim chains, multiple cycles,
  * DAG bridges between SCCs, self-loops, and nested pivot layers. */
class SccSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)

  /** Ground truth: scc_id(v) = min over {v} ∪ {u : u →* v ∧ v →* u},
    * via Floyd-Warshall-style closure — fine at fixture size. */
  private def bruteScc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val idx = nodes.zipWithIndex.toMap
    val n = nodes.size
    val reach = Array.fill(n, n)(false)
    edges.foreach { case (a, b) => reach(idx(a))(idx(b)) = true }
    for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
      if (reach(i)(k) && reach(k)(j)) reach(i)(j) = true
    nodes.map { v =>
      val mutual = nodes.filter(u =>
        reach(idx(u))(idx(v)) && reach(idx(v))(idx(u)))
      v -> (mutual :+ v).min
    }.toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Components.stronglyConnected(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("bowTie: core/in/out/other counts on a hand bow-tie") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    // core cycle {1,2,3}; 0 -> 1 (IN); 3 -> 4 (OUT); isolated pair
    // 10 -> 11 (OTHER). Larger cycle wins over the 10/11 singletons.
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (0L, 1L), (3L, 4L),
      (10L, 11L))
      .toDF("src", "dst").withColumn("offset", lit(0L))
    val r = Components.bowTie(e, maxDepth = 4)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("core" -> 3L, "in" -> 1L, "out" -> 1L, "other" -> 2L), s"$r")
  }

  test("two cycles joined by a DAG bridge, plus a tail chain") {
    // cycle {1,2,3} -> bridge 4 -> cycle {5,6}, chain 7->8->1
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (5L, 6L), (6L, 5L), (7L, 8L), (8L, 1L))
    assert(run(e) == bruteScc(e))
  }

  test("self-loops are singleton SCCs with their own id") {
    val e = Seq((1L, 1L), (1L, 2L), (2L, 3L), (3L, 3L))
    assert(run(e) == bruteScc(e))
  }

  test("pure DAG: every node is its own SCC") {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    val got = run(e)
    assert(got == bruteScc(e))
    assert(got.forall { case (v, s) => v == s })
  }

  test("nested pivot layers: SCC behind an SCC (sequential extraction)") {
    // cycle {10,11} feeds cycle {2,3} feeds cycle {5,6}: colors force
    // at least two outer rounds (min id 2 floods its forward cone,
    // hiding {5,6} until {2,3} is extracted)
    val e = Seq((10L, 11L), (11L, 10L), (11L, 2L), (2L, 3L), (3L, 2L),
      (3L, 5L), (5L, 6L), (6L, 5L))
    assert(run(e) == bruteScc(e))
  }

  test("duplicate edges and a long chain trim correctly") {
    val chain = (1L to 20L).sliding(2).map(p => (p(0), p(1))).toSeq
    val e = chain ++ chain ++ Seq((20L, 18L), (19L, 18L))
    assert(run(e) == bruteScc(e))
  }

  test("strongly connected whole graph collapses to min id") {
    val e = Seq((4L, 7L), (7L, 9L), (9L, 4L), (9L, 12L), (12L, 7L))
    val got = run(e)
    assert(got.values.toSet == Set(4L))
    assert(got == bruteScc(e))
  }
}
