package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.{Components, Traversal}
import graft.importer.Addresses
import org.apache.spark.sql.functions.col

/** Unit semantics for the traversal/component primitives on a tiny
  * hand-checked graph: 1→2→3→1 cycle, 2→4, 5→5 self-loop, 6→7.
  */
class TraversalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)

  def edges = {
    import spark.implicits._
    Seq((1L, 2L, 10L), (2L, 3L, 20L), (3L, 1L, 30L), (2L, 4L, 21L),
      (5L, 5L, 50L), (6L, 7L, 60L))
      .toDF("src", "dst", "offset")
  }
  def starts(ids: Long*) = {
    import spark.implicits._
    ids.toDF("node")
  }

  test("bfs min-depth reachability, forward and reverse") {
    val down = Traversal.bfs(edges, starts(1L), maxDepth = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(down == Map(2L -> 1, 3L -> 2, 4L -> 2)) // 1 itself excluded (depth 0)
    val up = Traversal.bfs(edges, starts(4L), maxDepth = 3, reverse = true)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(up == Map(2L -> 1, 1L -> 2, 3L -> 3))
  }

  test("walks enumerate paths with offsets") {
    val w = Traversal.walks(edges, starts(1L), maxDepth = 2)
      .collect().map(r => (r.getAs[String]("path"), r.getAs[String]("offsets")))
      .toSet
    assert(w == Set(("1->2", "10"), ("1->2->3", "10,20"), ("1->2->4", "10,21")))
  }

  test("recursion: direct self-loop + indirect cycle") {
    val r = Traversal.recursion(edges, starts(1L), maxDepth = 4)
      .collect()
      .map(x => (x.getAs[Long]("node"), x.getAs[String]("call_type"),
        x.getAs[Int]("depth"), x.getAs[Long]("n_cycles"))).toSet
    assert(r.contains((5L, "Direct", 1, 1L)))
    assert(r.contains((1L, "Indirect", 3, 1L))) // 1→2→3→1
  }

  test("connected components: {1,2,3,4}, {5}, {6,7}") {
    val cc = Components.labelPropagation(edges.select("src", "dst"), maxIter = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L, 6L -> 6L, 7L -> 6L))
  }

  test("address parse/normalize matches reference semantics") {
    import spark.implicits._
    val df = Seq("0x1000", "0X00001000", "4096", "abcd", "ABCD", "xyz", "")
      .toDF("a")
      .select(col("a"), Addresses.parseAddress(col("a")).as("p"),
        Addresses.normalizeAddress(col("a")).as("n"))
    val rows: Map[String, (Option[Any], Option[Any])] = df.collect().map { r =>
      r.getString(0) -> (Option(r.get(1)), Option(r.get(2)))
    }.toMap
    assert(rows("0x1000") == (Some(4096L), Some("0x1000")))
    assert(rows("0X00001000") == (Some(4096L), Some("0x1000")))
    assert(rows("4096") == (Some(4096L), Some("0x1000")))
    assert(rows("abcd") == (Some(0xabcdL), Some("0xabcd")))
    assert(rows("ABCD") == (Some(0xabcdL), Some("0xabcd")))
    assert(rows("xyz") == (None, None))
    assert(rows("") == (None, None))
  }
}
