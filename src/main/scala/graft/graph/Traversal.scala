package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph traversal over edge DataFrames.
  *
  * Spark-first re-expression of the reference's Cypher var-length
  * `CALLS*1..k` queries (reference: src/neo4j/call_path_analyzer.rs,
  * src/neo4j/importer.rs:471-550): depth becomes a short loop of
  * frontier joins that Catalyst/AQE plans per level — each level
  * shuffles only the narrow (node|path) projection, never full rows.
  * At cluster scale the frontier is typically small → AQE converts
  * the per-level join to a broadcast join automatically.
  *
  * Edges are expected as (src: long, dst: long, offset: long).
  */
object Traversal {

  private def edgeCols(edges: DataFrame): DataFrame =
    edges.select(col("src").cast("long").as("_src"),
      col("dst").cast("long").as("_dst"),
      col("offset").cast("long").as("_off"))

  /** BFS minimum-depth reachability from `starts` (column `node`), up
    * to `maxDepth` hops. Returns (node, depth) where depth is the
    * first level the node is discovered at (excludes the start
    * level-0 rows). Mirrors Neo4j `DISTINCT` var-length semantics:
    * every node reachable within ≤ maxDepth appears exactly once.
    *
    * Level-synchronous: each iteration joins only the *new* frontier
    * against edges, anti-joins the visited set, so total work is
    * O(edges × diameter) worst case — never the walk blowup.
    */
  def bfs(edges: DataFrame, starts: DataFrame, maxDepth: Int,
      reverse: Boolean = false): DataFrame = {
    val e0 = edgeCols(edges)
    val e = if (reverse) e0.select(col("_dst").as("_src"), col("_src").as("_dst"))
            else e0.select("_src", "_dst")
    // Each level is materialized (localCheckpoint) before the next:
    // without this, level d's plan re-derives levels 1..d-1 → O(d²)
    // recomputation and a hundred micro-stages. With it, every level
    // runs exactly one join + distinct + anti-join over materialized
    // inputs — the standard iterative-algorithm shape on Spark.
    var frontier = starts.select(col("node").cast("long").as("node"))
      .distinct().localCheckpoint(true)
    val levels = scala.collection.mutable.ArrayBuffer(
      frontier.withColumn("depth", lit(0)))
    var visited = frontier
    for (d <- 1 to maxDepth if !frontier.isEmpty) {
      frontier = frontier
        .join(e, frontier("node") === e("_src"))
        .select(col("_dst").as("node"))
        .distinct()
        .join(visited, Seq("node"), "left_anti")
        .localCheckpoint(true)
      levels += frontier.withColumn("depth", lit(d))
      visited = visited.unionByName(frontier).localCheckpoint(true)
    }
    levels.reduce(_ unionByName _).filter(col("depth") > 0)
  }

  /** Walk enumeration (call-path analysis): all walks of length
    * 1..maxDepth from `starts`, with the node path and per-hop call
    * offsets rendered as strings (the reference returns node-name +
    * offset arrays per path; call_path_analyzer.rs:20-110).
    *
    * Exponential by nature — callers bound maxDepth (≤4) and the
    * start set. Each level is one shuffle join keyed on the walk
    * head; the carried state is three scalar columns, not arrays of
    * structs, so the shuffle stays narrow.
    */
  def walks(edges: DataFrame, starts: DataFrame, maxDepth: Int,
      reverse: Boolean = false): DataFrame = {
    val e0 = edgeCols(edges)
    val e = if (reverse)
      e0.select(col("_dst").as("_src"), col("_src").as("_dst"), col("_off"))
    else e0
    var level = starts.select(col("node").cast("long").as("start"),
      col("node").cast("long").as("last"),
      col("node").cast("string").as("path"),
      lit("").as("offsets"),
      lit(0).as("depth"))
    val out = (1 to maxDepth).map { d =>
      level = level
        .join(e, level("last") === e("_src"))
        .select(col("start"),
          col("_dst").as("last"),
          concat(col("path"), lit("->"), col("_dst").cast("string")).as("path"),
          when(col("offsets") === "", col("_off").cast("string"))
            .otherwise(concat(col("offsets"), lit(","), col("_off").cast("string")))
            .as("offsets"),
          lit(d).as("depth"))
      level
    }
    out.reduce(_ unionByName _)
  }

  /** Recursion detection (reference call_path_analyzer.rs:253-331):
    * direct self-loops plus indirect cycles of length 2..maxDepth
    * returning to the start node. Indirect cycles are aggregated to
    * (node, depth, n_cycles) — path multiplicity without
    * materializing every walk downstream.
    */
  def recursion(edges: DataFrame, starts: DataFrame, maxDepth: Int): DataFrame = {
    val direct = edgeCols(edges)
      .filter(col("_src") === col("_dst"))
      .select(col("_src").as("node"))
      .distinct()
      .withColumn("call_type", lit("Direct"))
      .withColumn("depth", lit(1))
      .withColumn("n_cycles", lit(1L))
    // Trail semantics (Cypher var-length): an edge is never reused
    // within one path, so a pure self-loop cannot form an "indirect"
    // cycle — exclude self-loop edges from the cycle walk entirely.
    //
    // Cycle COUNTS need no walk enumeration: dynamic programming over
    // walk counts — dp(d, start, node) = Σ_{edges u→node} dp(d-1,
    // start, u) — is one join+agg per level with state ≤ |starts|×|V|,
    // where enumeration is O(degree^depth). Counts are identical.
    val e = edgeCols(edges).filter(col("_src") =!= col("_dst"))
    var dp = starts.select(col("node").cast("long").as("start"))
      .distinct()
      .select(col("start"), col("start").as("cur"), lit(1L).as("walks"))
    val cycles = (1 to maxDepth).map { d =>
      dp = dp.join(e, dp("cur") === e("_src"))
        .groupBy(col("start"), col("_dst").as("cur"))
        .agg(sum(col("walks")).as("walks"))
        .localCheckpoint(true)
      dp.filter(col("cur") === col("start") && lit(d) >= 2)
        .select(col("start").as("node"), lit(d).as("depth"),
          col("walks").as("n_cycles"))
    }
    val indirect = cycles.reduce(_ unionByName _)
      .withColumn("call_type", lit("Indirect"))
      .select("node", "call_type", "depth", "n_cycles")
    direct.select("node", "call_type", "depth", "n_cycles")
      .unionByName(indirect)
  }

  /** Out-degree histogram: one full-edge agg, two narrow shuffles. */
  def outDegreeHistogram(edges: DataFrame): DataFrame =
    edgeCols(edges)
      .groupBy(col("_src"))
      .agg(count(lit(1)).as("out_deg"))
      .groupBy(col("out_deg"))
      .agg(count(lit(1)).as("n_nodes"))
}
