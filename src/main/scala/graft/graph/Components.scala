package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components via iterative min-label propagation.
  *
  * DataFrame analogue of GraphX's Pregel connected-components: each
  * node carries the minimum node id seen in its neighborhood and
  * propagates it until FIXPOINT — every iteration is one
  * shuffle-on-node-id, and the loop stops as soon as an iteration
  * changes no label (labels are monotonically non-increasing, so
  * "no change" is a true fixpoint). `maxIter` is only a safety
  * bound; iterations needed = graph diameter. Each round is
  * materialized with localCheckpoint so round d doesn't re-derive
  * rounds 1..d-1.
  */
object Components {

  /** edges: (src: long, dst: long), treated as undirected.
    * Returns (node, component) where component = min node id in the
    * component.
    */
  def labelPropagation(edges: DataFrame, maxIter: Int = 50): DataFrame =
    propagate(edges, maxIter)._1

  /** Min-label propagation loop; also reports whether the fixpoint was
    * reached within `maxIter` (false ⇒ the graph's diameter exceeds
    * the round budget — [[auto]] uses this to switch engines). */
  private def propagate(edges: DataFrame, maxIter: Int): (DataFrame, Boolean) = {
    val und = edges.select(col("src").cast("long").as("a"), col("dst").cast("long").as("b"))
      .unionByName(edges.select(col("dst").cast("long").as("a"), col("src").cast("long").as("b")))
      .distinct()
      .localCheckpoint(true)
    var labels = und.select(col("a").as("node")).distinct()
      .withColumn("component", col("node"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val neighborMin = und
        .join(labels, und("b") === labels("node"))
        .groupBy(col("a").as("node2"))
        .agg(min(col("component")).as("nbr_min"))
      // Carry the previous label through the materialization so the
      // convergence check is a column compare on the already-checkpointed
      // frame — no extra label-join job per round. Labels only ever
      // decrease, so zero strict decreases is a true fixpoint.
      val nextWide = labels
        .join(neighborMin, labels("node") === neighborMin("node2"), "left")
        .select(col("node"), col("component").as("prev"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("component"))
        .localCheckpoint(true)
      val changed = nextWide.filter(col("component") < col("prev")).limit(1).count()
      converged = changed == 0
      labels = nextWide.select("node", "component")
      iter += 1
    }
    (labels, converged)
  }

  /** Engine-choosing components: min-label propagation needs
    * O(diameter) shuffle rounds, so it wins on the low-diameter graphs
    * this engine mostly sees (hierarchies, call graphs with hubs) but
    * loses badly on long paths. `auto` gives propagation a bounded
    * round budget and, if the fixpoint isn't reached, hands the whole
    * graph to GraphX's Pregel connected components (C3) — the
    * general-diameter scale path. Both produce (node, component = min
    * node id), so callers can't tell which engine ran.
    */
  def auto(edges: DataFrame, lpRoundBudget: Int = 8): DataFrame = {
    val (labels, converged) = propagate(edges, lpRoundBudget)
    if (converged) labels
    else Pregel.connectedComponents(edges.sparkSession, edges)
  }
}
