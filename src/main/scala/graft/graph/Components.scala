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
  def labelPropagation(edges: DataFrame, maxIter: Int = 50): DataFrame = {
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
      val next = labels
        .join(neighborMin, labels("node") === neighborMin("node2"), "left")
        .select(col("node"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("component"))
        .localCheckpoint(true)
      // Labels only ever decrease, so a strict decrease count of zero
      // is a fixpoint. One small agg per round — the standard price of
      // convergence-checked iteration.
      val changed = next.as("n")
        .join(labels.as("o"), col("n.node") === col("o.node"))
        .filter(col("n.component") < col("o.component"))
        .count()
      converged = changed == 0
      labels = next
      iter += 1
    }
    labels
  }
}
