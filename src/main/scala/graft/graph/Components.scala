package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components via iterative min-label propagation.
  *
  * DataFrame analogue of GraphX's Pregel connected-components: each
  * node carries the minimum node id seen in its neighborhood and
  * propagates it until fixpoint. Every iteration is one
  * shuffle-on-node-id; AQE coalesces partitions as labels converge.
  * For 100 TB-scale graphs, swap the fixed iteration count for a
  * convergence check on an accumulated diff count (or use the
  * large-star/small-star variant to cut iterations to O(log d)).
  */
object Components {

  /** edges: (src: long, dst: long), treated as undirected.
    * Returns (node, component) where component = min node id in the
    * component, after `maxIter` propagation rounds (must be ≥ graph
    * diameter to guarantee convergence).
    */
  def labelPropagation(edges: DataFrame, maxIter: Int): DataFrame = {
    val und = edges.select(col("src").cast("long").as("a"), col("dst").cast("long").as("b"))
      .unionByName(edges.select(col("dst").cast("long").as("a"), col("src").cast("long").as("b")))
      .distinct()
    var labels = und.select(col("a").as("node")).distinct()
      .withColumn("component", col("node"))
    for (_ <- 1 to maxIter) {
      val neighborMin = und
        .join(labels, und("b") === labels("node"))
        .groupBy(col("a").as("node2"))
        .agg(min(col("component")).as("nbr_min"))
      labels = labels
        .join(neighborMin, labels("node") === neighborMin("node2"), "left")
        .select(col("node"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("component"))
    }
    labels
  }
}
