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

  /** Connected components via the ALTERNATING large-star / small-star
    * algorithm (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", 2014): per round, large-star links every strictly-larger
    * neighbor of u to m(u) = min(Γ(u) ∪ {u}); small-star links the
    * ≤-neighbors and u itself to m(u). The edge set contracts to a
    * star forest around component minima in O(log n) rounds REGARDLESS
    * OF DIAMETER — the property min-label propagation (O(diameter)
    * rounds) lacks, and the reason this is the 100 TB path for deep
    * chains. Each round is two narrow (node-keyed) shuffles; the
    * convergence check is a count+hash fingerprint agg on the already-
    * checkpointed edge set.
    */
  def alternatingStar(edges: DataFrame, maxRounds: Int = 60): DataFrame = {
    val orig = edges.select(col("src").cast("long").as("a"), col("dst").cast("long").as("b"))
    val nodes = orig.select(col("a").as("node"))
      .unionByName(orig.select(col("b").as("node")))
      .distinct().localCheckpoint(true)
    def canon(df: DataFrame): DataFrame = df
      .filter(col("x") =!= col("y"))
      .select(greatest(col("x"), col("y")).as("a"), least(col("x"), col("y")).as("b"))
      .distinct()
    def neighbors(e: DataFrame): DataFrame =
      e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
    def withMin(nb: DataFrame): DataFrame =
      nb.join(nb.groupBy(col("a").as("u")).agg(min(col("b")).as("mn"))
          .select(col("u"), least(col("u"), col("mn")).as("m")),
        col("a") === col("u"))
    def fingerprint(e: DataFrame): (Long, Long) = {
      // order-independent set fingerprint; bit_xor cannot overflow
      // under ANSI mode (sum of hashes would)
      val r = e.agg(count(lit(1)), bit_xor(xxhash64(col("a"), col("b")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var e = canon(orig.select(col("a").as("x"), col("b").as("y"))).localCheckpoint(true)
    var fp = fingerprint(e)
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val nb = withMin(neighbors(e))
      val ls = canon(nb.filter(col("b") > col("a"))
        .select(col("b").as("x"), col("m").as("y")))
      val nb2 = withMin(neighbors(ls))
      val ss = canon(
        nb2.filter(col("b") <= col("a")).select(col("b").as("x"), col("m").as("y"))
          .unionByName(nb2.select(col("a").as("x"), col("m").as("y"))))
        .localCheckpoint(true)
      val fp2 = fingerprint(ss)
      converged = fp2 == fp
      fp = fp2
      e = ss
      round += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"alternatingStar: round budget $maxRounds exhausted before the edge-set " +
          "fixpoint; returned components may be under-merged")
    // fixpoint edge set is a star forest: (v, component-min) rows;
    // centers and isolated nodes label themselves
    nodes.join(e.groupBy(col("a").as("node2")).agg(min(col("b")).as("c")),
        col("node") === col("node2"), "left")
      .select(col("node"), coalesce(col("c"), col("node")).as("component"))
  }

  /** Engine-choosing components: min-label propagation needs
    * O(diameter) shuffle rounds, so it wins on the low-diameter graphs
    * this engine mostly sees (hierarchies, call graphs with hubs) but
    * loses badly on long paths. `auto` gives propagation a bounded
    * round budget and, if the fixpoint isn't reached, restarts on the
    * O(log n)-round [[alternatingStar]] — the general-diameter scale
    * path. Both produce (node, component = min node id), so callers
    * can't tell which engine ran.
    */
  def auto(edges: DataFrame, lpRoundBudget: Int = 8): DataFrame = {
    val (labels, converged) = propagate(edges, lpRoundBudget)
    if (converged) labels
    else alternatingStar(edges)
  }

  /** COMMUNITY detection by synchronous label propagation (Raghavan
    * et al. 2007) — distinct from connected components: a node adopts
    * the label held by the PLURALITY of its neighbors each round, so
    * dense regions converge to one label while bridges don't spread
    * it. Deterministic throughout: the argmax breaks ties as
    * (count desc, label asc) via a single min(struct(-count, label))
    * aggregate — no RNG, no update-order dependence (synchronous), so
    * a bounded round count is exactly replayable by the oracle's
    * unrolled CTEs. Per round: one label join keyed on the neighbor +
    * two narrow node-keyed aggregations. Synchronous LPA can 2-cycle
    * on bipartite-ish regions — the fixed round budget is the
    * documented convention (GraphX's LabelPropagation ships the same
    * caveat), not a convergence claim.
    *
    * edges are treated as undirected; self-loops dropped (a self-vote
    * would just entrench the initial label). Returns (node, community).
    */
  def communities(edges: DataFrame, rounds: Int = 4): DataFrame = {
    val und = edges.select(col("src").cast("long").as("a"), col("dst").cast("long").as("b"))
      .unionByName(edges.select(col("dst").cast("long").as("a"), col("src").cast("long").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    // every node in `und` has ≥1 neighbor (symmetric closure), so the
    // per-round argmax always produces a row per node — no carry join
    var lab = und.select(col("a").as("node")).distinct()
      .withColumn("lab", col("node"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      lab = und
        .join(lab.select(col("node").as("nb"), col("lab")), col("b") === col("nb"))
        .groupBy(col("a"), col("lab"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("a").as("node"))
        .agg(min(struct((lit(0L) - col("c")).as("nc"), col("lab").as("l"))).as("m"))
        .select(col("node"), col("m.l").as("lab"))
        .localCheckpoint(true)
    }
    lab.select(col("node"), col("lab").as("community"))
  }
}
