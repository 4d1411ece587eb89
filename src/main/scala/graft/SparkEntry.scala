package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{GraphQueries, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry wires the driver-generated TPC-H-ish parquet tables into
  * one library operator from SURVEY.md §2; `oracleSql` carries the
  * DuckDB-equivalent SQL for the correctness gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q3_topk")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = baseQueries ++
    graft.queries.PipelineEntries.queries

  private def baseQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing" -> ((s, d) => Relational.pricingSummary(Tables.lineitem(s, d))),
    "q3_topk" -> ((s, d) =>
      Relational.topUnshippedOrders(
        Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d),
        segment = "BUILDING", date = "1997-01-01")),
    "q5_star" -> ((s, d) =>
      Relational.revenueByNation(
        Tables.lineitem(s, d), Tables.supplier(s, d), Tables.nation(s, d),
        Tables.region(s, d), regionName = "ASIA")),
    "q_window" -> ((s, d) => Relational.supplierRunningShipments(Tables.lineitem(s, d))),
    "q6_forecast" -> ((s, d) => Relational.forecastRevenue(Tables.lineitem(s, d))),
    "q18_large_orders" -> ((s, d) =>
      Relational.largeOrders(Tables.customer(s, d), Tables.orders(s, d),
        Tables.lineitem(s, d))),
    "q4_priority" -> ((s, d) =>
      Relational.orderPriorityReturns(Tables.orders(s, d), Tables.lineitem(s, d))),
    "q10_returns" -> ((s, d) =>
      Relational.returnedItemReport(Tables.customer(s, d), Tables.orders(s, d),
        Tables.lineitem(s, d), Tables.nation(s, d))),
    "q14_promo" -> ((s, d) =>
      Relational.promoRevenueShare(Tables.lineitem(s, d), Tables.part(s, d))),
    "q19_brand" -> ((s, d) =>
      Relational.discountedBrandRevenue(Tables.lineitem(s, d), Tables.part(s, d))),
    "q7_volume" -> ((s, d) =>
      Relational.volumeShipping(Tables.lineitem(s, d), Tables.orders(s, d),
        Tables.customer(s, d), Tables.supplier(s, d), Tables.nation(s, d))),
    "q22_prospects" -> ((s, d) =>
      Relational.salesProspects(Tables.customer(s, d), Tables.orders(s, d))),
    "q2_mincost" -> ((s, d) =>
      Relational.minCostSupplier(Tables.lineitem(s, d), Tables.part(s, d),
        Tables.supplier(s, d))),
    "q8_market_share" -> ((s, d) =>
      Relational.nationMarketShare(Tables.lineitem(s, d), Tables.orders(s, d),
        Tables.customer(s, d), Tables.supplier(s, d), Tables.nation(s, d),
        Tables.region(s, d))),
    "q9_profit" -> ((s, d) =>
      Relational.productTypeProfit(Tables.lineitem(s, d), Tables.part(s, d),
        Tables.supplier(s, d), Tables.nation(s, d))),
    "q11_important_parts" -> ((s, d) =>
      Relational.importantParts(Tables.lineitem(s, d), Tables.supplier(s, d),
        Tables.nation(s, d))),
    "q12_shipmode" -> ((s, d) =>
      Relational.lateShipmentPriority(Tables.orders(s, d), Tables.lineitem(s, d))),
    "q13_order_dist" -> ((s, d) =>
      Relational.customerOrderDistribution(Tables.customer(s, d),
        Tables.orders(s, d))),
    "q15_top_supplier" -> ((s, d) =>
      Relational.topSupplier(Tables.lineitem(s, d), Tables.supplier(s, d))),
    "q16_supplier_cnt" -> ((s, d) =>
      Relational.supplierCountByPart(Tables.lineitem(s, d), Tables.part(s, d),
        Tables.supplier(s, d))),
    "q17_small_qty" -> ((s, d) =>
      Relational.smallQuantityRevenue(Tables.lineitem(s, d), Tables.part(s, d))),
    "q20_promotion_parts" -> ((s, d) =>
      Relational.promotionPartSuppliers(Tables.lineitem(s, d), Tables.part(s, d),
        Tables.supplier(s, d))),
    "q21_waiting" -> ((s, d) =>
      Relational.waitingSuppliers(Tables.lineitem(s, d), Tables.orders(s, d),
        Tables.supplier(s, d), Tables.nation(s, d))),
    "q_rollup" -> ((s, d) => Relational.pricingRollup(Tables.lineitem(s, d))),
    "q_cube" -> ((s, d) => Relational.pricingCube(Tables.lineitem(s, d))),
    "events_enrich" -> ((s, d) =>
      graft.streaming.EventStreams.enrichByNation(
        graft.streaming.EventStreams.events(s, d), Tables.nation(s, d))),
    // Graph query surface (SURVEY.md §2 B*, A5, C*)
    "callgraph_bfs" -> ((s, d) => GraphQueries.callgraphBfs(s, d)),
    "call_paths_down" -> ((s, d) => GraphQueries.callPathsDown(s, d)),
    "call_chain_up" -> ((s, d) => GraphQueries.callChainUp(s, d)),
    "call_sequences" -> ((s, d) => GraphQueries.callSequences(s, d)),
    "caller_sequences" -> ((s, d) => GraphQueries.callerSequences(s, d)),
    "recursion_detect" -> ((s, d) => GraphQueries.recursionDetect(s, d)),
    "call_freq" -> ((s, d) => GraphQueries.callFrequencies(s, d)),
    "xrefs" -> ((s, d) => GraphQueries.xrefs(s, d)),
    "fn_search" -> ((s, d) => GraphQueries.fnSearch(s, d)),
    "binary_info" -> ((s, d) => GraphQueries.binaryInfo(s, d)),
    "graph_stats" -> ((s, d) => GraphQueries.graphStats(s, d)),
    "graph_degrees" -> ((s, d) => GraphQueries.graphDegrees(s, d)),
    "graph_components" -> ((s, d) => GraphQueries.graphComponents(s, d)),
    "graph_component_sizes" -> ((s, d) => GraphQueries.graphComponentSizes(s, d)),
    "graph_scc" -> ((s, d) => GraphQueries.graphScc(s, d)),
    "graph_pagerank" -> ((s, d) => GraphQueries.graphPageRank(s, d)),
    "graph_pagerank_w" -> ((s, d) => GraphQueries.graphPageRankWeighted(s, d)),
    "graph_triangles" -> ((s, d) => GraphQueries.graphTriangles(s, d)),
    "graph_kcore" -> ((s, d) => GraphQueries.graphKCore(s, d)),
    "graph_sssp" -> ((s, d) => GraphQueries.graphSssp(s, d)),
    "graph_ppr" -> ((s, d) => GraphQueries.graphPpr(s, d)),
    "graph_ppr_batch" -> ((s, d) => GraphQueries.graphPprBatch(s, d)),
    "recursion_groups" -> ((s, d) => GraphQueries.recursionGroups(s, d)),
    "graph_neighbor_sim" -> ((s, d) => GraphQueries.neighborSim(s, d)),
    "graph_anf" -> ((s, d) => GraphQueries.graphAnf(s, d)),
    "graph_betweenness" -> ((s, d) => GraphQueries.graphBetweenness(s, d)),
    "graph_walks" -> ((s, d) => GraphQueries.graphWalks(s, d)),
    "graph_walks_biased" -> ((s, d) => GraphQueries.graphWalksBiased(s, d)),
    "graph_diff" -> ((s, d) => GraphQueries.graphDiff(s, d)),
    "graph_communities" -> ((s, d) => GraphQueries.graphCommunities(s, d)),
    "graph_labelspread" -> ((s, d) => GraphQueries.graphLabelSpread(s, d)),
    "graph_modularity" -> ((s, d) => GraphQueries.graphModularity(s, d)),
    "graph_closeness" -> ((s, d) => GraphQueries.graphCloseness(s, d)),
    "graph_harmonic" -> ((s, d) => GraphQueries.graphHarmonic(s, d)),
    "graph_hits" -> ((s, d) => GraphQueries.graphHits(s, d)),
    "graph_eigen" -> ((s, d) => GraphQueries.graphEigen(s, d)),
    "graph_reciprocity" -> ((s, d) => GraphQueries.graphReciprocity(s, d)),
    "graph_clustering" -> ((s, d) => GraphQueries.graphClustering(s, d)),
    "graph_assortativity" -> ((s, d) => GraphQueries.graphAssortativity(s, d)),
    "graph_motifs" -> ((s, d) => GraphQueries.graphMotifs(s, d)),
    "graph_cosupply" -> ((s, d) => GraphQueries.coSupply(s, d)),
    "graph_cosupply_stats" -> ((s, d) => GraphQueries.coSupplyStats(s, d)),
    "graph_adamic" -> ((s, d) => GraphQueries.adamicAdar(s, d)),
    "graph_resource_alloc" -> ((s, d) => GraphQueries.resourceAlloc(s, d)),
    "graph_msf" -> ((s, d) => GraphQueries.graphMsf(s, d)),
    "graph_diameter" -> ((s, d) => GraphQueries.graphDiameter(s, d)),
    "graph_squares" -> ((s, d) =>
      graft.graph.Ranking.squareCount(GraphQueries.callEdges(s, d))),
    "graph_salsa" -> ((s, d) => GraphQueries.graphSalsa(s, d)),
    "table_checksum" -> ((s, d) => Relational.tableChecksum(Tables.orders(s, d))),
    "q_corr" -> ((s, d) => Relational.measureCorrelation(Tables.lineitem(s, d))),
    "graph_ktruss" -> ((s, d) => GraphQueries.graphKTruss(s, d)),
    "graph_weakties" -> ((s, d) => GraphQueries.graphWeakTies(s, d)),
    "graph_coreness" -> ((s, d) => GraphQueries.graphCoreness(s, d)),
    "customer_rfm" -> ((s, d) => Relational.customerRfm(Tables.orders(s, d))),
    "basket_lift" -> ((s, d) => Relational.basketLift(Tables.lineitem(s, d))),
    "q_yoy" -> ((s, d) => Relational.monthlyYoy(Tables.orders(s, d))),
    "q_pareto" -> ((s, d) =>
      Relational.revenueConcentration(Tables.orders(s, d))),
    "graph_temporal" -> ((s, d) => GraphQueries.graphTemporal(s, d)),
    "lineage_up" -> ((s, d) => GraphQueries.lineageUp(s, d)),
    "q_skyline" -> ((s, d) => Relational.skyline(Tables.part(s, d))),
    "table_profile" -> ((s, d) => Relational.tableProfile(Tables.lineitem(s, d))),
    "q_gini" -> ((s, d) => Relational.giniRevenue(Tables.orders(s, d))),
    "graph_ecc" -> ((s, d) => GraphQueries.graphEccentricity(s, d)),
    "graph_katz" -> ((s, d) => GraphQueries.graphKatz(s, d)),
    "graph_richclub" -> ((s, d) => GraphQueries.graphRichClub(s, d)),
    "graph_mixing" -> ((s, d) => GraphQueries.graphMixing(s, d)),
    "graph_lcc" -> ((s, d) => GraphQueries.graphLcc(s, d)),
    "graph_bowtie" -> ((s, d) => GraphQueries.graphBowTie(s, d)),
    "graph_effdiam" -> ((s, d) => GraphQueries.graphEffDiameter(s, d)),
    "graph_knn_degree" -> ((s, d) => GraphQueries.graphKnnDegree(s, d)),
    "graph_sparsify" -> ((s, d) => GraphQueries.graphSparsify(s, d)),
    "graph_powerlaw" -> ((s, d) => GraphQueries.graphPowerLaw(s, d)),
    "graph_centralization" -> ((s, d) => GraphQueries.graphCentralization(s, d))
  )

  /** Unrolled synchronous-LPA rounds over the undirected neighbor CTE
    * `und` (see [[graft.graph.Components.communities]]): per round,
    * neighbor-label counts then the deterministic (count desc, label
    * asc) plurality pick via row_number. */
  private def lpaCtes(rounds: Int): String =
    (1 to rounds).map { t =>
      s"""c$t AS (SELECT u.a AS node, l.lab, COUNT(*) AS c
         |  FROM und u JOIN l${t - 1} l ON l.node = u.b GROUP BY 1, 2),
         |l$t AS (SELECT node, lab FROM (
         |  SELECT node, lab,
         |         row_number() OVER (PARTITION BY node ORDER BY c DESC, lab) AS rn
         |  FROM c$t) r WHERE rn = 1)""".stripMargin
    }.mkString(",\n")

  /** Unrolled seeded label-spreading rounds (see
    * [[graft.graph.Components.labelSpread]]): per round the LPA
    * plurality pick over LABELED neighbors only, seeds re-asserted
    * (clamped) on top — a non-seed's vote wins only where it exists,
    * and unlabeled nodes stay absent until the frontier reaches
    * them. */
  private def spreadCtes(rounds: Int): String =
    (1 to rounds).map { t =>
      s"""c$t AS (SELECT u.a AS node, l.lab, COUNT(*) AS c
         |  FROM und u JOIN l${t - 1} l ON l.node = u.b GROUP BY 1, 2),
         |p$t AS (SELECT node, lab FROM (
         |  SELECT node, lab,
         |         row_number() OVER (PARTITION BY node ORDER BY c DESC, lab) AS rn
         |  FROM c$t) r WHERE rn = 1),
         |l$t AS MATERIALIZED (
         |  SELECT node, lab FROM seeds
         |  UNION ALL
         |  SELECT node, lab FROM p$t
         |  WHERE node NOT IN (SELECT node FROM seeds))""".stripMargin
    }.mkString(",\n")

  /** Unrolled fixed-point PageRank CTEs: ppm integers, floor-div
    * contributions, damping as the exact fraction 17/20 — bit-exact
    * replay with no float summation-order hazard. */
  /** Unrolled Katz rounds: kₜ = 10⁶ + Σ_in ⌊kₜ₋₁/8⌋ (Ranking.katz). */
  private def katzCtes(iters: Int): String = {
    val sb = new StringBuilder(
      """nodes AS (SELECT DISTINCT n AS node FROM
        |  (SELECT src AS n FROM e UNION ALL SELECT dst FROM e) t),
        |k0 AS (SELECT node, CAST(1000000 AS BIGINT) AS k FROM nodes)""".stripMargin)
    for (t <- 1 to iters) sb.append(s""",
       |kc$t AS (
       |  SELECT e.dst AS node, SUM(p.k // 8) AS c
       |  FROM k${t - 1} p JOIN e ON e.src = p.node GROUP BY 1),
       |k$t AS (
       |  SELECT n.node, CAST(1000000 + COALESCE(c.c, 0) AS BIGINT) AS k
       |  FROM nodes n LEFT JOIN kc$t c ON c.node = n.node)""".stripMargin)
    sb.toString
  }

  private def pageRankCtes(iters: Int): String = {
    val sb = new StringBuilder(
      """nodes AS (SELECT DISTINCT n AS node FROM
        |  (SELECT src AS n FROM e UNION ALL SELECT dst FROM e) t),
        |od AS (SELECT src AS node, COUNT(*) AS outdeg FROM e GROUP BY 1),
        |pr0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM nodes)""".stripMargin)
    for (t <- 1 to iters) sb.append(s""",
       |c$t AS (
       |  SELECT e.dst AS node, SUM(p.pr // o.outdeg) AS c
       |  FROM pr${t - 1} p JOIN od o ON p.node = o.node JOIN e ON e.src = p.node
       |  GROUP BY 1),
       |pr$t AS (
       |  SELECT n.node,
       |         CAST(150000 + (17 * COALESCE(c.c, 0)) // 20 AS BIGINT) AS pr
       |  FROM nodes n LEFT JOIN c$t c ON n.node = c.node)""".stripMargin)
    sb.toString
  }

  /** Unrolled WEIGHTED fixed-point PageRank CTEs over the `ew`
    * (src, dst, w) edge CTE: per-edge contribution ⌊pr·w / Σw_out⌋
    * widened to HUGEINT then floored back to BIGINT per term — the
    * exact replay of Ranking.pageRankWeighted's DECIMAL(38,0) widen. */
  private def pageRankWeightedCtes(iters: Int): String = {
    val sb = new StringBuilder(
      """nodes AS (SELECT DISTINCT n AS node FROM
        |  (SELECT src AS n FROM ew UNION ALL SELECT dst FROM ew) t),
        |od AS (SELECT src AS node, SUM(w) AS wout FROM ew GROUP BY 1),
        |pr0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM nodes)""".stripMargin)
    for (t <- 1 to iters) sb.append(s""",
       |c$t AS (
       |  SELECT ew.dst AS node,
       |         SUM(CAST((CAST(p.pr AS HUGEINT) * ew.w) // o.wout AS BIGINT)) AS c
       |  FROM pr${t - 1} p JOIN od o ON p.node = o.node JOIN ew ON ew.src = p.node
       |  GROUP BY 1),
       |pr$t AS (
       |  SELECT n.node,
       |         CAST(150000 + (17 * COALESCE(c.c, 0)) // 20 AS BIGINT) AS pr
       |  FROM nodes n LEFT JOIN c$t c ON n.node = c.node)""".stripMargin)
    sb.toString
  }

  /** Unrolled bounded Bellman-Ford rounds: d{t} = min(d{t-1},
    * relax-once) — exact long arithmetic, no drift surface. */
  private def ssspCtes(rounds: Int): String =
    (1 to rounds).map { t =>
      s"""d$t AS (SELECT node, MIN(dist) AS dist FROM (
         |  SELECT node, dist FROM d${t - 1}
         |  UNION ALL
         |  SELECT e.dst AS node, d${t - 1}.dist + e.call_offset AS dist
         |  FROM d${t - 1} JOIN e ON e.src = d${t - 1}.node) t$t GROUP BY 1)""".stripMargin
    }.mkString(",\n")

  /** Unrolled personalized-PageRank CTEs: the [[pageRankCtes]] contract
    * (ppm longs, floor-div, 17/20) with the teleport term restricted
    * to the seed set `sd`. */
  private def pprCtes(iters: Int): String = {
    val sb = new StringBuilder(
      """nodes AS (SELECT DISTINCT n AS node FROM
        |  (SELECT src AS n FROM e UNION ALL SELECT dst FROM e) t),
        |od AS (SELECT src AS node, COUNT(*) AS outdeg FROM e GROUP BY 1),
        |sd AS (SELECT node FROM (SELECT DISTINCT src AS node FROM e WHERE src % 1000 = 7)
        |   ORDER BY md5(CAST(node AS VARCHAR)) LIMIT 64),
        |pr0 AS (SELECT n.node,
        |          CAST(CASE WHEN sd.node IS NOT NULL THEN 1000000 ELSE 0 END AS BIGINT) AS pr
        |        FROM nodes n LEFT JOIN sd ON n.node = sd.node)""".stripMargin)
    for (t <- 1 to iters) sb.append(s""",
       |c$t AS (
       |  SELECT e.dst AS node, SUM(p.pr // o.outdeg) AS c
       |  FROM pr${t - 1} p JOIN od o ON p.node = o.node JOIN e ON e.src = p.node
       |  GROUP BY 1),
       |pr$t AS (
       |  SELECT n.node,
       |         CAST((CASE WHEN sd.node IS NOT NULL THEN 150000 ELSE 0 END)
       |              + (17 * COALESCE(c.c, 0)) // 20 AS BIGINT) AS pr
       |  FROM nodes n LEFT JOIN c$t c ON n.node = c.node
       |  LEFT JOIN sd ON n.node = sd.node)""".stripMargin)
    sb.toString
  }

  /** Unrolled BATCH personalized-PageRank CTEs (see
    * [[graft.graph.Ranking.personalizedPageRankBatch]]): the pprCtes
    * recurrence with a seed column threaded through, state kept
    * SPARSE (pr > 0 rows only — a zero-flow row is equivalent to an
    * absent one under the recurrence). */
  private def pprBatchCtes(iters: Int): String = {
    val sb = new StringBuilder(
      """od AS (SELECT src AS node, COUNT(*) AS outdeg FROM e GROUP BY 1),
        |bseeds AS MATERIALIZED (
        |  SELECT DISTINCT src AS s FROM e WHERE src % 1500 = 9),
        |b0 AS (SELECT s, s AS node, CAST(1000000 AS BIGINT) AS pr FROM bseeds)""".stripMargin)
    for (t <- 1 to iters) sb.append(s""",
       |bc$t AS (
       |  SELECT p.s, e.dst AS node, SUM(p.pr // o.outdeg) AS c
       |  FROM b${t - 1} p JOIN od o ON p.node = o.node JOIN e ON e.src = p.node
       |  GROUP BY 1, 2),
       |b$t AS MATERIALIZED (
       |  SELECT s, node, CAST(SUM(v) AS BIGINT) AS pr FROM (
       |    SELECT s, s AS node, CAST(150000 AS BIGINT) AS v FROM bseeds
       |    UNION ALL
       |    SELECT s, node, CAST((17 * c) // 20 AS BIGINT) AS v FROM bc$t) u
       |  GROUP BY 1, 2
       |  HAVING SUM(v) > 0)""".stripMargin)
    sb.toString
  }

  /** Unrolled Brandes sweeps (see Ranking.betweennessSampled): forward
    * levels l0..lD carry exact integer σ (sum over same-level preds,
    * first-touch via the visited anti filter); backward d{D}..d0
    * accumulate δ in ppm with integer floor division — both engines
    * replay ⌊σv·(10⁶+δw)/σw⌋ exactly. */
  private def betweennessCtes(depth: Int): String = {
    val sb = new StringBuilder(
      """s0 AS (SELECT s FROM (SELECT DISTINCT src AS s FROM e WHERE src % 200 = 7)
        |      ORDER BY md5(CAST(s AS VARCHAR)) LIMIT 64),
        |l0 AS MATERIALIZED (SELECT s, s AS v, CAST(1 AS BIGINT) AS sigma FROM s0),
        |vis0 AS MATERIALIZED (SELECT s, v FROM l0)""".stripMargin)
    for (t <- 1 to depth) sb.append(s""",
       |l$t AS MATERIALIZED (
       |  SELECT p.s, e.dst AS v, CAST(SUM(p.sigma) AS BIGINT) AS sigma
       |  FROM l${t - 1} p JOIN e ON e.src = p.v
       |  LEFT JOIN vis${t - 1} x ON x.s = p.s AND x.v = e.dst
       |  WHERE x.v IS NULL GROUP BY 1, 2),
       |vis$t AS MATERIALIZED (
       |  SELECT s, v FROM vis${t - 1} UNION SELECT s, v FROM l$t)""".stripMargin)
    sb.append(s""",
       |d$depth AS (SELECT s, v, CAST(0 AS BIGINT) AS delta FROM l$depth)""".stripMargin)
    for (t <- depth - 1 to 0 by -1) sb.append(s""",
       |d$t AS MATERIALIZED (
       |  SELECT cur.s, cur.v, COALESCE(c.delta, 0) AS delta FROM l$t cur
       |  LEFT JOIN (
       |    SELECT cur.s, cur.v,
       |           CAST(SUM(cur.sigma * (1000000 + dn.delta) // nx.sigma) AS BIGINT)
       |             AS delta
       |    FROM l$t cur JOIN e ON e.src = cur.v
       |    JOIN l${t + 1} nx ON nx.s = cur.s AND nx.v = e.dst
       |    JOIN d${t + 1} dn ON dn.s = nx.s AND dn.v = nx.v
       |    GROUP BY 1, 2) c ON c.s = cur.s AND c.v = cur.v)""".stripMargin)
    sb.append(s""",
       |alldelta AS (${(0 to depth).map(t => s"SELECT s, v, delta FROM d$t")
        .mkString(" UNION ALL ")})""".stripMargin)
    sb.toString
  }

  /** Unrolled synchronous HITS rounds in exact integers: per round,
    * auth/hub sums from the PREVIOUS round's scores (simultaneous
    * update), then each side floor-normalized to max = 10⁶ — replays
    * [[graft.graph.Ranking.hits]] bit-exactly. */
  private def hitsCtes(iters: Int): String = {
    val sb = new StringBuilder(
      """nodes AS (SELECT DISTINCT n AS node FROM
        |  (SELECT src AS n FROM e UNION ALL SELECT dst FROM e) t),
        |s0 AS (SELECT node, CAST(1000000 AS BIGINT) AS h,
        |       CAST(1000000 AS BIGINT) AS a FROM nodes)""".stripMargin)
    for (t <- 1 to iters) sb.append(s""",
       |ra$t AS (SELECT e.dst AS node, CAST(SUM(s.h) AS BIGINT) AS v
       |         FROM s${t - 1} s JOIN e ON e.src = s.node GROUP BY 1),
       |rh$t AS (SELECT e.src AS node, CAST(SUM(s.a) AS BIGINT) AS v
       |         FROM s${t - 1} s JOIN e ON e.dst = s.node GROUP BY 1),
       |j$t AS MATERIALIZED (
       |  SELECT n.node, COALESCE(rh.v, 0) AS hv, COALESCE(ra.v, 0) AS av
       |  FROM nodes n LEFT JOIN rh$t rh ON n.node = rh.node
       |  LEFT JOIN ra$t ra ON n.node = ra.node),
       |m$t AS (SELECT greatest(MAX(hv), 1) AS mh, greatest(MAX(av), 1) AS ma
       |        FROM j$t),
       |s$t AS (SELECT node,
       |        CAST((1000000 * CAST(hv AS HUGEINT)) // mh AS BIGINT) AS h,
       |        CAST((1000000 * CAST(av AS HUGEINT)) // ma AS BIGINT) AS a
       |        FROM j$t, m$t)""".stripMargin)
    sb.toString
  }

  /** Unrolled SHIFTED eigenvector-centrality power-iteration rounds
    * over the distinct edge CTE `de`: per round v = own score +
    * in-edge sum of the previous round's scores (the A + I shift),
    * then one floor-normalization to max = 10⁶ (HUGEINT-widened) —
    * replays [[graft.graph.Ranking.eigenCentrality]] bit-exactly. */
  private def eigenCtes(iters: Int): String = {
    val sb = new StringBuilder(
      """de AS MATERIALIZED (SELECT DISTINCT src, dst FROM e),
        |nodes AS (SELECT DISTINCT n AS node FROM
        |  (SELECT src AS n FROM de UNION ALL SELECT dst FROM de) t),
        |x0 AS (SELECT node, CAST(1000000 AS BIGINT) AS x FROM nodes)""".stripMargin)
    for (t <- 1 to iters) sb.append(s""",
       |rv$t AS (SELECT de.dst AS node, CAST(SUM(s.x) AS BIGINT) AS v
       |         FROM x${t - 1} s JOIN de ON de.src = s.node GROUP BY 1),
       |jv$t AS MATERIALIZED (
       |  SELECT s.node, s.x + COALESCE(rv.v, 0) AS v
       |  FROM x${t - 1} s LEFT JOIN rv$t rv ON s.node = rv.node),
       |mv$t AS (SELECT greatest(MAX(v), 1) AS mv FROM jv$t),
       |x$t AS (SELECT node,
       |        CAST((1000000 * CAST(v AS HUGEINT)) // mv AS BIGINT) AS x
       |        FROM jv$t, mv$t)""".stripMargin)
    sb.toString
  }

  /** Unrolled SALSA rounds over the distinct edge CTE `de` (built
    * from `e`): per round one outdeg-floored authority push and one
    * indeg-floored hub pull, left-joined back to the node frame.
    * Ends with `mfin` (the max frame) for the final ppm scaling. */
  private def salsaCtes(iters: Int): String = {
    val sb = new StringBuilder(
      """de AS MATERIALIZED (SELECT DISTINCT src, dst FROM e),
        |nodes AS (SELECT DISTINCT n AS node FROM
        |  (SELECT src AS n FROM de UNION ALL SELECT dst FROM de) t),
        |ew AS MATERIALIZED (
        |  SELECT de.src, de.dst, od.outdeg, idg.indeg
        |  FROM de
        |  JOIN (SELECT src, COUNT(*) AS outdeg FROM de GROUP BY 1) od
        |    USING (src)
        |  JOIN (SELECT dst, COUNT(*) AS indeg FROM de GROUP BY 1) idg
        |    USING (dst)),
        |s0 AS (SELECT node, CAST(1000000 AS BIGINT) AS h,
        |       CAST(1000000 AS BIGINT) AS a FROM nodes)""".stripMargin)
    for (t <- 1 to iters) sb.append(s""",
       |sa$t AS (SELECT ew.dst AS node,
       |         CAST(SUM(s.h // ew.outdeg) AS BIGINT) AS v
       |         FROM s${t - 1} s JOIN ew ON ew.src = s.node GROUP BY 1),
       |sh$t AS (SELECT ew.src AS node,
       |         CAST(SUM(a.v // ew.indeg) AS BIGINT) AS v
       |         FROM sa$t a JOIN ew ON ew.dst = a.node GROUP BY 1),
       |s$t AS MATERIALIZED (
       |  SELECT n.node, COALESCE(h.v, 0) AS h, COALESCE(a.v, 0) AS a
       |  FROM nodes n LEFT JOIN sh$t h ON n.node = h.node
       |  LEFT JOIN sa$t a ON n.node = a.node)""".stripMargin)
    sb.append(s""",
       |mfin AS (SELECT greatest(MAX(h), 1) AS mh, greatest(MAX(a), 1) AS ma
       |         FROM s$iters)""".stripMargin)
    sb.toString
  }

  /** Unrolled Borůvka rounds (Components.minSpanningForest twin):
    * per outer round a cross-component edge filter, the per-component
    * (w, a, b)-tie-broken min pick, the pick's component graph, and
    * `inner` pointer-jumped min-label rounds collapsing the merge
    * chains. Leaves pk1..pkN (the per-round picked edges) in scope;
    * expects `und` (a, b, w) and `c0` (node, comp) upstream. */
  private def msfCtes(outer: Int, inner: Int): String =
    (1 to outer).map { t =>
      val innerCtes = (1 to inner).map { j =>
        s"""l${t}_$j AS MATERIALIZED (
           |  SELECT p.c,
           |    LEAST(p.l, COALESCE(nm.m, p.l), COALESCE(pj.l2, p.l)) AS l
           |  FROM l${t}_${j - 1} p
           |  LEFT JOIN (SELECT hs.hx AS c, MIN(q.l) AS m
           |             FROM hs$t hs JOIN l${t}_${j - 1} q ON q.c = hs.hy
           |             GROUP BY 1) nm ON nm.c = p.c
           |  LEFT JOIN (SELECT r1.c, r2.l AS l2 FROM l${t}_${j - 1} r1
           |             JOIN l${t}_${j - 1} r2 ON r2.c = r1.l) pj
           |    ON pj.c = p.c)""".stripMargin
      }.mkString(",\n")
      s"""ce$t AS MATERIALIZED (
         |  SELECT u.a, u.b, u.w, x.comp AS ca, y.comp AS cb
         |  FROM und u
         |  JOIN c${t - 1} x ON x.node = u.a
         |  JOIN c${t - 1} y ON y.node = u.b
         |  WHERE x.comp <> y.comp),
         |pk$t AS MATERIALIZED (
         |  SELECT DISTINCT a, b, w FROM (
         |    SELECT comp, a, b, w,
         |           row_number() OVER (PARTITION BY comp ORDER BY w, a, b) AS rn
         |    FROM (SELECT ca AS comp, a, b, w FROM ce$t
         |          UNION ALL SELECT cb, a, b, w FROM ce$t) z) zz
         |  WHERE rn = 1),
         |h$t AS (
         |  SELECT DISTINCT x.comp AS hx, y.comp AS hy
         |  FROM pk$t p
         |  JOIN c${t - 1} x ON x.node = p.a
         |  JOIN c${t - 1} y ON y.node = p.b),
         |hs$t AS (SELECT hx, hy FROM h$t UNION SELECT hy, hx FROM h$t),
         |l${t}_0 AS (SELECT DISTINCT comp AS c, comp AS l FROM c${t - 1}),
         |$innerCtes,
         |c$t AS MATERIALIZED (
         |  SELECT cc.node, ll.l AS comp FROM c${t - 1} cc
         |  JOIN l${t}_$inner ll ON ll.c = cc.comp)""".stripMargin
    }.mkString(",\n")

  /** 12 unrolled min-label rounds over the undirected pair CTE `und`
    * (the Dedup.clusters oracle contract: labels are fixpoint-stable,
    * so bounded replay ≡ the Spark fixpoint). */
  private def labelRoundCtes(rounds: Int): String =
    (0 until rounds).map { t =>
      s"""l${t + 1} AS MATERIALIZED (
         |  SELECT l.node,
         |         least(l.component, COALESCE(MIN(n.component), l.component))
         |           AS component
         |  FROM l$t l
         |  LEFT JOIN und u ON u.a = l.node
         |  LEFT JOIN l$t n ON n.node = u.b
         |  GROUP BY l.node, l.component)""".stripMargin
    }.mkString(",\n")

  /** Unrolled deterministic-walk CTEs: step t picks, per live walker,
    * the out-neighbor with the smallest md5(walk,t,node,nbr) — the
    * same keyed draw Traversal.walks computes (md5 over the identical
    * comma-joined decimal rendering), tie-broken on nbr. row_number
    * over (hash, nbr) is the oracle's argmin; walkers at sinks drop
    * out of later CTEs exactly as the Spark join does. */
  private def walkCtes(steps: Int): String =
    (1 to steps).map { t =>
      s"""w$t AS (SELECT walk_id, CAST($t AS BIGINT) AS step, n AS node FROM (
         |  SELECT w.walk_id, e.dst AS n,
         |         row_number() OVER (PARTITION BY w.walk_id ORDER BY
         |           md5(CAST(w.walk_id AS VARCHAR) || ',' || '$t' || ',' ||
         |               CAST(w.node AS VARCHAR) || ',' || CAST(e.dst AS VARCHAR)),
         |           e.dst) AS rn
         |  FROM w${t - 1} w JOIN e ON e.src = w.node) s$t WHERE rn = 1)""".stripMargin
    }.mkString(",\n")

  /** Unrolled node2vec-biased walk CTEs (Traversal.randomWalksBiased):
    * per candidate the weight is chosen by the prev-hop CASE, the
    * candidate is fanned out wt times via unnest(range(wt)), and the
    * argmin over md5(walk,t,v,n,k) picks the move — replication
    * symmetry makes P(pick) ∝ wt while staying a pure hash function
    * both engines compute identically. State rows carry prev. */
  private def walkBiasCtes(steps: Int, wRet: Int, wIn: Int, wOut: Int): String =
    (1 to steps).map { t =>
      s"""s$t AS (
         |  SELECT w.walk_id, w.node AS v, ce.dst AS n,
         |         CASE WHEN ce.dst = w.prev THEN $wRet
         |              WHEN pe.src IS NOT NULL THEN $wIn
         |              ELSE $wOut END AS wt
         |  FROM b${t - 1} w
         |  JOIN e ce ON ce.src = w.node
         |  LEFT JOIN e pe ON pe.src = w.prev AND pe.dst = ce.dst),
         |b$t AS (SELECT walk_id, CAST($t AS BIGINT) AS step, v AS prev,
         |              n AS node FROM (
         |  SELECT walk_id, v, n,
         |         row_number() OVER (PARTITION BY walk_id ORDER BY
         |           md5(CAST(walk_id AS VARCHAR) || ',' || '$t' || ',' ||
         |               CAST(v AS VARCHAR) || ',' || CAST(n AS VARCHAR) ||
         |               ',' || CAST(k AS VARCHAR)), n) AS rn
         |  FROM (SELECT s.*, unnest(range(s.wt)) AS k FROM s$t s) x) y
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")

  /** The scale-stable node-space modulus, mirroring
    * [[graft.queries.GraphQueries.modulus]]: GREATEST(5000,
    * |lineitem| // 120) — exactly 5000 at every gate SF. Inlined as a
    * scalar subquery wherever the derived graph keys are computed. */
  private val MOD = "GREATEST(5000, (SELECT COUNT(*) FROM lineitem) // 120)"

  /** Shared oracle CTE: the derived CALLS edge table (SURVEY.md §4). */
  private[graft] val E =
    s"""nodemod AS (SELECT $MOD AS v),
      |e AS (
      |  SELECT l_orderkey % (SELECT v FROM nodemod) AS src,
      |         l_partkey % (SELECT v FROM nodemod) AS dst,
      |         CAST(MIN(l_linenumber) AS BIGINT) AS call_offset
      |  FROM lineitem GROUP BY 1, 2)""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = baseOracles ++
    graft.queries.PipelineEntries.oracleSql

  private def baseOracles: Map[String, String] = Map(
    "q1_pricing" ->
      """WITH r AS (
        |  SELECT l_returnflag, l_linestatus,
        |         CAST(l_quantity AS BIGINT) AS q,
        |         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS ep,
        |         100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS dc,
        |         100 + CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS tx,
        |         CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d
        |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'),
        |g AS (
        |  SELECT l_returnflag, l_linestatus,
        |         SUM(CAST(q AS HUGEINT)) AS qty_u,
        |         SUM(CAST(ep AS HUGEINT)) AS base_u,
        |         SUM(CAST(ep * dc AS HUGEINT)) AS discprice_u,
        |         SUM(CAST(ep * dc * tx AS HUGEINT)) AS charge_u,
        |         SUM(CAST(d AS HUGEINT)) AS disc_u,
        |         COUNT(*) AS n
        |  FROM r GROUP BY 1, 2)
        |SELECT l_returnflag, l_linestatus,
        |  CAST(qty_u AS DOUBLE) AS sum_qty,
        |  CAST(base_u AS BIGINT) / 100.0 AS sum_base_price,
        |  CAST((discprice_u + 50) // 100 AS BIGINT) / 100.0 AS sum_disc_price,
        |  CAST((charge_u + 5000) // 10000 AS BIGINT) / 100.0 AS sum_charge,
        |  CAST((20000 * qty_u + n) // (2 * n) AS BIGINT) / 10000.0 AS avg_qty,
        |  CAST((200 * base_u + n) // (2 * n) AS BIGINT) / 10000.0 AS avg_price,
        |  CAST((200 * disc_u + n) // (2 * n) AS BIGINT) / 10000.0 AS avg_disc,
        |  n AS count_order
        |FROM g
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_topk" ->
      """SELECT l_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  o_orderpriority,
        |  CAST((SUM(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |      * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS HUGEINT))
        |      + 50) // 100 AS BIGINT) / 100.0 AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate > TIMESTAMP '1997-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q4_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // argmin via (cost, suppkey) tuple-min; unit_cost is a floor-form
    // rounded MIN of per-row divides — no sums, bit-identical.
    "q2_mincost" ->
      """WITH unit AS (
        |  SELECT l_partkey, l_suppkey,
        |         floor(MIN(l_extendedprice / l_quantity) * 100 + 0.5) / 100
        |           AS unit_cost
        |  FROM lineitem GROUP BY 1, 2),
        |best AS (
        |  SELECT l_partkey, unit_cost, l_suppkey AS best_suppkey FROM (
        |    SELECT l_partkey, unit_cost, l_suppkey,
        |           row_number() OVER (PARTITION BY l_partkey
        |             ORDER BY unit_cost, l_suppkey) AS rn
        |    FROM unit) t WHERE rn = 1)
        |SELECT p_partkey, p_name, s_name, unit_cost
        |FROM best
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON best_suppkey = s_suppkey
        |ORDER BY p_partkey""".stripMargin,
    "events_enrich" ->
      """SELECT n_name, event_type, COUNT(*) AS n, round(SUM(value), 2) AS sum_value
        |FROM events
        |JOIN nation ON user_id % 25 = n_nationkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q10_returns" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |         CAST((SUM(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |           * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS HUGEINT))
        |           + 50) // 100 AS BIGINT) / 100.0 AS revenue
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R'
        |    AND o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-04-01'
        |  GROUP BY 1)
        |SELECT c_custkey, c_name, n_name, round(c_acctbal, 2) AS c_acctbal, revenue
        |FROM rev
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,
    "q14_promo" ->
      """WITH s AS (
        |  SELECT
        |    CAST((SUM(CAST(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |           * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
        |      ELSE 0 END AS HUGEINT)) + 50) // 100 AS BIGINT) / 100.0
        |      AS promo_revenue,
        |    CAST((SUM(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |      * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS HUGEINT))
        |      + 50) // 100 AS BIGINT) / 100.0 AS total_revenue
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-09-01'
        |    AND l_shipdate < TIMESTAMP '1997-10-01')
        |SELECT promo_revenue, total_revenue,
        |       floor(100.0 * promo_revenue / total_revenue * 10000 + 0.5) / 10000
        |         AS promo_pct
        |FROM s""".stripMargin,
    "q19_brand" ->
      """SELECT CAST((SUM(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |      * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS HUGEINT))
        |      + 50) // 100 AS BIGINT) / 100.0 AS revenue
        |       , count(*) AS n_rows
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |        AND l_quantity BETWEEN 1.0 AND 11.0)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |        AND l_quantity BETWEEN 10.0 AND 20.0)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
        |        AND l_quantity BETWEEN 20.0 AND 30.0)""".stripMargin,
    "q7_volume" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |       CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |       CAST((SUM(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |      * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS HUGEINT))
        |      + 50) // 100 AS BIGINT) / 100.0 AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE sn.n_name IN ('NATION_1', 'NATION_2')
        |  AND cn.n_name IN ('NATION_1', 'NATION_2')
        |  AND sn.n_name <> cn.n_name
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,
    "q22_prospects" ->
      """WITH cents AS (
        |  SELECT c_custkey, c_nationkey,
        |         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
        |  FROM customer),
        |a AS (SELECT SUM(bal_cents) // COUNT(*) AS avg_cents
        |      FROM cents WHERE bal_cents > 0)
        |SELECT c_nationkey, COUNT(*) AS n_prospects,
        |       CAST(SUM(bal_cents) AS BIGINT) AS total_cents
        |FROM cents, a
        |WHERE bal_cents > avg_cents
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Exact-cents contract (see centsOf in Relational): every sum below
    // is over ⌊x·100+0.5⌋ longs, so thresholds/ratios replay exactly.
    "q8_market_share" ->
      """WITH l AS (
        |  SELECT year(o_orderdate) AS o_year,
        |         CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
        |           AS BIGINT) AS rev_cents,
        |         sn.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  WHERE EXISTS (
        |    SELECT 1 FROM customer c
        |    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |    JOIN region r ON cn.n_regionkey = r.r_regionkey
        |    WHERE c.c_custkey = o_custkey AND r.r_name = 'ASIA'))
        |SELECT o_year,
        |  CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev_cents
        |           ELSE 0 END) AS BIGINT) AS nation_cents,
        |  CAST(SUM(rev_cents) AS BIGINT) AS total_cents,
        |  floor(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev_cents
        |            ELSE 0 END) / SUM(rev_cents) * 10000 + 0.5) / 10000
        |    AS mkt_share
        |FROM l GROUP BY 1 ORDER BY 1""".stripMargin,
    "q9_profit" ->
      """SELECT n_name AS nation,
        |       CAST(year(l_shipdate) AS INTEGER) AS o_year,
        |       CAST(SUM(
        |         CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
        |           AS BIGINT)
        |         - CAST(floor(p_retailprice * l_quantity * 10 + 0.5) AS BIGINT))
        |         AS BIGINT) AS profit_cents
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%gear%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    "q11_important_parts" ->
      """WITH v AS (
        |  SELECT l_partkey AS partkey,
        |         CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |           AS BIGINT) AS value_cents
        |  FROM lineitem
        |  WHERE EXISTS (
        |    SELECT 1 FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |    WHERE s_suppkey = l_suppkey AND n_name = 'NATION_5')
        |  GROUP BY 1),
        |t AS (SELECT SUM(value_cents) AS total_cents FROM v)
        |SELECT partkey, value_cents FROM v, t
        |WHERE value_cents * 10000 > total_cents * 10
        |ORDER BY value_cents DESC, partkey""".stripMargin,
    "q12_shipmode" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q13_order_dist" ->
      """WITH pc AS (
        |  SELECT o_custkey, COUNT(*) AS n FROM orders
        |  WHERE o_orderpriority <> '1-URGENT' GROUP BY 1)
        |SELECT COALESCE(n, 0) AS c_count, COUNT(*) AS custdist
        |FROM customer LEFT JOIN pc ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |         CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100
        |           + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_cents
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_cents = (SELECT MAX(total_cents) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q16_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size,
        |       COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#4' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    // qty < 0.2·avg as the exact integer inequality 5·qty·n < sum.
    "q17_small_qty" ->
      """WITH li AS (
        |  SELECT l_partkey,
        |         CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qty_cents,
        |         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_cents
        |  FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part
        |                      WHERE p_brand = 'Brand#23')),
        |pp AS (
        |  SELECT l_partkey AS pk, SUM(qty_cents) AS sum_qty_cents,
        |         COUNT(*) AS n_lines
        |  FROM li GROUP BY 1)
        |SELECT CAST(COALESCE(SUM(price_cents), 0) // 7 AS BIGINT)
        |         AS avg_yearly_cents,
        |       COUNT(*) AS n_rows
        |FROM li JOIN pp ON l_partkey = pk
        |WHERE qty_cents * 5 * n_lines < sum_qty_cents""".stripMargin,
    "q20_promotion_parts" ->
      """WITH li AS (
        |  SELECT l_partkey, l_suppkey,
        |         CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qty_cents
        |  FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part
        |                      WHERE p_name LIKE '%bolt%')),
        |bs AS (SELECT l_partkey, l_suppkey, SUM(qty_cents) AS supp_cents
        |       FROM li GROUP BY 1, 2),
        |bp AS (SELECT l_partkey AS pk, SUM(qty_cents) AS total_cents
        |       FROM li GROUP BY 1)
        |SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM bs JOIN bp ON l_partkey = pk
        |  WHERE supp_cents * 10 > total_cents * 3)
        |ORDER BY s_suppkey""".stripMargin,
    "q21_waiting" ->
      """WITH ap AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
        |            FROM lineitem),
        |rp AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
        |       FROM lineitem WHERE l_returnflag = 'R'),
        |base AS (
        |  SELECT ok, sk FROM rp
        |  WHERE sk IN (SELECT s_suppkey FROM supplier
        |               JOIN nation ON s_nationkey = n_nationkey
        |               WHERE n_name = 'NATION_2')
        |    AND ok IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'))
        |SELECT b.sk AS s_suppkey, s_name, COUNT(*) AS numwait
        |FROM base b
        |JOIN supplier ON b.sk = s_suppkey
        |WHERE EXISTS (SELECT 1 FROM ap WHERE ap.ok = b.ok AND ap.sk <> b.sk)
        |  AND NOT EXISTS (SELECT 1 FROM rp WHERE rp.ok = b.ok AND rp.sk <> b.sk)
        |GROUP BY 1, 2
        |ORDER BY numwait DESC, s_suppkey""".stripMargin,
    // Grouping-sets cube: every level's measure is the same exact-cents
    // long sum, so detail/subtotal/grand rows all replay bit-identically.
    "q_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |       COALESCE(l_linestatus, 'ALL') AS linestatus,
        |       CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100
        |         + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents,
        |       COUNT(*) AS n_rows
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |       COALESCE(l_linestatus, 'ALL') AS linestatus,
        |       CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100
        |         + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents,
        |       COUNT(*) AS n_rows
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q5_star" ->
      """SELECT n_name,
        |  CAST((SUM(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |      * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS HUGEINT))
        |      + 50) // 100 AS BIGINT) / 100.0 AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    "q_window" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, rn, round(run_qty, 2) AS run_qty
        |FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber,
        |    CAST(row_number() OVER w AS INTEGER) AS rn,
        |    sum(l_quantity) OVER (PARTITION BY l_suppkey
        |      ORDER BY l_shipdate, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_qty
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
        |) t
        |WHERE rn <= 5
        |ORDER BY l_suppkey, rn""".stripMargin,
    "q6_forecast" ->
      """SELECT CAST((SUM(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |      * CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS HUGEINT))
        |      + 50) // 100 AS BIGINT) / 100.0 AS revenue,
        |       count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.04 AND 0.08
        |  AND l_quantity < 30.0""".stripMargin,
    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
        |  FROM lineitem GROUP BY 1 HAVING round(sum(l_quantity), 2) >= 210.0)
        |SELECT c_name, o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |       round(o_totalprice, 2) AS o_totalprice, total_qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, o_orderkey
        |LIMIT 100""".stripMargin,
    "callgraph_bfs" ->
      s"""WITH RECURSIVE $E,
        |s AS (SELECT node FROM (SELECT DISTINCT src AS node FROM e WHERE src % 1000 = 7)
        |   ORDER BY md5(CAST(node AS VARCHAR)) LIMIT 64),
        |down AS (
        |  SELECT node, 0 AS depth FROM s
        |  UNION ALL
        |  SELECT e.dst, down.depth + 1 FROM down JOIN e ON e.src = down.node
        |  WHERE down.depth < 3),
        |up AS (
        |  SELECT node, 0 AS depth FROM s
        |  UNION ALL
        |  SELECT e.src, up.depth + 1 FROM up JOIN e ON e.dst = up.node
        |  WHERE up.depth < 3),
        |dmin AS (SELECT node, MIN(depth) AS depth FROM down GROUP BY node),
        |umin AS (SELECT node, MIN(depth) AS depth FROM up GROUP BY node)
        |SELECT 'down' AS direction, node, depth FROM dmin WHERE depth > 0
        |UNION ALL
        |SELECT 'up' AS direction, node, depth FROM umin WHERE depth > 0
        |ORDER BY direction, node""".stripMargin,
    // Trail semantics (Cypher CALLS*1..k relationship-uniqueness): the
    // recursion carries a |src->dst|-delimited used-edge string and
    // refuses to reuse an edge — same construction as Traversal.walks.
    "call_paths_down" ->
      s"""WITH RECURSIVE $E,
        |s AS (SELECT node FROM (SELECT DISTINCT src AS node FROM e WHERE src % 1000 = 7)
        |   ORDER BY md5(CAST(node AS VARCHAR)) LIMIT 64),
        |w AS (
        |  SELECT node AS start, node AS last, CAST(node AS VARCHAR) AS path,
        |         '' AS offsets, '|' AS eseen, 0 AS depth
        |  FROM s
        |  UNION ALL
        |  SELECT w.start, e.dst, w.path || '->' || CAST(e.dst AS VARCHAR),
        |         CASE WHEN w.offsets = '' THEN CAST(e.call_offset AS VARCHAR)
        |              ELSE w.offsets || ',' || CAST(e.call_offset AS VARCHAR) END,
        |         w.eseen || CAST(e.src AS VARCHAR) || '->' || CAST(e.dst AS VARCHAR) || '|',
        |         w.depth + 1
        |  FROM w JOIN e ON e.src = w.last
        |  WHERE w.depth < 3
        |    AND NOT contains(w.eseen,
        |      '|' || CAST(e.src AS VARCHAR) || '->' || CAST(e.dst AS VARCHAR) || '|'))
        |SELECT start, path, offsets, depth FROM w WHERE depth > 0
        |ORDER BY start, depth, path""".stripMargin,
    "call_chain_up" ->
      s"""WITH RECURSIVE $E,
        |s AS (SELECT node FROM (SELECT DISTINCT dst AS node FROM e WHERE dst % 1000 = 3)
        |   ORDER BY md5(CAST(node AS VARCHAR)) LIMIT 64),
        |w AS (
        |  SELECT node AS start, node AS last, CAST(node AS VARCHAR) AS path,
        |         '' AS offsets, '|' AS eseen, 0 AS depth
        |  FROM s
        |  UNION ALL
        |  SELECT w.start, e.src, w.path || '->' || CAST(e.src AS VARCHAR),
        |         CASE WHEN w.offsets = '' THEN CAST(e.call_offset AS VARCHAR)
        |              ELSE w.offsets || ',' || CAST(e.call_offset AS VARCHAR) END,
        |         w.eseen || CAST(e.dst AS VARCHAR) || '->' || CAST(e.src AS VARCHAR) || '|',
        |         w.depth + 1
        |  FROM w JOIN e ON e.dst = w.last
        |  WHERE w.depth < 3
        |    AND NOT contains(w.eseen,
        |      '|' || CAST(e.dst AS VARCHAR) || '->' || CAST(e.src AS VARCHAR) || '|'))
        |SELECT start, path, offsets, depth FROM w WHERE depth > 0
        |ORDER BY start, depth, path""".stripMargin,
    "call_sequences" ->
      s"""WITH $E,
        |s AS (SELECT node FROM (SELECT DISTINCT src AS node FROM e WHERE src % 1000 = 7)
        |   ORDER BY md5(CAST(node AS VARCHAR)) LIMIT 64)
        |SELECT src AS caller, dst AS callee, call_offset,
        |       CAST(row_number() OVER (PARTITION BY src ORDER BY call_offset, dst) AS INTEGER) AS ord
        |FROM e JOIN s ON e.src = s.node
        |ORDER BY caller, ord""".stripMargin,
    "caller_sequences" ->
      s"""WITH $E,
        |s AS (SELECT node FROM (SELECT DISTINCT dst AS node FROM e WHERE dst % 1000 = 3)
        |   ORDER BY md5(CAST(node AS VARCHAR)) LIMIT 64)
        |SELECT dst AS callee, src AS caller, call_offset,
        |       CAST(row_number() OVER (PARTITION BY dst ORDER BY call_offset, src) AS INTEGER) AS ord
        |FROM e JOIN s ON e.dst = s.node
        |ORDER BY callee, ord""".stripMargin,
    // Indirect cycles under trail semantics: the enumeration carries
    // the used-edge set; the Spark side computes identical counts via
    // walk-count DP + the exact depth-4 a->b->a->b->a correction
    // (Traversal.recursionDp).
    "recursion_detect" ->
      s"""WITH RECURSIVE $E,
        |rs AS (SELECT node FROM (SELECT DISTINCT src AS node FROM e WHERE src % 500 = 7)
        |   ORDER BY md5(CAST(node AS VARCHAR)) LIMIT 64),
        |w AS (
        |  SELECT node AS start, node AS last, '|' AS eseen, 0 AS depth FROM rs
        |  UNION ALL
        |  SELECT w.start, e.dst,
        |         w.eseen || CAST(e.src AS VARCHAR) || '->' || CAST(e.dst AS VARCHAR) || '|',
        |         w.depth + 1
        |  FROM w JOIN e ON e.src = w.last
        |  WHERE w.depth < 4 AND e.src <> e.dst
        |    AND NOT contains(w.eseen,
        |      '|' || CAST(e.src AS VARCHAR) || '->' || CAST(e.dst AS VARCHAR) || '|'))
        |SELECT DISTINCT src AS node, 'Direct' AS call_type, 1 AS depth,
        |       CAST(1 AS BIGINT) AS n_cycles
        |FROM e WHERE src = dst
        |UNION ALL
        |SELECT start AS node, 'Indirect' AS call_type, depth,
        |       COUNT(*) AS n_cycles
        |FROM w WHERE last = start AND depth >= 2 GROUP BY 1, 2, 3
        |ORDER BY call_type, node, depth""".stripMargin,
    "call_freq" ->
      s"""WITH nodemod AS (SELECT $MOD AS v)
        |SELECT l_orderkey % (SELECT v FROM nodemod) AS caller,
        |       l_partkey % (SELECT v FROM nodemod) AS callee,
        |       COUNT(*) AS frequency
        |FROM lineitem
        |WHERE (l_orderkey % (SELECT v FROM nodemod)) % 1000 = 7
        |GROUP BY 1, 2
        |ORDER BY caller, callee""".stripMargin,
    "xrefs" ->
      s"""WITH $E
        |SELECT src AS from_fn, dst AS to_fn, call_offset
        |FROM e WHERE src % 1000 = 5 OR dst % 1000 = 5
        |ORDER BY from_fn, to_fn""".stripMargin,
    "fn_search" ->
      """SELECT p_partkey AS uid, p_name AS name, p_type AS fn_type,
        |       CAST(p_size AS BIGINT) AS size
        |FROM part WHERE p_name LIKE '%gear%'
        |ORDER BY uid LIMIT 100""".stripMargin,
    "binary_info" ->
      """SELECT s_suppkey AS hash, s_name AS filename,
        |       CAST(s_nationkey AS BIGINT) AS arch,
        |       round(s_acctbal, 2) AS file_size
        |FROM supplier WHERE s_name LIKE '%00000004%'
        |ORDER BY hash LIMIT 1""".stripMargin,
    "graph_stats" ->
      s"""WITH $E
        |SELECT
        |  (SELECT COUNT(DISTINCT n) FROM
        |    (SELECT src AS n FROM e UNION ALL SELECT dst FROM e) t) AS n_functions,
        |  (SELECT COUNT(*) FROM e) AS n_calls,
        |  (SELECT COUNT(*) FROM supplier) AS n_binaries,
        |  (SELECT COUNT(*) FROM documents) AS n_strings""".stripMargin,
    "graph_degrees" ->
      s"""WITH $E,
        |dg AS (SELECT src, COUNT(*) AS out_deg FROM e GROUP BY src)
        |SELECT out_deg, COUNT(*) AS n_nodes FROM dg GROUP BY out_deg
        |ORDER BY out_deg""".stripMargin,
    // Degree power-law fit: the zipf regression contract over the C2
    // degree histogram (6dp sums, floor-form 4dp slope/intercept).
    "graph_powerlaw" ->
      s"""WITH $E,
        |dg AS (SELECT src, COUNT(*) AS out_deg FROM e GROUP BY src),
        |h AS (SELECT out_deg, COUNT(*) AS n_nodes FROM dg GROUP BY 1),
        |p AS (SELECT ln(CAST(out_deg AS DOUBLE)) AS x,
        |             ln(CAST(n_nodes AS DOUBLE)) AS y FROM h),
        |s AS (SELECT COUNT(*) AS k,
        |             round(SUM(x), 6) AS sx, round(SUM(y), 6) AS sy,
        |             round(SUM(x * y), 6) AS sxy,
        |             round(SUM(x * x), 6) AS sxx
        |      FROM p),
        |sl AS (
        |  SELECT k, sx, sy,
        |         CASE WHEN k * sxx - sx * sx = 0 THEN 0.0
        |              ELSE floor((k * sxy - sx * sy) / (k * sxx - sx * sx)
        |                   * 10000 + 0.5) / 10000 END AS slope
        |  FROM s)
        |SELECT CAST(k AS BIGINT) AS n_points, slope,
        |       floor((sy - slope * sx) / k * 10000 + 0.5) / 10000 AS intercept
        |FROM sl""".stripMargin,
    // Freeman out-degree centralization: exact integer gap sum over
    // the shared node set, HUGEINT-widened ppm over (n-1)^2.
    "graph_centralization" ->
      s"""WITH $E,
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |odeg AS (SELECT src AS u, CAST(COUNT(*) AS BIGINT) AS dd
        |         FROM e GROUP BY 1),
        |deg AS (SELECT n.node, COALESCE(o.dd, 0) AS d
        |        FROM nodes n LEFT JOIN odeg o ON n.node = o.u),
        |mx AS (SELECT MAX(d) AS dmax, CAST(COUNT(*) AS BIGINT) AS n FROM deg)
        |SELECT n AS n_nodes, dmax AS max_out_deg,
        |       CASE WHEN n < 2 THEN 0
        |            ELSE CAST((1000000::HUGEINT * SUM(dmax - d))
        |                 // ((n - 1) * (n - 1)) AS BIGINT) END
        |         AS centralization_ppm
        |FROM deg, mx GROUP BY n, dmax""".stripMargin,
    "graph_components" ->
      """SELECT CAST(c_custkey + 1000000 AS BIGINT) AS node,
        |       CAST(n_regionkey AS BIGINT) AS component
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |UNION ALL
        |SELECT CAST(s_suppkey + 100000000 AS BIGINT),
        |       CAST(n_regionkey AS BIGINT)
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |UNION ALL
        |SELECT CAST(n_nationkey + 1000 AS BIGINT), CAST(n_regionkey AS BIGINT)
        |FROM nation
        |UNION ALL
        |SELECT CAST(r_regionkey AS BIGINT), CAST(r_regionkey AS BIGINT)
        |FROM region
        |ORDER BY node""".stripMargin,
    // Component-size distribution: sizes over the same ground-truth
    // component mapping, then a histogram of sizes.
    "graph_component_sizes" ->
      """WITH m AS (
        |  SELECT CAST(n_regionkey AS BIGINT) AS component
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  UNION ALL
        |  SELECT CAST(n_regionkey AS BIGINT)
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  UNION ALL
        |  SELECT CAST(n_regionkey AS BIGINT) FROM nation
        |  UNION ALL
        |  SELECT CAST(r_regionkey AS BIGINT) FROM region),
        |per AS (SELECT component, CAST(COUNT(*) AS BIGINT) AS sz
        |        FROM m GROUP BY 1)
        |SELECT sz AS component_size, CAST(COUNT(*) AS BIGINT) AS n_components
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,
    // SCC ground truth is algorithm-independent (scc_id = min
    // mutually-reachable id, self included via cycle membership), so
    // the oracle replays it from a recursive-CTE transitive closure —
    // fine at gate scale, Θ(n·m), NOT the scale path; Spark runs
    // FW-coloring+trim instead (Components.stronglyConnected).
    "graph_scc" ->
      s"""WITH RECURSIVE $E,
        |de AS (SELECT DISTINCT src, dst FROM e),
        |reach(s, t) AS (
        |  SELECT src, dst FROM de
        |  UNION
        |  SELECT r.s, d.dst FROM reach r JOIN de d ON r.t = d.src),
        |nodes AS (SELECT src AS node FROM de UNION SELECT dst FROM de),
        |mut AS (
        |  SELECT a.s AS u, a.t AS v FROM reach a
        |  JOIN reach b ON a.s = b.t AND a.t = b.s)
        |SELECT CAST(n.node AS BIGINT) AS node,
        |       CAST(COALESCE(MIN(m.u), n.node) AS BIGINT) AS scc_id
        |FROM nodes n LEFT JOIN mut m ON m.v = n.node
        |GROUP BY n.node ORDER BY n.node""".stripMargin,
    // Bow-tie: the graph_scc closure CTEs verbatim pick the giant
    // SCC; two depth-bounded recursive BFS cones classify the rest.
    // A (fwd ∩ bwd) non-core node cannot exist (it would be mutually
    // reachable with the core), so the CASE order is semantics-free.
    "graph_bowtie" ->
      s"""WITH RECURSIVE $E,
        |de AS (SELECT DISTINCT src, dst FROM e),
        |reach(s, t) AS (
        |  SELECT src, dst FROM de
        |  UNION
        |  SELECT r.s, d.dst FROM reach r JOIN de d ON r.t = d.src),
        |-- explicit DISTINCT: inside WITH RECURSIVE, DuckDB gives a
        |-- plain `a UNION b` CTE recursive-union semantics and keeps
        |-- duplicates (the scc oracle tolerates that via GROUP BY;
        |-- the 1:1 classification joins below would not)
        |nodes AS (SELECT DISTINCT node FROM
        |  (SELECT src AS node FROM de UNION ALL SELECT dst FROM de)),
        |mut AS (
        |  SELECT a.s AS u, a.t AS v FROM reach a
        |  JOIN reach b ON a.s = b.t AND a.t = b.s),
        |scc AS MATERIALIZED (
        |  SELECT n.node, COALESCE(MIN(m.u), n.node) AS scc_id
        |  FROM nodes n LEFT JOIN mut m ON m.v = n.node
        |  GROUP BY n.node),
        |core AS (
        |  SELECT scc_id FROM (
        |    SELECT scc_id, COUNT(*) AS n FROM scc GROUP BY 1
        |    ORDER BY n DESC, scc_id LIMIT 1)),
        |cn AS MATERIALIZED (
        |  SELECT node FROM scc WHERE scc_id = (SELECT scc_id FROM core)),
        |fwd(node, d) AS (
        |  SELECT node, 0 FROM cn
        |  UNION
        |  SELECT de.dst, f.d + 1 FROM fwd f JOIN de ON de.src = f.node
        |  WHERE f.d < 8),
        |bwd(node, d) AS (
        |  SELECT node, 0 FROM cn
        |  UNION
        |  SELECT de.src, b2.d + 1 FROM bwd b2 JOIN de ON de.dst = b2.node
        |  WHERE b2.d < 8),
        |fw AS (SELECT DISTINCT node FROM fwd),
        |bw AS (SELECT DISTINCT node FROM bwd),
        |cls AS (
        |  SELECT n.node,
        |         CASE WHEN cn.node IS NOT NULL THEN 'core'
        |              WHEN fw.node IS NOT NULL THEN 'out'
        |              WHEN bw.node IS NOT NULL THEN 'in'
        |              ELSE 'other' END AS component
        |  FROM nodes n
        |  LEFT JOIN cn ON n.node = cn.node
        |  LEFT JOIN fw ON n.node = fw.node
        |  LEFT JOIN bw ON n.node = bw.node)
        |SELECT component, CAST(COUNT(*) AS BIGINT) AS n_nodes
        |FROM cls GROUP BY 1 ORDER BY component""".stripMargin,
    "graph_pagerank" ->
      s"""WITH $E,
        |${pageRankCtes(3)}
        |SELECT node, pr AS pagerank_ppm FROM pr3
        |ORDER BY node""".stripMargin,
    "graph_katz" ->
      s"""WITH $E,
        |${katzCtes(3)}
        |SELECT node, k AS katz_ppm FROM k3
        |ORDER BY node""".stripMargin,
    // Rich-club ladder: both counts come from degree histograms, so
    // the ladder joins tiny frames; HUGEINT mirrors DECIMAL(38,0).
    "graph_richclub" ->
      s"""WITH $E,
        |u0 AS MATERIALIZED (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM e WHERE src <> dst),
        |dg AS MATERIALIZED (SELECT n, COUNT(*) AS d FROM
        |  (SELECT a AS n FROM u0 UNION ALL SELECT b FROM u0) t GROUP BY 1),
        |nh AS (SELECT d, COUNT(*) AS nn FROM dg GROUP BY 1),
        |eh AS (
        |  SELECT least(da.d, db.d) AS me, COUNT(*) AS ne
        |  FROM u0 JOIN dg da ON u0.a = da.n JOIN dg db ON u0.b = db.n
        |  GROUP BY 1),
        |ks AS (SELECT unnest([1, 2, 4, 8, 16, 32]) AS k),
        |nk AS (
        |  SELECT k, COALESCE(SUM(nn), 0) AS n_nodes
        |  FROM ks LEFT JOIN nh ON nh.d > ks.k GROUP BY 1),
        |ek AS (
        |  SELECT k, COALESCE(SUM(ne), 0) AS n_edges
        |  FROM ks LEFT JOIN eh ON eh.me > ks.k GROUP BY 1)
        |SELECT CAST(nk.k AS BIGINT) AS k, CAST(n_nodes AS BIGINT) AS n_nodes,
        |       CAST(n_edges AS BIGINT) AS n_edges,
        |       CASE WHEN n_nodes < 2 THEN 0
        |            ELSE CAST((2000000::HUGEINT * n_edges)
        |                 // (n_nodes::HUGEINT * (n_nodes - 1)) AS BIGINT)
        |       END AS phi_ppm
        |FROM nk JOIN ek USING (k) ORDER BY k""".stripMargin,
    // Attribute mixing over the derived binary classes (node % 20):
    // homophily share + chance-corrected assortativity, n²-scaled
    // exact integers through HUGEINT, ppm via the floor(x+0.5)
    // double contract (numerator may be negative).
    "graph_mixing" ->
      s"""WITH $E,
        |ed AS MATERIALIZED (
        |  SELECT DISTINCT src AS x, dst AS y FROM e WHERE src <> dst),
        |bo AS MATERIALIZED (
        |  SELECT x % 20 AS cx, y % 20 AS cy FROM ed
        |  UNION ALL SELECT y % 20, x % 20 FROM ed),
        |tot AS (
        |  SELECT COUNT(*) AS n_ends,
        |         SUM(CASE WHEN cx = cy THEN 1 ELSE 0 END) AS n_same
        |  FROM bo),
        |sq AS (
        |  SELECT SUM(c::HUGEINT * c) AS sum_c2
        |  FROM (SELECT cx, COUNT(*) AS c FROM bo GROUP BY 1) t)
        |SELECT CAST(n_ends AS BIGINT) AS n_ends,
        |       CAST(n_same AS BIGINT) AS n_same,
        |       CAST((1000000::HUGEINT * n_same) // n_ends AS BIGINT)
        |         AS homophily_ppm,
        |       CASE WHEN n_ends::HUGEINT * n_ends - sum_c2 = 0 THEN 0
        |            ELSE CAST(floor(
        |              CAST(n_same::HUGEINT * n_ends - sum_c2 AS DOUBLE)
        |              / CAST(n_ends::HUGEINT * n_ends - sum_c2 AS DOUBLE)
        |              * 1000000 + 0.5) AS BIGINT)
        |       END AS assortativity_ppm
        |FROM tot, sq""".stripMargin,
    // Per-node local clustering: the triangle CTEs are the
    // graph_triangles oracle verbatim, each triangle then fans its
    // three member nodes into a per-node count; HUGEINT mirrors the
    // Spark side's DECIMAL(38,0) ppm (both operands non-negative, so
    // DuckDB's flooring // and Spark's truncating div agree).
    "graph_lcc" ->
      s"""WITH $E,
        |u0 AS MATERIALIZED (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM e WHERE src <> dst),
        |dg AS MATERIALIZED (SELECT n, COUNT(*) AS d FROM
        |  (SELECT a AS n FROM u0 UNION ALL SELECT b FROM u0) t GROUP BY 1),
        |o AS MATERIALIZED (
        |  SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND u0.a < u0.b)
        |              THEN u0.a ELSE u0.b END AS x,
        |         CASE WHEN da.d < db.d OR (da.d = db.d AND u0.a < u0.b)
        |              THEN u0.b ELSE u0.a END AS y
        |  FROM u0 JOIN dg da ON u0.a = da.n JOIN dg db ON u0.b = db.n),
        |tr AS MATERIALIZED (
        |  SELECT e1.x AS x, e1.y AS y, e2.y AS w
        |  FROM o e1 JOIN o e2 ON e1.y = e2.x
        |  JOIN o e3 ON e3.x = e1.x AND e3.y = e2.y),
        |pn AS (SELECT n, COUNT(*) AS tri FROM
        |  (SELECT x AS n FROM tr UNION ALL SELECT y FROM tr
        |   UNION ALL SELECT w FROM tr) t GROUP BY 1)
        |SELECT dg.n AS node, CAST(dg.d AS BIGINT) AS degree,
        |       CAST(COALESCE(pn.tri, 0) AS BIGINT) AS n_tri,
        |       CAST((2000000::HUGEINT * COALESCE(pn.tri, 0))
        |            // (dg.d::HUGEINT * (dg.d - 1)) AS BIGINT) AS lcc_ppm
        |FROM dg LEFT JOIN pn ON dg.n = pn.n
        |WHERE dg.d >= 2 ORDER BY node""".stripMargin,
    // Top-k out-edge sparsifier: the window replay of the partial
    // top-k aggregate (integer weights quantize monotonically, so the
    // (weight desc, dst) orders agree exactly).
    "graph_sparsify" ->
      s"""WITH nodemod AS (SELECT $MOD AS v),
        |ew AS (
        |  SELECT l_orderkey % (SELECT v FROM nodemod) AS src,
        |         l_partkey % (SELECT v FROM nodemod) AS dst,
        |         CAST(COUNT(*) AS BIGINT) AS weight
        |  FROM lineitem GROUP BY 1, 2),
        |st AS (
        |  SELECT src, CAST(COUNT(*) AS BIGINT) AS n_edges,
        |         CAST(SUM(weight) AS BIGINT) AS w_total
        |  FROM ew GROUP BY 1),
        |rk AS (
        |  SELECT src, dst, weight,
        |         CAST(row_number() OVER (PARTITION BY src
        |           ORDER BY weight DESC, dst) AS BIGINT) AS rnk
        |  FROM ew)
        |SELECT rk.src, rk.dst, rk.weight, rk.rnk, st.n_edges, st.w_total
        |FROM rk JOIN st USING (src) WHERE rk.rnk <= 4
        |ORDER BY src, rnk""".stripMargin,
    // Call-frequency-weighted PageRank: the `ew` weights are the
    // per-(caller, callee) call-site counts from the same scan.
    "graph_pagerank_w" ->
      s"""WITH nodemod AS (SELECT $MOD AS v),
        |ew AS (
        |  SELECT l_orderkey % (SELECT v FROM nodemod) AS src,
        |         l_partkey % (SELECT v FROM nodemod) AS dst,
        |         CAST(COUNT(*) AS BIGINT) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |${pageRankWeightedCtes(3)}
        |SELECT node, pr AS wpagerank_ppm FROM pr3
        |ORDER BY node""".stripMargin,
    "graph_triangles" ->
      s"""WITH $E,
        |u0 AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |       FROM e WHERE src <> dst),
        |dg AS (SELECT n, COUNT(*) AS d FROM
        |  (SELECT a AS n FROM u0 UNION ALL SELECT b FROM u0) t GROUP BY 1),
        |o AS (
        |  SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND u0.a < u0.b)
        |              THEN u0.a ELSE u0.b END AS x,
        |         CASE WHEN da.d < db.d OR (da.d = db.d AND u0.a < u0.b)
        |              THEN u0.b ELSE u0.a END AS y
        |  FROM u0 JOIN dg da ON u0.a = da.n JOIN dg db ON u0.b = db.n)
        |SELECT COUNT(*) AS n_triangles
        |FROM o e1
        |JOIN o e2 ON e1.y = e2.x
        |JOIN o e3 ON e3.x = e1.x AND e3.y = e2.y""".stripMargin,
    // Bounded k-core peeling, 8 unrolled rounds. The round CTEs are
    // MATERIALIZED: each ed{r} is referenced three times (degree agg +
    // both endpoint filters), and DuckDB's default CTE inlining would
    // otherwise blow up exponentially across rounds.
    "graph_kcore" -> {
      val rounds = (0 until 8).map { r =>
        s"""s$r AS MATERIALIZED (
           |  SELECT u FROM (SELECT u, COUNT(*) AS deg FROM ed$r GROUP BY 1)
           |  WHERE deg >= 5),
           |ed${r + 1} AS MATERIALIZED (
           |  SELECT e.u, e.v FROM ed$r e
           |  JOIN s$r x ON e.u = x.u JOIN s$r y ON e.v = y.u)""".stripMargin
      }.mkString(",\n")
      s"""WITH $E,
         |und AS MATERIALIZED (
         |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM e WHERE src <> dst),
         |ed0 AS MATERIALIZED (
         |  SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und),
         |$rounds
         |SELECT u AS node, COUNT(*) AS core_deg FROM ed8 GROUP BY 1
         |ORDER BY node""".stripMargin
    },
    "graph_sssp" ->
      s"""WITH $E,
        |s AS (SELECT node FROM (SELECT DISTINCT src AS node FROM e WHERE src % 1000 = 7)
        |   ORDER BY md5(CAST(node AS VARCHAR)) LIMIT 64),
        |d0 AS (SELECT node, CAST(0 AS BIGINT) AS dist FROM s),
        |${ssspCtes(4)}
        |SELECT node, dist FROM d4 ORDER BY node""".stripMargin,
    "graph_walks_biased" ->
      s"""WITH $E,
        |b0 AS (SELECT DISTINCT src AS walk_id, CAST(0 AS BIGINT) AS step,
        |         CAST(NULL AS BIGINT) AS prev, src AS node
        |       FROM e WHERE src % 50 = 1),
        |${walkBiasCtes(6, 1, 2, 4)}
        |SELECT walk_id, step, node FROM (
        |  SELECT walk_id, step, node FROM b0
        |  UNION ALL SELECT walk_id, step, node FROM b1
        |  UNION ALL SELECT walk_id, step, node FROM b2
        |  UNION ALL SELECT walk_id, step, node FROM b3
        |  UNION ALL SELECT walk_id, step, node FROM b4
        |  UNION ALL SELECT walk_id, step, node FROM b5
        |  UNION ALL SELECT walk_id, step, node FROM b6) u
        |ORDER BY walk_id, step""".stripMargin,
    "graph_walks" ->
      s"""WITH $E,
        |w0 AS (SELECT DISTINCT src AS walk_id, CAST(0 AS BIGINT) AS step,
        |         src AS node FROM e WHERE src % 50 = 1),
        |${walkCtes(6)}
        |SELECT walk_id, step, node FROM (
        |  SELECT * FROM w0 UNION ALL SELECT * FROM w1 UNION ALL
        |  SELECT * FROM w2 UNION ALL SELECT * FROM w3 UNION ALL
        |  SELECT * FROM w4 UNION ALL SELECT * FROM w5 UNION ALL
        |  SELECT * FROM w6) u
        |ORDER BY walk_id, step""".stripMargin,
    "graph_ppr" ->
      s"""WITH $E,
        |${pprCtes(3)}
        |SELECT node, pr AS ppr_ppm FROM pr3 WHERE pr > 0
        |ORDER BY node""".stripMargin,
    "graph_ppr_batch" ->
      s"""WITH $E,
        |${pprBatchCtes(3)}
        |SELECT s AS seed, node, pr AS ppr_ppm FROM b3
        |ORDER BY seed, node""".stripMargin,
    // Bounded mutual reachability (each reaches the other within ≤2
    // hops) is checked over DISTINCT walk states — pruned BFS and the
    // walk closure agree on the reachable SET because a shortest
    // path never revisits a node; self-re-reach is excluded on both
    // sides (Direct recursion is B8's bucket, not a mutual pair).
    "recursion_groups" ->
      s"""WITH RECURSIVE $E,
        |sc AS (SELECT DISTINCT src AS node FROM e WHERE src % 50 = 7),
        |r AS (
        |  SELECT node AS start, node AS cur, 0 AS depth FROM sc
        |  UNION
        |  SELECT r.start, e.dst, r.depth + 1 FROM r JOIN e ON e.src = r.cur
        |  WHERE r.depth < 2),
        |reach AS (
        |  SELECT DISTINCT r.start, r.cur FROM r JOIN sc ON r.cur = sc.node
        |  WHERE r.depth > 0 AND r.cur <> r.start),
        |mp AS (
        |  SELECT f.start AS a, f.cur AS b
        |  FROM reach f JOIN reach b2 ON f.start = b2.cur AND f.cur = b2.start
        |  WHERE f.start < f.cur),
        |und AS MATERIALIZED (SELECT a, b FROM mp UNION SELECT b, a FROM mp),
        |l0 AS (SELECT DISTINCT a AS node, a AS component FROM und),
        |${labelRoundCtes(12)},
        |sz AS (SELECT component, COUNT(*) AS group_size FROM l12 GROUP BY 1)
        |SELECT l.node, l.component AS group_id, sz.group_size
        |FROM l12 l JOIN sz USING (component) ORDER BY node""".stripMargin,
    // J ≥ 1/5 as the exact integer inequality 5·shared ≥ union; the
    // output jaccard is the floor-form 4dp rounding of one IEEE
    // divide (identical doubles both engines).
    "graph_neighbor_sim" ->
      s"""WITH $E,
        |ind AS (SELECT dst, COUNT(*) AS indeg FROM e GROUP BY 1),
        |capped AS (
        |  SELECT e.src, e.dst FROM e JOIN ind ON e.dst = ind.dst
        |  WHERE ind.indeg <= 100),
        |sizes AS (SELECT src, COUNT(*) AS deg FROM capped GROUP BY 1),
        |sh AS (
        |  SELECT x.src AS fn_a, y.src AS fn_b, COUNT(*) AS shared
        |  FROM capped x JOIN capped y ON x.dst = y.dst AND x.src < y.src
        |  GROUP BY 1, 2)
        |SELECT fn_a, fn_b, shared,
        |       sa.deg + sb.deg - shared AS union_size,
        |       floor(shared / (sa.deg + sb.deg - shared) * 10000 + 0.5) / 10000
        |         AS jaccard
        |FROM sh JOIN sizes sa ON fn_a = sa.src JOIN sizes sb ON fn_b = sb.src
        |WHERE shared * 5 >= (sa.deg + sb.deg - shared) * 1
        |ORDER BY fn_a, fn_b""".stripMargin,
    // Exact d=2 neighborhood function. reachWithin seeds (start,start)
    // into visited, so self-re-reach via a cycle is excluded — the
    // oracle's node <> start mirrors that.
    "graph_anf" ->
      s"""WITH $E,
        |st AS (SELECT DISTINCT src FROM e WHERE src % 10 = 3),
        |p1 AS (SELECT DISTINCT e.src AS start, e.dst AS node
        |       FROM e JOIN st USING (src)),
        |p2 AS (SELECT DISTINCT p1.start, e.dst AS node
        |       FROM p1 JOIN e ON e.src = p1.node),
        |reach AS (SELECT start, node FROM (
        |  SELECT * FROM p1 UNION SELECT * FROM p2) u WHERE node <> start)
        |SELECT start AS node, COUNT(*) AS n_reach
        |FROM reach GROUP BY 1 ORDER BY 1""".stripMargin,
    // full-outer edge merge → caller-keyed 0/1 sums; jaccard is one
    // floor-form divide over exact integer counts.
    "graph_diff" ->
      s"""WITH $E,
        |e2 AS (
        |  SELECT DISTINCT l_orderkey % (SELECT v FROM nodemod) AS src,
        |                  l_partkey % (SELECT v FROM nodemod) AS dst
        |  FROM lineitem WHERE l_linenumber >= 2),
        |m AS (
        |  SELECT COALESCE(e.src, e2.src) AS src,
        |         CASE WHEN e.src IS NOT NULL THEN 1 ELSE 0 END AS b,
        |         CASE WHEN e2.src IS NOT NULL THEN 1 ELSE 0 END AS a
        |  FROM (SELECT DISTINCT src, dst FROM e) e
        |  FULL OUTER JOIN e2 ON e.src = e2.src AND e.dst = e2.dst),
        |g AS (
        |  SELECT src AS node,
        |         CAST(SUM(b * a) AS BIGINT) AS n_kept,
        |         CAST(SUM((1 - b) * a) AS BIGINT) AS n_added,
        |         CAST(SUM(b * (1 - a)) AS BIGINT) AS n_removed
        |  FROM m GROUP BY 1)
        |SELECT node, n_kept, n_added, n_removed,
        |       floor(n_kept / (n_kept + n_added + n_removed) * 10000 + 0.5) / 10000
        |         AS callee_jaccard
        |FROM g WHERE n_added + n_removed > 0
        |ORDER BY node""".stripMargin,
    "graph_betweenness" ->
      s"""WITH $E,
        |${betweennessCtes(3)}
        |SELECT v AS node, CAST(SUM(delta) AS BIGINT) AS betweenness_ppm
        |FROM alldelta WHERE s <> v
        |GROUP BY 1 HAVING SUM(delta) > 0
        |ORDER BY node""".stripMargin,
    // Synchronous plurality-LPA, 4 unrolled rounds; und is symmetric
    // and self-loop-free, so every node has ≥1 neighbor and each
    // round's argmax covers all nodes (no carry join needed).
    "graph_communities" ->
      s"""WITH $E,
        |und AS MATERIALIZED (SELECT a, b FROM (
        |  SELECT src AS a, dst AS b FROM e
        |  UNION
        |  SELECT dst AS a, src AS b FROM e) u WHERE a <> b),
        |l0 AS (SELECT DISTINCT a AS node, a AS lab FROM und),
        |${lpaCtes(4)}
        |SELECT node, lab AS community FROM l4 ORDER BY node""".stripMargin,
    // Seeded spread: seeds clamped each round, non-seeds take the
    // plurality vote; labels are monotone so no carry branch exists.
    "graph_labelspread" ->
      s"""WITH $E,
        |und AS MATERIALIZED (SELECT a, b FROM (
        |  SELECT src AS a, dst AS b FROM e
        |  UNION
        |  SELECT dst AS a, src AS b FROM e) u WHERE a <> b),
        |seeds AS MATERIALIZED (
        |  -- seed universe = ALL graph nodes (incl. self-loop-only
        |  -- ones und drops), mirroring the Spark entry's node frame
        |  SELECT node, node % 5 AS lab FROM (
        |    SELECT DISTINCT n AS node FROM
        |      (SELECT src AS n FROM e UNION ALL SELECT dst FROM e) t
        |  ) n WHERE node % 50 = 0),
        |l0 AS (SELECT node, lab FROM seeds),
        |${spreadCtes(3)}
        |SELECT node, lab AS label FROM l3 ORDER BY node""".stripMargin,
    // Modularity of the LPA partition: per-community floored ppm terms
    // (10^6*m_in)//m and (10^6*d_c^2)//(4m^2) summed — the Spark side
    // floors identically, so Q matches bit-for-bit.
    "graph_modularity" ->
      s"""WITH $E,
        |und AS MATERIALIZED (SELECT a, b FROM (
        |  SELECT src AS a, dst AS b FROM e
        |  UNION
        |  SELECT dst AS a, src AS b FROM e) u WHERE a <> b),
        |l0 AS (SELECT DISTINCT a AS node, a AS lab FROM und),
        |${lpaCtes(4)},
        |ue AS MATERIALIZED (
        |  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        |  FROM e WHERE src <> dst),
        |mm AS (SELECT COUNT(*) AS m FROM ue),
        |dg AS (SELECT node, COUNT(*) AS d FROM (
        |  SELECT a AS node FROM ue UNION ALL SELECT b FROM ue) t GROUP BY 1),
        |dcm AS (SELECT l.lab AS community, SUM(dg.d) AS d_c
        |  FROM l4 l JOIN dg ON dg.node = l.node GROUP BY 1),
        |mi AS (SELECT la.lab AS community, COUNT(*) AS m_in
        |  FROM ue JOIN l4 la ON la.node = ue.a JOIN l4 lb ON lb.node = ue.b
        |  WHERE la.lab = lb.lab GROUP BY 1),
        |per AS (SELECT dcm.community, COALESCE(mi.m_in, 0) AS m_in, dcm.d_c
        |  FROM dcm LEFT JOIN mi USING (community))
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,
        |       CAST(COALESCE(MAX(mm.m), 0) AS BIGINT) AS m_edges,
        |       CAST(COALESCE(SUM((1000000::HUGEINT * m_in) // mm.m)
        |         - SUM((1000000::HUGEINT * d_c * d_c) // (4::HUGEINT * mm.m * mm.m)),
        |         0) AS BIGINT) AS q_ppm
        |FROM per, mm""".stripMargin,
    // Unrolled first-touch BFS levels (the reachLevels contract): each
    // p{t} is the depth-t frontier minus everything already seen, so a
    // pair's level IS its min depth; closeness is exact integer ppm.
    "graph_closeness" ->
      s"""WITH $E,
        |st AS (SELECT s FROM (SELECT DISTINCT src AS s FROM e WHERE src % 100 = 3)
        |      ORDER BY md5(CAST(s AS VARCHAR)) LIMIT 64),
        |v0 AS MATERIALIZED (SELECT s, s AS node FROM st),
        |p1 AS MATERIALIZED (
        |  SELECT DISTINCT st.s, e.dst AS node
        |  FROM st JOIN e ON e.src = st.s WHERE e.dst <> st.s),
        |v1 AS MATERIALIZED (SELECT * FROM v0 UNION SELECT * FROM p1),
        |p2 AS MATERIALIZED (
        |  SELECT DISTINCT p1.s, e.dst AS node
        |  FROM p1 JOIN e ON e.src = p1.node
        |  LEFT JOIN v1 ON v1.s = p1.s AND v1.node = e.dst
        |  WHERE v1.node IS NULL),
        |v2 AS MATERIALIZED (SELECT * FROM v1 UNION SELECT * FROM p2),
        |p3 AS MATERIALIZED (
        |  SELECT DISTINCT p2.s, e.dst AS node
        |  FROM p2 JOIN e ON e.src = p2.node
        |  LEFT JOIN v2 ON v2.s = p2.s AND v2.node = e.dst
        |  WHERE v2.node IS NULL),
        |reach AS (
        |  SELECT s, node, 1 AS depth FROM p1
        |  UNION ALL SELECT s, node, 2 FROM p2
        |  UNION ALL SELECT s, node, 3 FROM p3)
        |SELECT s AS node, COUNT(*) AS n_reach,
        |       CAST(SUM(depth) AS BIGINT) AS sum_dist,
        |       (1000000 * COUNT(*)) // CAST(SUM(depth) AS BIGINT)
        |         AS closeness_ppm
        |FROM reach GROUP BY 1 ORDER BY 1""".stripMargin,
    // Neighborhood-function ladder: the graph_closeness first-touch
    // level chain collapsed to a per-depth histogram + cumulative.
    "graph_effdiam" ->
      s"""WITH $E,
        |st AS (SELECT s FROM (SELECT DISTINCT src AS s FROM e WHERE src % 100 = 3)
        |      ORDER BY md5(CAST(s AS VARCHAR)) LIMIT 64),
        |v0 AS MATERIALIZED (SELECT s, s AS node FROM st),
        |p1 AS MATERIALIZED (
        |  SELECT DISTINCT st.s, e.dst AS node
        |  FROM st JOIN e ON e.src = st.s WHERE e.dst <> st.s),
        |v1 AS MATERIALIZED (SELECT * FROM v0 UNION SELECT * FROM p1),
        |p2 AS MATERIALIZED (
        |  SELECT DISTINCT p1.s, e.dst AS node
        |  FROM p1 JOIN e ON e.src = p1.node
        |  LEFT JOIN v1 ON v1.s = p1.s AND v1.node = e.dst
        |  WHERE v1.node IS NULL),
        |v2 AS MATERIALIZED (SELECT * FROM v1 UNION SELECT * FROM p2),
        |p3 AS MATERIALIZED (
        |  SELECT DISTINCT p2.s, e.dst AS node
        |  FROM p2 JOIN e ON e.src = p2.node
        |  LEFT JOIN v2 ON v2.s = p2.s AND v2.node = e.dst
        |  WHERE v2.node IS NULL),
        |reach AS (
        |  SELECT s, node, 1 AS depth FROM p1
        |  UNION ALL SELECT s, node, 2 FROM p2
        |  UNION ALL SELECT s, node, 3 FROM p3),
        |byd AS (
        |  SELECT CAST(depth AS BIGINT) AS depth,
        |         CAST(COUNT(*) AS BIGINT) AS n_pairs
        |  FROM reach GROUP BY 1),
        |tot AS (SELECT COALESCE(SUM(n_pairs), 0) AS t FROM byd)
        |SELECT depth, n_pairs,
        |       CAST(SUM(n_pairs) OVER (ORDER BY depth) AS BIGINT) AS cum_pairs,
        |       CASE WHEN tot.t = 0 THEN 0
        |            ELSE CAST((1000000::HUGEINT *
        |                       SUM(n_pairs) OVER (ORDER BY depth)) // tot.t
        |                 AS BIGINT) END AS cum_ppm
        |FROM byd, tot ORDER BY depth""".stripMargin,
    // Bounded eccentricity over the 1-in-100 sample at slice 9: the
    // graph_closeness first-touch level chain with MAX(depth) + ball
    // size as the aggregate.
    "graph_ecc" ->
      s"""WITH $E,
        |st AS (SELECT s FROM (SELECT DISTINCT src AS s FROM e WHERE src % 100 = 9)
        |      ORDER BY md5(CAST(s AS VARCHAR)) LIMIT 64),
        |v0 AS MATERIALIZED (SELECT s, s AS node FROM st),
        |p1 AS MATERIALIZED (
        |  SELECT DISTINCT st.s, e.dst AS node
        |  FROM st JOIN e ON e.src = st.s WHERE e.dst <> st.s),
        |v1 AS MATERIALIZED (SELECT * FROM v0 UNION SELECT * FROM p1),
        |p2 AS MATERIALIZED (
        |  SELECT DISTINCT p1.s, e.dst AS node
        |  FROM p1 JOIN e ON e.src = p1.node
        |  LEFT JOIN v1 ON v1.s = p1.s AND v1.node = e.dst
        |  WHERE v1.node IS NULL),
        |v2 AS MATERIALIZED (SELECT * FROM v1 UNION SELECT * FROM p2),
        |p3 AS MATERIALIZED (
        |  SELECT DISTINCT p2.s, e.dst AS node
        |  FROM p2 JOIN e ON e.src = p2.node
        |  LEFT JOIN v2 ON v2.s = p2.s AND v2.node = e.dst
        |  WHERE v2.node IS NULL),
        |reach AS (
        |  SELECT s, node, 1 AS depth FROM p1
        |  UNION ALL SELECT s, node, 2 FROM p2
        |  UNION ALL SELECT s, node, 3 FROM p3)
        |SELECT s AS node, CAST(MAX(depth) AS BIGINT) AS ecc_bounded,
        |       COUNT(*) AS n_reached
        |FROM reach GROUP BY 1 ORDER BY 1""".stripMargin,
    // Gini over per-customer revenue: ascending (cents, custkey) rank,
    // G = (2*Σ i*x - (n+1)*Σx) * 1e6 // (n*Σx) — all HUGEINT, the
    // Spark side widens to DECIMAL(38,0) identically.
    "q_gini" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |         CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |           AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |r AS (SELECT x, row_number() OVER (ORDER BY x, o_custkey) AS i FROM per)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
        |       CAST(SUM(x) AS BIGINT) AS total_cents,
        |       CAST((2::HUGEINT * SUM(i::HUGEINT * x)
        |           - (COUNT(*) + 1) * SUM(x::HUGEINT)) * 1000000
        |         // (COUNT(*)::HUGEINT * SUM(x::HUGEINT)) AS BIGINT)
        |         AS gini_ppm
        |FROM r""".stripMargin,
    // Harmonic centrality over the 1-in-100 sample at slice 7: the
    // graph_closeness first-touch level chain (p1/p2/p3 minus seen)
    // with the final aggregate Σ ⌊10⁶/depth⌋ — exact integer terms.
    "graph_harmonic" ->
      s"""WITH $E,
        |st AS (SELECT s FROM (SELECT DISTINCT src AS s FROM e WHERE src % 100 = 7)
        |      ORDER BY md5(CAST(s AS VARCHAR)) LIMIT 64),
        |v0 AS MATERIALIZED (SELECT s, s AS node FROM st),
        |p1 AS MATERIALIZED (
        |  SELECT DISTINCT st.s, e.dst AS node
        |  FROM st JOIN e ON e.src = st.s WHERE e.dst <> st.s),
        |v1 AS MATERIALIZED (SELECT * FROM v0 UNION SELECT * FROM p1),
        |p2 AS MATERIALIZED (
        |  SELECT DISTINCT p1.s, e.dst AS node
        |  FROM p1 JOIN e ON e.src = p1.node
        |  LEFT JOIN v1 ON v1.s = p1.s AND v1.node = e.dst
        |  WHERE v1.node IS NULL),
        |v2 AS MATERIALIZED (SELECT * FROM v1 UNION SELECT * FROM p2),
        |p3 AS MATERIALIZED (
        |  SELECT DISTINCT p2.s, e.dst AS node
        |  FROM p2 JOIN e ON e.src = p2.node
        |  LEFT JOIN v2 ON v2.s = p2.s AND v2.node = e.dst
        |  WHERE v2.node IS NULL),
        |reach AS (
        |  SELECT s, node, 1 AS depth FROM p1
        |  UNION ALL SELECT s, node, 2 FROM p2
        |  UNION ALL SELECT s, node, 3 FROM p3)
        |SELECT s AS node, COUNT(*) AS n_reach,
        |       CAST(SUM(1000000 // depth) AS BIGINT) AS harmonic_ppm
        |FROM reach GROUP BY 1 ORDER BY 1""".stripMargin,
    "graph_hits" ->
      s"""WITH $E,
        |${hitsCtes(2)}
        |SELECT node, h AS hub_ppm, a AS auth_ppm FROM s2
        |ORDER BY node""".stripMargin,
    "graph_eigen" ->
      s"""WITH $E,
        |${eigenCtes(3)}
        |SELECT node, x AS eigen_ppm FROM x3
        |ORDER BY node""".stripMargin,
    "graph_reciprocity" ->
      s"""WITH $E,
        |ed AS MATERIALIZED (
        |  SELECT DISTINCT src, dst FROM e WHERE src <> dst),
        |mp AS (
        |  SELECT COUNT(*) AS n_mutual_pairs
        |  FROM ed x JOIN ed y ON x.src = y.dst AND x.dst = y.src
        |  WHERE x.src < x.dst),
        |tot AS (SELECT COUNT(*) AS n_edges FROM ed)
        |SELECT n_edges, n_mutual_pairs,
        |       (2000000 * n_mutual_pairs) // n_edges AS reciprocity_ppm
        |FROM tot, mp""".stripMargin,
    // 3·triangles/wedges: the triangle CTEs are the graph_triangles
    // chain verbatim; wedges are the closed form Σ d(d−1)/2.
    "graph_clustering" ->
      s"""WITH $E,
        |u0 AS MATERIALIZED (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM e WHERE src <> dst),
        |dg AS MATERIALIZED (SELECT n, COUNT(*) AS d FROM
        |  (SELECT a AS n FROM u0 UNION ALL SELECT b FROM u0) t GROUP BY 1),
        |o AS (
        |  SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND u0.a < u0.b)
        |              THEN u0.a ELSE u0.b END AS x,
        |         CASE WHEN da.d < db.d OR (da.d = db.d AND u0.a < u0.b)
        |              THEN u0.b ELSE u0.a END AS y
        |  FROM u0 JOIN dg da ON u0.a = da.n JOIN dg db ON u0.b = db.n),
        |tri AS (
        |  SELECT COUNT(*) AS n_triangles
        |  FROM o e1 JOIN o e2 ON e1.y = e2.x
        |  JOIN o e3 ON e3.x = e1.x AND e3.y = e2.y),
        |wg AS (SELECT CAST(SUM(d * (d - 1)) // 2 AS BIGINT) AS n_wedges FROM dg)
        |SELECT n_triangles, n_wedges,
        |       CASE WHEN n_wedges = 0 THEN 0
        |            ELSE (3000000 * n_triangles) // n_wedges END AS clustering_ppm
        |FROM tri, wg""".stripMargin,
    // Newman assortativity with both orientations sampled: identical
    // marginals ⇒ r = (nΣxy−(Σx)²)/(nΣx²−(Σx)²), exact longs, one
    // floor-form 6dp divide at the end.
    "graph_assortativity" ->
      s"""WITH $E,
        |u0 AS MATERIALIZED (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM e WHERE src <> dst),
        |dg AS MATERIALIZED (SELECT n, COUNT(*) AS d FROM
        |  (SELECT a AS n FROM u0 UNION ALL SELECT b FROM u0) t GROUP BY 1),
        |ends AS (
        |  SELECT da.d AS x, db.d AS y FROM u0
        |  JOIN dg da ON u0.a = da.n JOIN dg db ON u0.b = db.n),
        |bo AS (SELECT x, y FROM ends UNION ALL SELECT y, x FROM ends),
        |s AS (
        |  SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx,
        |         CAST(SUM(x * x) AS BIGINT) AS sxx,
        |         CAST(SUM(x * y) AS BIGINT) AS sxy
        |  FROM bo)
        |SELECT n AS n_ends,
        |       CAST(n * sxy - sx * sx AS BIGINT) AS num,
        |       CAST(n * sxx - sx * sx AS BIGINT) AS den,
        |       CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
        |            ELSE floor(CAST(n * sxy - sx * sx AS DOUBLE)
        |                 / CAST(n * sxx - sx * sx AS DOUBLE) * 1000000 + 0.5)
        |                 / 1000000 END AS assortativity
        |FROM s""".stripMargin,
    // Average-neighbor-degree curve: the assortativity end frame
    // grouped by degree instead of folded into moments.
    "graph_knn_degree" ->
      s"""WITH $E,
        |u0 AS MATERIALIZED (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM e WHERE src <> dst),
        |dg AS MATERIALIZED (SELECT n, COUNT(*) AS d FROM
        |  (SELECT a AS n FROM u0 UNION ALL SELECT b FROM u0) t GROUP BY 1),
        |ends AS (
        |  SELECT da.d AS x, db.d AS y FROM u0
        |  JOIN dg da ON u0.a = da.n JOIN dg db ON u0.b = db.n),
        |bo AS (SELECT x, y FROM ends UNION ALL SELECT y, x FROM ends)
        |SELECT x AS degree, CAST(COUNT(*) AS BIGINT) AS n_ends,
        |       CAST((1000000::HUGEINT * SUM(y)) // COUNT(*) AS BIGINT)
        |         AS knn_ppm
        |FROM bo GROUP BY 1 ORDER BY 1""".stripMargin,
    // Directed triad census: the shared 2-path frame closed twice —
    // ordered feed-forward triples, min-node-anchored 3-cycles.
    "graph_motifs" ->
      s"""WITH $E,
        |ed AS MATERIALIZED (
        |  SELECT DISTINCT src AS s, dst AS t FROM e WHERE src <> dst),
        |p AS MATERIALIZED (
        |  SELECT e1.s AS a, e1.t AS b, e2.t AS c
        |  FROM ed e1 JOIN ed e2 ON e1.t = e2.s WHERE e1.s <> e2.t),
        |ffl AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_feedforward
        |  FROM p JOIN ed e3 ON p.a = e3.s AND p.c = e3.t),
        |cyc AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_cycles
        |  FROM p JOIN ed e3 ON p.c = e3.s AND p.a = e3.t
        |  WHERE p.a < p.b AND p.a < p.c)
        |SELECT * FROM ffl CROSS JOIN cyc""".stripMargin,
    // Time-respecting 2-hop paths: offset strictly increases along
    // the path, three distinct nodes.
    "graph_temporal" ->
      s"""WITH $E,
        |ed AS MATERIALIZED (
        |  SELECT src, dst, call_offset FROM e WHERE src <> dst),
        |p AS (
        |  SELECT e1.src AS a, e2.dst AS c
        |  FROM ed e1 JOIN ed e2 ON e1.dst = e2.src
        |  WHERE e2.call_offset > e1.call_offset
        |    AND e2.dst <> e1.src AND e2.dst <> e1.dst)
        |SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS n_paths,
        |       CAST(COUNT(DISTINCT c) AS BIGINT) AS n_reached
        |FROM p GROUP BY 1 ORDER BY node""".stripMargin,
    // Bipartite co-occurrence projection with the frequent-item cap:
    // parts held by > 30 suppliers never enter the pair join.
    "graph_cosupply" ->
      """WITH sp AS (
        |  SELECT DISTINCT l_suppkey AS entity, l_partkey AS item FROM lineitem),
        |keep AS (SELECT item FROM sp GROUP BY 1 HAVING COUNT(*) <= 30),
        |k AS (SELECT sp.entity, sp.item FROM sp JOIN keep USING (item))
        |SELECT k1.entity AS a, k2.entity AS b,
        |       CAST(COUNT(*) AS BIGINT) AS n_shared
        |FROM k k1 JOIN k k2 ON k1.item = k2.item AND k1.entity < k2.entity
        |GROUP BY 1, 2 ORDER BY a, b""".stripMargin,
    // Summary twin: the (n_shared -> n_pairs) histogram of the same
    // capped projection — no pair-list materialization in the output.
    "graph_cosupply_stats" ->
      """WITH sp AS (
        |  SELECT DISTINCT l_suppkey AS entity, l_partkey AS item FROM lineitem),
        |keep AS (SELECT item FROM sp GROUP BY 1 HAVING COUNT(*) <= 30),
        |k AS (SELECT sp.entity, sp.item FROM sp JOIN keep USING (item)),
        |p AS (
        |  SELECT k1.entity AS a, k2.entity AS b, COUNT(*) AS n_shared
        |  FROM k k1 JOIN k k2 ON k1.item = k2.item AND k1.entity < k2.entity
        |  GROUP BY 1, 2)
        |SELECT n_shared, CAST(COUNT(*) AS BIGINT) AS n_pairs
        |FROM p GROUP BY 1 ORDER BY n_shared""".stripMargin,
    // 4-truss: 6 unrolled peel rounds (support = common-neighbor
    // count, edges below k−2=2 dropped), then the final supports over
    // the surviving set. Peeling is monotone, so fixpoint rounds are
    // no-ops and early Spark convergence equals the full unroll.
    "graph_ktruss" -> {
      val rounds = (0 until 6).map { r =>
        s"""sym$r AS MATERIALIZED (
           |  SELECT a AS u, b AS v FROM und$r UNION ALL SELECT b, a FROM und$r),
           |sup$r AS MATERIALIZED (
           |  SELECT u.a, u.b, COUNT(*) AS s FROM und$r u
           |  JOIN sym$r x ON x.u = u.a
           |  JOIN sym$r y ON y.u = u.b AND y.v = x.v
           |  GROUP BY 1, 2),
           |und${r + 1} AS MATERIALIZED (SELECT a, b FROM sup$r WHERE s >= 2)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH $E,
         |und0 AS MATERIALIZED (
         |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM e WHERE src <> dst),
         |$rounds,
         |symf AS (SELECT a AS u, b AS v FROM und6 UNION ALL SELECT b, a FROM und6)
         |-- LEFT joins + COUNT(y.v): a surviving edge with no common
         |-- neighbor reports support 0 (Spark's empty array_intersect),
         |-- it does not vanish from the output
         |SELECT u.a, u.b, CAST(COUNT(y.v) AS BIGINT) AS support
         |FROM und6 u
         |LEFT JOIN symf x ON x.u = u.a
         |LEFT JOIN symf y ON y.u = u.b AND y.v = x.v
         |GROUP BY 1, 2 ORDER BY a, b""".stripMargin
    },
    // Coreness: one unrolled bounded peel chain per k (2..6), nodes
    // keep the largest k whose chain retains them; edge-owning nodes
    // outside the 2-core report 1. Chains are NESTED exactly like the
    // Spark side (Ranking.coreness): the k-chain starts from the
    // (k−1)-chain's round-8 survivors, not the full graph — the two
    // formulations replay the identical bounded recursion even when a
    // chain's cascade would need more than 8 rounds from scratch.
    "graph_coreness" -> {
      val chains = (2 to 6).map { k =>
        val rounds = (0 until 8).map { r =>
          s"""s${r}_$k AS MATERIALIZED (
             |  SELECT u FROM (SELECT u, COUNT(*) AS deg FROM ed${r}_$k GROUP BY 1)
             |  WHERE deg >= $k),
             |ed${r + 1}_$k AS MATERIALIZED (
             |  SELECT e.u, e.v FROM ed${r}_$k e
             |  JOIN s${r}_$k x ON e.u = x.u JOIN s${r}_$k y ON e.v = y.u)"""
            .stripMargin
        }.mkString(",\n")
        val start = if (k == 2) "ed0" else s"ed8_${k - 1}"
        s"ed0_$k AS (SELECT u, v FROM $start),\n$rounds"
      }.mkString(",\n")
      val union = (2 to 6).map(k =>
        s"SELECT DISTINCT u AS node, $k AS k FROM ed8_$k").mkString("\n  UNION ALL ")
      s"""WITH $E,
         |und AS MATERIALIZED (
         |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM e WHERE src <> dst),
         |ed0 AS MATERIALIZED (
         |  SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und),
         |$chains,
         |cores AS (
         |  $union),
         |mx AS (SELECT node, MAX(k) AS coreness FROM cores GROUP BY 1),
         |nodes AS (SELECT DISTINCT u AS node FROM ed0)
         |SELECT n.node, CAST(COALESCE(mx.coreness, 1) AS BIGINT) AS coreness
         |FROM nodes n LEFT JOIN mx ON n.node = mx.node
         |ORDER BY n.node""".stripMargin
    },
    // Revenue concentration: descending $10-bin histogram, first
    // cum·5 ≥ total·4 crossing from the top; exact longs + exact ppm.
    // Skyline: the oracle states the DEFINITION (NOT EXISTS a
    // dominating part) rather than replaying the two-phase prune —
    // the strongest possible gate for a pruning plan, since a prune
    // that drops a frontier point or keeps a dominated one cannot
    // hash-match the declarative form.
    "q_skyline" ->
      """WITH p AS (
        |  SELECT p_partkey, CAST(p_size AS BIGINT) AS size,
        |         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_cents
        |  FROM part)
        |SELECT p_partkey, price_cents, size FROM p q
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM p d
        |  WHERE d.price_cents <= q.price_cents AND d.size >= q.size
        |    AND (d.price_cents < q.price_cents OR d.size > q.size))
        |ORDER BY price_cents, p_partkey""".stripMargin,
    "table_profile" ->
      """WITH l AS (
        |  SELECT l_orderkey, l_partkey, l_suppkey,
        |         CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |         CAST(l_quantity AS BIGINT) AS l_quantity,
        |         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c,
        |         CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS disc_c,
        |         epoch_ms(l_shipdate) // 86400000 AS ship_day
        |  FROM lineitem)
        |SELECT * FROM (
        |  SELECT 'l_orderkey' AS column_name,
        |         CAST(COUNT(*) - COUNT(l_orderkey) AS BIGINT) AS n_null,
        |         CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_distinct,
        |         CAST(MIN(l_orderkey) AS BIGINT) AS min_val,
        |         CAST(MAX(l_orderkey) AS BIGINT) AS max_val FROM l
        |  UNION ALL
        |  SELECT 'l_partkey', COUNT(*) - COUNT(l_partkey),
        |         COUNT(DISTINCT l_partkey), MIN(l_partkey), MAX(l_partkey) FROM l
        |  UNION ALL
        |  SELECT 'l_suppkey', COUNT(*) - COUNT(l_suppkey),
        |         COUNT(DISTINCT l_suppkey), MIN(l_suppkey), MAX(l_suppkey) FROM l
        |  UNION ALL
        |  SELECT 'l_linenumber', COUNT(*) - COUNT(l_linenumber),
        |         COUNT(DISTINCT l_linenumber), MIN(l_linenumber),
        |         MAX(l_linenumber) FROM l
        |  UNION ALL
        |  SELECT 'l_quantity', COUNT(*) - COUNT(l_quantity),
        |         COUNT(DISTINCT l_quantity), MIN(l_quantity), MAX(l_quantity) FROM l
        |  UNION ALL
        |  SELECT 'l_extendedprice', COUNT(*) - COUNT(price_c),
        |         COUNT(DISTINCT price_c), MIN(price_c), MAX(price_c) FROM l
        |  UNION ALL
        |  SELECT 'l_discount', COUNT(*) - COUNT(disc_c),
        |         COUNT(DISTINCT disc_c), MIN(disc_c), MAX(disc_c) FROM l
        |  UNION ALL
        |  SELECT 'l_shipdate', COUNT(*) - COUNT(ship_day),
        |         COUNT(DISTINCT ship_day), MIN(ship_day), MAX(ship_day) FROM l)
        |ORDER BY column_name""".stripMargin,
    "q_pareto" ->
      """WITH c AS (
        |  SELECT o_custkey,
        |         CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |           AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |b AS (
        |  SELECT cents // 1000 AS bin, COUNT(*) AS nc, SUM(cents) AS rev
        |  FROM c GROUP BY 1),
        |cw AS (
        |  SELECT bin,
        |         SUM(nc) OVER (ORDER BY bin DESC) AS cum_nc,
        |         SUM(rev) OVER (ORDER BY bin DESC) AS cum_rev,
        |         SUM(nc) OVER () AS total_nc,
        |         SUM(rev) OVER () AS total_rev
        |  FROM b)
        |SELECT CAST(cum_nc AS BIGINT) AS n_top,
        |       CAST(total_nc AS BIGINT) AS n_customers,
        |       CAST(cum_rev AS BIGINT) AS top_rev_cents,
        |       CAST(total_rev AS BIGINT) AS rev_cents,
        |       CAST((1000000 * cum_nc) // total_nc AS BIGINT) AS top_frac_ppm
        |FROM cw WHERE cum_rev * 5 >= total_rev * 4
        |ORDER BY bin DESC LIMIT 1""".stripMargin,
    // Weak ties: per-node count of support-0 (local-bridge) edges;
    // the support subquery mirrors the ktruss final LEFT-JOIN form.
    "graph_weakties" ->
      s"""WITH $E,
        |und AS MATERIALIZED (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM e WHERE src <> dst),
        |sym AS (SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und),
        |sup AS MATERIALIZED (
        |  SELECT u.a, u.b, COUNT(y.v) AS s
        |  FROM und u
        |  LEFT JOIN sym x ON x.u = u.a
        |  LEFT JOIN sym y ON y.u = u.b AND y.v = x.v
        |  GROUP BY 1, 2),
        |ends AS (
        |  SELECT a AS node, s FROM sup UNION ALL SELECT b, s FROM sup)
        |SELECT node, CAST(COUNT(*) AS BIGINT) AS n_edges,
        |       CAST(SUM(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_weak,
        |       CAST((1000000 * SUM(CASE WHEN s = 0 THEN 1 ELSE 0 END))
        |         // COUNT(*) AS BIGINT) AS weak_ppm
        |FROM ends GROUP BY 1 ORDER BY node""".stripMargin,
    // Monthly seasonality: integer ym key, YoY via self equi-join on
    // ym−100; -1 sentinels for missing prior-year months.
    "q_yoy" ->
      """WITH m AS (
        |  SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
        |         CAST(COUNT(*) AS BIGINT) AS n_orders,
        |         CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |           AS BIGINT) AS rev_cents
        |  FROM orders GROUP BY 1)
        |SELECT m.ym, m.n_orders, m.rev_cents,
        |       COALESCE(p.rev_cents, -1) AS prev_rev_cents,
        |       COALESCE(CAST((1000000 * CAST(m.rev_cents AS HUGEINT))
        |                  // p.rev_cents AS BIGINT),
        |                -1) AS yoy_ppm
        |FROM m LEFT JOIN m p ON m.ym = p.ym + 100
        |ORDER BY m.ym""".stripMargin,
    // Market-basket lift in exact ppm; parts in > 30 orders never
    // enter the pair join (the cosupply frequent-item cap).
    "basket_lift" ->
      """WITH sp AS (
        |  SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem),
        |n AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM sp),
        |keep AS (SELECT part, COUNT(*) AS n_part FROM sp GROUP BY 1
        |         HAVING COUNT(*) <= 30),
        |k AS (SELECT sp.okey, sp.part, keep.n_part
        |      FROM sp JOIN keep USING (part)),
        |p AS (
        |  SELECT x.part AS part_a, y.part AS part_b,
        |         CAST(COUNT(*) AS BIGINT) AS n_ab,
        |         CAST(MAX(x.n_part) AS BIGINT) AS n_a,
        |         CAST(MAX(y.n_part) AS BIGINT) AS n_b
        |  FROM k x JOIN k y ON x.okey = y.okey AND x.part < y.part
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        |SELECT part_a, part_b, n_a, n_b, n_ab,
        |       CAST((1000000 * n_ab * n.n_orders) // (n_a * n_b) AS BIGINT)
        |         AS lift_ppm
        |FROM p, n ORDER BY part_a, part_b""".stripMargin,
    // Adamic-Adar: each shared callee's weight is the ppm fixed point
    // ⌊10⁶/ln(indeg)+0.5⌋ floored ONCE per callee; scores are exact
    // integer sums after that, so the top-100 cut (score desc, fn_a,
    // fn_b — fully tie-broken) replays bit-identically.
    "graph_adamic" ->
      s"""WITH $E,
        |de AS (SELECT DISTINCT src, dst FROM e),
        |w AS (
        |  SELECT dst, CAST(floor(1000000 / ln(CAST(COUNT(*) AS DOUBLE)) + 0.5)
        |           AS BIGINT) AS wz
        |  FROM de GROUP BY dst HAVING COUNT(*) BETWEEN 2 AND 100),
        |cap AS (SELECT de.src, de.dst, w.wz FROM de JOIN w USING (dst)),
        |p AS (
        |  SELECT x.src AS fn_a, y.src AS fn_b,
        |         CAST(SUM(x.wz) AS BIGINT) AS score_ppm,
        |         CAST(COUNT(*) AS BIGINT) AS shared
        |  FROM cap x JOIN cap y ON x.dst = y.dst AND x.src < y.src
        |  GROUP BY 1, 2)
        |SELECT fn_a, fn_b, score_ppm, shared FROM p
        |WHERE shared >= 2
        |  AND NOT EXISTS (SELECT 1 FROM de
        |                  WHERE de.src = p.fn_a AND de.dst = p.fn_b)
        |  AND NOT EXISTS (SELECT 1 FROM de
        |                  WHERE de.src = p.fn_b AND de.dst = p.fn_a)
        |ORDER BY score_ppm DESC, fn_a, fn_b LIMIT 100""".stripMargin,
    // Resource allocation: the adamic chain with PURE-integer weights
    // ⌊10⁶/indeg⌋ — no transcendental anywhere, scores exact.
    "graph_resource_alloc" ->
      s"""WITH $E,
        |de AS (SELECT DISTINCT src, dst FROM e),
        |w AS (
        |  SELECT dst, 1000000 // COUNT(*) AS wz
        |  FROM de GROUP BY dst HAVING COUNT(*) BETWEEN 2 AND 100),
        |cap AS (SELECT de.src, de.dst, w.wz FROM de JOIN w USING (dst)),
        |p AS (
        |  SELECT x.src AS fn_a, y.src AS fn_b,
        |         CAST(SUM(x.wz) AS BIGINT) AS score_ppm,
        |         CAST(COUNT(*) AS BIGINT) AS shared
        |  FROM cap x JOIN cap y ON x.dst = y.dst AND x.src < y.src
        |  GROUP BY 1, 2)
        |SELECT fn_a, fn_b, score_ppm, shared FROM p
        |WHERE shared >= 2
        |  AND NOT EXISTS (SELECT 1 FROM de
        |                  WHERE de.src = p.fn_a AND de.dst = p.fn_b)
        |  AND NOT EXISTS (SELECT 1 FROM de
        |                  WHERE de.src = p.fn_b AND de.dst = p.fn_a)
        |ORDER BY score_ppm DESC, fn_a, fn_b LIMIT 100""".stripMargin,
    // Borůvka MSF: 6 unrolled pick-and-merge rounds, 8 pointer-jumped
    // inner label rounds each; the (w, a, b) struct-min pick is fully
    // tie-broken so the forest is unique on both engines.
    "graph_msf" ->
      s"""WITH $E,
        |und AS MATERIALIZED (
        |  SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b,
        |         CAST(MIN(call_offset) AS BIGINT) AS w
        |  FROM e WHERE src <> dst GROUP BY 1, 2),
        |c0 AS MATERIALIZED (
        |  SELECT node, node AS comp FROM (
        |    SELECT DISTINCT a AS node FROM und
        |    UNION SELECT b FROM und) t),
        |${msfCtes(6, 8)},
        |forest AS (SELECT DISTINCT a, b, w FROM (
        |  ${(1 to 6).map(t => s"SELECT a, b, w FROM pk$t").mkString("\n        |  UNION ALL ")})
        |  zf)
        |SELECT a AS edge_a, b AS edge_b, w FROM forest
        |ORDER BY edge_a, edge_b""".stripMargin,
    // Square census: ½ΣC(codeg,2) over the hub-capped middle join.
    "graph_squares" ->
      s"""WITH $E,
        |u0 AS MATERIALIZED (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM e WHERE src <> dst),
        |nb AS MATERIALIZED (
        |  SELECT a AS node, b AS z FROM u0
        |  UNION ALL SELECT b, a FROM u0),
        |ok AS (SELECT z FROM nb GROUP BY z HAVING COUNT(*) <= 100),
        |cp AS (SELECT nb.node, nb.z FROM nb JOIN ok USING (z)),
        |pw AS (
        |  SELECT x.node AS u, y.node AS v, COUNT(*) AS w
        |  FROM cp x JOIN cp y ON x.z = y.z AND x.node < y.node
        |  GROUP BY 1, 2)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |       CAST(COALESCE(SUM((w * (w - 1)) // 2) // 2, 0) AS BIGINT)
        |         AS n_squares
        |FROM pw""".stripMargin,
    // Double-sweep diameter bound: two unrolled frontier BFS chains
    // over the undirected edge set; farthest picks fully tie-broken.
    "graph_diameter" -> {
      val depth = 12
      def sweep(tag: String, startSql: String): String = {
        val levels = (1 to depth).map { d =>
          s"""${tag}p$d AS MATERIALIZED (
             |  SELECT DISTINCT sym.dst AS node
             |  FROM ${tag}p${d - 1} f JOIN sym ON sym.src = f.node
             |  WHERE NOT EXISTS (SELECT 1 FROM ${tag}v${d - 1} v
             |                    WHERE v.node = sym.dst)),
             |${tag}v$d AS MATERIALIZED (
             |  SELECT node FROM ${tag}v${d - 1}
             |  UNION SELECT node FROM ${tag}p$d)""".stripMargin
        }.mkString(",\n")
        val dist = (1 to depth)
          .map(d => s"SELECT node, $d AS depth FROM ${tag}p$d")
          .mkString("\n  UNION ALL ")
        s"""${tag}p0 AS (SELECT $startSql AS node),
           |${tag}v0 AS (SELECT $startSql AS node),
           |$levels,
           |${tag}far AS (
           |  SELECT node, depth FROM ($dist) z
           |  ORDER BY depth DESC, node LIMIT 1)""".stripMargin
      }
      s"""WITH $E,
        |sym AS MATERIALIZED (
        |  SELECT src, dst FROM e
        |  UNION SELECT dst, src FROM e),
        |sd AS (SELECT MIN(LEAST(src, dst)) AS s FROM sym),
        |${sweep("a", "(SELECT s FROM sd)")},
        |${sweep("b", "COALESCE((SELECT node FROM afar), (SELECT s FROM sd))")}
        |SELECT (SELECT s FROM sd) AS seed,
        |       CAST(COALESCE((SELECT depth FROM afar), 0) AS BIGINT) AS ecc_seed,
        |       COALESCE((SELECT node FROM afar), (SELECT s FROM sd)) AS far_a,
        |       COALESCE((SELECT node FROM bfar),
        |         COALESCE((SELECT node FROM afar), (SELECT s FROM sd))) AS far_b,
        |       CAST(COALESCE((SELECT depth FROM bfar), 0) AS BIGINT)
        |         AS diameter_lb""".stripMargin
    },
    // SALSA: degree-normalized HITS — per-edge floor divisions are
    // exact integers both sides; one final HUGEINT-widened ppm scale.
    "graph_salsa" ->
      s"""WITH $E,
        |${salsaCtes(2)}
        |SELECT s.node,
        |       CAST((1000000 * CAST(s.h AS HUGEINT)) // m.mh AS BIGINT) AS hub_ppm,
        |       CAST((1000000 * CAST(s.a AS HUGEINT)) // m.ma AS BIGINT) AS auth_ppm
        |FROM s2 s, mfin m ORDER BY s.node""".stripMargin,
    // Order-independent md5-fold checksum: canonical integer/text row
    // strings, top-48-bit digests summed mod 2^61-1 (HUGEINT inside).
    "table_checksum" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       CAST(SUM(CAST(('0x' || substr(md5(
        |              o_orderkey || '|' || o_custkey || '|' || o_orderstatus
        |              || '|' || CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |              || '|' || epoch_ms(o_orderdate)
        |              || '|' || o_orderpriority), 1, 12)) AS BIGINT))
        |            % 2305843009213693951 AS BIGINT) AS checksum61
        |FROM orders""".stripMargin,
    // Pearson matrix: exact HUGEINT moment sums, the r formula's
    // double ops sequenced identically (conversion → product →
    // difference → sqrt → divide → floor-ppm).
    "q_corr" -> {
      def c(x: String, y: String) =
        s"""CAST(CASE WHEN (CAST(n AS DOUBLE) * s_$x$x - CAST(s_$x AS DOUBLE) * s_$x) *
           |  (CAST(n AS DOUBLE) * s_$y$y - CAST(s_$y AS DOUBLE) * s_$y) <= 0 THEN 0
           |ELSE floor((CAST(n AS DOUBLE) * s_$x$y - CAST(s_$x AS DOUBLE) * s_$y)
           |  / sqrt((CAST(n AS DOUBLE) * s_$x$x - CAST(s_$x AS DOUBLE) * s_$x)
           |       * (CAST(n AS DOUBLE) * s_$y$y - CAST(s_$y AS DOUBLE) * s_$y))
           |  * 1000000 + 0.5) END AS BIGINT)""".stripMargin
      s"""WITH b AS (
         |  SELECT CAST(l_quantity AS BIGINT) AS q,
         |         CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d,
         |         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS p
         |  FROM lineitem),
         |m AS (
         |  SELECT COUNT(*) AS n,
         |         SUM(q::HUGEINT) AS s_q, SUM(d::HUGEINT) AS s_d,
         |         SUM(p::HUGEINT) AS s_p,
         |         SUM(q::HUGEINT * q) AS s_qq, SUM(d::HUGEINT * d) AS s_dd,
         |         SUM(p::HUGEINT * p) AS s_pp,
         |         SUM(q::HUGEINT * d) AS s_qd, SUM(q::HUGEINT * p) AS s_qp,
         |         SUM(d::HUGEINT * p) AS s_dp
         |  FROM b)
         |SELECT * FROM (
         |  SELECT 'quantity_discount' AS pair, CAST(n AS BIGINT) AS n,
         |         ${c("q", "d")} AS corr_ppm FROM m
         |  UNION ALL
         |  SELECT 'quantity_price', CAST(n AS BIGINT), ${c("q", "p")} FROM m
         |  UNION ALL
         |  SELECT 'discount_price', CAST(n AS BIGINT), ${c("d", "p")} FROM m)
         |ORDER BY pair""".stripMargin
    },
    // RFM quartiles from per-metric bin histograms (cum·4 ≥ n·p at
    // p = 1,2,3); scores compare BINS to the crossing bin, so the
    // tie side is exact. Monetary bins are $10 (1000 cents).
    "customer_rfm" ->
      """WITH m AS (
        |  SELECT o_custkey AS custkey,
        |         CAST(MAX(epoch_ms(o_orderdate) // 86400000) AS BIGINT) AS r_day,
        |         CAST(COUNT(*) AS BIGINT) AS n_orders,
        |         CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |           AS BIGINT) AS m_cents
        |  FROM orders GROUP BY 1),
        |mb AS (SELECT *, m_cents // 1000 AS m_bin FROM m),
        |rh AS (SELECT r_day AS bin, COUNT(*) AS c FROM mb GROUP BY 1),
        |rc AS (SELECT bin, SUM(c) OVER (ORDER BY bin) AS cum,
        |              SUM(c) OVER () AS n FROM rh),
        |rcut AS (SELECT MIN(CASE WHEN cum*4 >= n*1 THEN bin END) AS r1,
        |                MIN(CASE WHEN cum*4 >= n*2 THEN bin END) AS r2,
        |                MIN(CASE WHEN cum*4 >= n*3 THEN bin END) AS r3 FROM rc),
        |fh AS (SELECT n_orders AS bin, COUNT(*) AS c FROM mb GROUP BY 1),
        |fc AS (SELECT bin, SUM(c) OVER (ORDER BY bin) AS cum,
        |              SUM(c) OVER () AS n FROM fh),
        |fcut AS (SELECT MIN(CASE WHEN cum*4 >= n*1 THEN bin END) AS f1,
        |                MIN(CASE WHEN cum*4 >= n*2 THEN bin END) AS f2,
        |                MIN(CASE WHEN cum*4 >= n*3 THEN bin END) AS f3 FROM fc),
        |mh AS (SELECT m_bin AS bin, COUNT(*) AS c FROM mb GROUP BY 1),
        |mc AS (SELECT bin, SUM(c) OVER (ORDER BY bin) AS cum,
        |              SUM(c) OVER () AS n FROM mh),
        |mcut AS (SELECT MIN(CASE WHEN cum*4 >= n*1 THEN bin END) AS m1,
        |                MIN(CASE WHEN cum*4 >= n*2 THEN bin END) AS m2,
        |                MIN(CASE WHEN cum*4 >= n*3 THEN bin END) AS m3 FROM mc)
        |SELECT custkey, r_day, n_orders, m_cents,
        |  1 + CAST(r_day > r1 AS BIGINT) + CAST(r_day > r2 AS BIGINT)
        |    + CAST(r_day > r3 AS BIGINT) AS r_score,
        |  1 + CAST(n_orders > f1 AS BIGINT) + CAST(n_orders > f2 AS BIGINT)
        |    + CAST(n_orders > f3 AS BIGINT) AS f_score,
        |  1 + CAST(m_bin > m1 AS BIGINT) + CAST(m_bin > m2 AS BIGINT)
        |    + CAST(m_bin > m3 AS BIGINT) AS m_score,
        |  (1 + CAST(r_day > r1 AS BIGINT) + CAST(r_day > r2 AS BIGINT)
        |     + CAST(r_day > r3 AS BIGINT)) * 100
        |  + (1 + CAST(n_orders > f1 AS BIGINT) + CAST(n_orders > f2 AS BIGINT)
        |       + CAST(n_orders > f3 AS BIGINT)) * 10
        |  + (1 + CAST(m_bin > m1 AS BIGINT) + CAST(m_bin > m2 AS BIGINT)
        |       + CAST(m_bin > m3 AS BIGINT)) AS rfm
        |FROM mb, rcut, fcut, mcut
        |ORDER BY custkey""".stripMargin,
    "lineage_up" ->
      """SELECT o_orderkey, c_name, n_name, r_name,
        |  CAST(o_orderkey AS VARCHAR) || '->' || c_name || '->' || n_name
        |    || '->' || r_name AS path
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderkey % 1500 = 3
        |ORDER BY o_orderkey""".stripMargin
  )
}
