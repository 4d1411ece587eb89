package graft.queries

import graft.SparkEntry

/** Scale-replayable oracle forms for the queries whose primary
  * DuckDB oracles exceed the oracle environment's memory/spill caps
  * at organic sf1 (CORRECTNESS_ORGANIC_SF1_r09 `oracle_env_failures`:
  * dedup_embedding ~74 GB brute pair rerank, graph_scc/graph_bowtie
  * Θ(n·m) transitive-closure CTEs on the 5.3M-edge graph,
  * recursion_detect exponential trail enumeration).
  *
  * Protocol (the table_checksum E57 contract applied to a query's
  * OUTPUT): each entry pairs
  *   - `oracle`: SQL over the BASE tables computing a digest/sampled
  *     form whose memory is bounded at any scale (probe-pivot
  *     reachability instead of full closure, walk-count DP instead of
  *     trail enumeration, a deterministic md5 pair-cut of the
  *     candidate set), and
  *   - `output`: SQL over the dumped Spark result (exposed to DuckDB
  *     as view `out`) computing the SAME digest from the full gated
  *     output.
  * scripts/check.py compares the two frames when
  * GRAFT_SCALE_ORACLES=1. The digest forms are ALSO replayed at the
  * gate SFs (where the primary full-output oracles already pass), so
  * the digest logic itself is validated against fully-verified
  * output before it is trusted at sf1.
  */
object ScaleOracles {

  /** Deterministic 1-in-16 pair cut — same expression on the base
    * and output side (both run in DuckDB, so md5 semantics match by
    * construction). */
  private def pairCut(a: String, b: String): String =
    s"substring(md5(CAST($a AS VARCHAR) || '_' || CAST($b AS VARCHAR)), 1, 1) = '0'"

  /** Size-adaptive VECTOR cut for the dedup_embedding digest (r14
    * verdict ask #2): the pair cut alone was not enough at organic
    * sf10 — with 100k gated vectors and 32 sign-LSH buckets per band
    * the candidate DISTINCT and the |cand|·dim rerank agg are
    * df²-shaped UPSTREAM of any pair filter, and the monolithic
    * replay spilled >73 GB at a 90 GB memlimit. Cutting at the
    * VECTOR level composes multiplicatively through the whole chain
    * instead (projections, buckets, candidates AND rerank all
    * shrink), and stays value-exact on the kept subset: buckets are
    * per-vector functions, so the cut corpus's candidate pairs are
    * exactly the full run's candidates restricted to kept×kept, and
    * each pair's cosine depends only on its own two vectors — pair
    * presence/absence and values both transfer. The threshold is a
    * scalar subquery of the corpus size so the gate SFs and sf1
    * (where the pair-cut-only form is proven feasible AND the digest
    * validates against fully-verified output) keep EVERY vector
    * ('g' > every md5 hex char), while ≥ 100k-embedding corpora keep
    * the md5-first-hex-'0' sixteenth — at sf10 that is ~6.3k gated
    * vectors: every CTE fits in memory and the digest still reranks
    * tens of thousands of real pairs. */
  private val vcutThresh =
    "(SELECT CASE WHEN COUNT(*) >= 100000 THEN '1' ELSE 'g' END FROM embeddings)"
  private def vecCut(c: String): String =
    s"substring(md5(CAST($c AS VARCHAR)), 1, 1) < $vcutThresh"

  /** dedup_embedding: the primary oracle verbatim with (a) the
    * size-adaptive [[vecCut]] injected into the quantized-vector CTE
    * and (b) the md5 pair cut injected into the candidate CTE — the
    * rerank join (the memory driver: |cand| × dim rows through one
    * aggregate) shrinks 16× from the pair cut alone and a further
    * 256× at sf10 from the vector cut; value-exact on the cut subset
    * including pair presence / absence. */
  private val dedupEmbedding: (String, String) = {
    val base = SparkEntry.oracleSql("dedup_embedding")
    val anchor = "AND a.vec_id < b.vec_id),"
    val exqAnchor = "FROM ex WHERE vec_id % 2 = 0)"
    require(base.contains(anchor) && base.contains(exqAnchor),
      "dedup_embedding oracle changed shape; re-derive its scale form")
    val cutSql = base
      .replace(exqAnchor,
        s"""FROM ex WHERE vec_id % 2 = 0 AND ${vecCut("vec_id")})""")
      .replace(anchor,
        s"""AND a.vec_id < b.vec_id
           |             AND ${pairCut("a.vec_id", "b.vec_id")}),""".stripMargin)
    (cutSql,
      s"""SELECT doc_a, doc_b, cosine FROM out
         |WHERE ${pairCut("doc_a", "doc_b")}
         |  AND ${vecCut("doc_a")} AND ${vecCut("doc_b")}
         |ORDER BY doc_a, doc_b""".stripMargin)
  }

  /** graph_scc: 64 md5-ranked probe nodes; per probe, forward ∩
    * backward reachability IS its SCC — (probe, scc_id = min member,
    * size, member-sum) digests the full labeling at the probes and
    * over every node of the probed SCCs. Recursive state is
    * (probe, node) ≤ 64·|V| rows — bounded at any scale, vs the
    * primary oracle's Θ(n·m) closure. */
  private val graphScc: (String, String) = (
    s"""WITH RECURSIVE ${SparkEntry.E},
       |de AS (SELECT DISTINCT src, dst FROM e),
       |nodes AS (SELECT DISTINCT node FROM
       |  (SELECT src AS node FROM de UNION ALL SELECT dst FROM de)),
       |pv AS (SELECT node FROM nodes
       |       ORDER BY md5(CAST(node AS VARCHAR)), node LIMIT 64),
       |fwd(p, node) AS (
       |  SELECT node, node FROM pv
       |  UNION
       |  SELECT f.p, de.dst FROM fwd f JOIN de ON de.src = f.node),
       |bwd(p, node) AS (
       |  SELECT node, node FROM pv
       |  UNION
       |  SELECT b.p, de.src FROM bwd b JOIN de ON de.dst = b.node),
       |mem AS (SELECT f.p, f.node FROM fwd f
       |        JOIN bwd b ON f.p = b.p AND f.node = b.node)
       |SELECT CAST(p AS BIGINT) AS probe,
       |       CAST(MIN(node) AS BIGINT) AS scc_id,
       |       CAST(COUNT(*) AS BIGINT) AS scc_size,
       |       CAST(SUM(node) AS BIGINT) AS scc_sum
       |FROM mem GROUP BY 1 ORDER BY probe""".stripMargin,
    s"""WITH pv AS (SELECT node FROM out
       |            ORDER BY md5(CAST(node AS VARCHAR)), node LIMIT 64),
       |lab AS (SELECT o.node AS probe, o.scc_id
       |        FROM out o JOIN pv ON o.node = pv.node)
       |SELECT CAST(l.probe AS BIGINT) AS probe,
       |       CAST(l.scc_id AS BIGINT) AS scc_id,
       |       CAST(COUNT(*) AS BIGINT) AS scc_size,
       |       CAST(SUM(m.node) AS BIGINT) AS scc_sum
       |FROM lab l JOIN out m ON m.scc_id = l.scc_id
       |GROUP BY 1, 2 ORDER BY probe""".stripMargin)

  /** graph_bowtie: the giant SCC re-derived as the largest
    * (size desc, scc_id asc) among the 64 probes' SCCs, then the
    * primary oracle's depth-8 cones verbatim. Exact whenever ≥1
    * probe lands in the true core (w.h.p. for a giant core — and a
    * miss FAILS the compare loudly via the core size, never passes
    * wrong). Output side is the full 4-row result as-is. */
  private val graphBowtie: (String, String) = (
    s"""WITH RECURSIVE ${SparkEntry.E},
       |de AS (SELECT DISTINCT src, dst FROM e),
       |nodes AS (SELECT DISTINCT node FROM
       |  (SELECT src AS node FROM de UNION ALL SELECT dst FROM de)),
       |pv AS (SELECT node FROM nodes
       |       ORDER BY md5(CAST(node AS VARCHAR)), node LIMIT 64),
       |fwd(p, node) AS (
       |  SELECT node, node FROM pv
       |  UNION
       |  SELECT f.p, de.dst FROM fwd f JOIN de ON de.src = f.node),
       |bwd(p, node) AS (
       |  SELECT node, node FROM pv
       |  UNION
       |  SELECT b.p, de.src FROM bwd b JOIN de ON de.dst = b.node),
       |mem AS MATERIALIZED (SELECT f.p, f.node FROM fwd f
       |        JOIN bwd b ON f.p = b.p AND f.node = b.node),
       |sccp AS (SELECT p, MIN(node) AS scc_id, COUNT(*) AS n
       |         FROM mem GROUP BY 1),
       |core1 AS (SELECT scc_id FROM sccp
       |          ORDER BY n DESC, scc_id LIMIT 1),
       |cn AS MATERIALIZED (
       |  SELECT DISTINCT m.node FROM mem m JOIN sccp s ON m.p = s.p
       |  WHERE s.scc_id = (SELECT scc_id FROM core1)),
       |cfwd(node, d) AS (
       |  SELECT node, 0 FROM cn
       |  UNION
       |  SELECT de.dst, f.d + 1 FROM cfwd f JOIN de ON de.src = f.node
       |  WHERE f.d < 8),
       |cbwd(node, d) AS (
       |  SELECT node, 0 FROM cn
       |  UNION
       |  SELECT de.src, b2.d + 1 FROM cbwd b2 JOIN de ON de.dst = b2.node
       |  WHERE b2.d < 8),
       |fw AS (SELECT DISTINCT node FROM cfwd),
       |bw AS (SELECT DISTINCT node FROM cbwd),
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
    "SELECT component, n_nodes FROM out ORDER BY component")

  /** recursion_detect: the walk-count DP with the exact depth-4
    * two-cycle correction, unrolled — the same mathematics the Spark
    * side runs (Traversal.recursionDp's proof: every returning walk
    * of length ≤ 3 over self-loop-free edges is a trail; at depth 4
    * the only non-trail walks are a→b→a→b→a, one per 2-cycle
    * partner). Full-output exact; DP state is (start, cur) ≤ 64·|V|
    * rows per level vs the primary oracle's exponential trail
    * enumeration with carried edge-set strings. */
  private val recursionDetect: (String, String) = (
    s"""WITH ${SparkEntry.E},
       |ne AS (SELECT src, dst FROM e WHERE src <> dst),
       |rs AS (SELECT node FROM
       |    (SELECT DISTINCT src AS node FROM e WHERE src % 500 = 7)
       |  ORDER BY md5(CAST(node AS VARCHAR)) LIMIT 64),
       |c2 AS (SELECT f.src AS start, COUNT(*) AS n2
       |       FROM ne f JOIN ne r ON f.src = r.dst AND f.dst = r.src
       |       GROUP BY 1),
       |w1 AS (SELECT rs.node AS start, ne.dst AS cur,
       |              CAST(1 AS BIGINT) AS walks
       |       FROM rs JOIN ne ON ne.src = rs.node),
       |w2 AS (SELECT w.start, ne.dst AS cur, SUM(w.walks) AS walks
       |       FROM w1 w JOIN ne ON ne.src = w.cur GROUP BY 1, 2),
       |w3 AS (SELECT w.start, ne.dst AS cur, SUM(w.walks) AS walks
       |       FROM w2 w JOIN ne ON ne.src = w.cur GROUP BY 1, 2),
       |w4 AS (SELECT w.start, ne.dst AS cur, SUM(w.walks) AS walks
       |       FROM w3 w JOIN ne ON ne.src = w.cur GROUP BY 1, 2),
       |ind AS (
       |  SELECT start AS node, 2 AS depth, walks AS n_cycles
       |  FROM w2 WHERE cur = start
       |  UNION ALL
       |  SELECT start, 3, walks FROM w3 WHERE cur = start
       |  UNION ALL
       |  SELECT w4.start, 4, walks - COALESCE(c2.n2, 0)
       |  FROM w4 LEFT JOIN c2 ON w4.start = c2.start
       |  WHERE cur = w4.start AND walks - COALESCE(c2.n2, 0) > 0)
       |SELECT DISTINCT src AS node, 'Direct' AS call_type, 1 AS depth,
       |       CAST(1 AS BIGINT) AS n_cycles
       |FROM e WHERE src = dst
       |UNION ALL
       |SELECT node, 'Indirect', depth, CAST(n_cycles AS BIGINT)
       |FROM ind
       |ORDER BY call_type, node, depth""".stripMargin,
    "SELECT node, call_type, depth, n_cycles FROM out " +
      "ORDER BY call_type, node, depth")

  /** sample_coreset: inductive chain verification AGAINST the
    * output. The primary oracle unrolls the farthest-first rounds,
    * and DuckDB executes each round's argmax as an i-keyed join
    * explosion over all n·dim rows — measured CPU-bound at >95 min
    * on the organic-sf1 replay (the round-12 stall). The digest
    * instead treats the dumped chain as the candidate: dist²(p, c)
    * for every point × claimed center is n·k rows, then per step t
    * the (min-dist-to-prefix DESC, vec_id ASC) argmax must reproduce
    * row t exactly. The tie-broken argmax is unique, so if step 1 is
    * the MIN(vec_id) seed and every later step verifies against its
    * prefix, the output IS the unique true chain — full-output
    * exact, O(n·k²) state at any scale. Same quantization text as
    * the primary (qx = round(x·10⁶) BIGINT; d² = n2a + n2b − 2·dot). */
  private val sampleCoreset: (String, String) = (
    s"""WITH ex AS (
       |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
       |         generate_subscripts(embedding, 1) AS i
       |  FROM embeddings),
       |exq AS (SELECT vec_id, CAST(round(x * 1000000, 0) AS BIGINT) AS qx, i
       |        FROM ex),
       |nn AS MATERIALIZED (
       |  SELECT vec_id, CAST(SUM(qx * qx) AS BIGINT) AS n2
       |  FROM exq GROUP BY 1),
       |cv AS (SELECT o.rnk, e.vec_id, e.qx, e.i
       |       FROM out o JOIN exq e ON e.vec_id = o.vec_id),
       |pc AS MATERIALIZED (
       |  SELECT a.vec_id AS p, c.rnk AS r,
       |         MAX(pn.n2) + MAX(cn.n2)
       |           - 2 * CAST(SUM(a.qx * c.qx) AS BIGINT) AS d2
       |  FROM exq a JOIN cv c ON a.i = c.i
       |  JOIN nn pn ON pn.vec_id = a.vec_id
       |  JOIN nn cn ON cn.vec_id = c.vec_id
       |  GROUP BY a.vec_id, c.rnk),
       |md AS MATERIALIZED (
       |  -- step set generated INDEPENDENTLY of out (k is pinned at 8
       |  -- in coresetKCenter, clamped by corpus size): deriving steps
       |  -- from out itself let any truncated/relabeled chain build a
       |  -- matching expected frame and pass — the expected frame must
       |  -- always carry contiguous rnk 1..k so a dropped round FAILS
       |  -- the row-count compare.
       |  SELECT pc.p, s.rnk AS t, MIN(pc.d2) AS d
       |  FROM pc JOIN (
       |    SELECT CAST(unnest(generate_series(2,
       |      LEAST(8, (SELECT COUNT(*) FROM embeddings)))) AS BIGINT) AS rnk
       |  ) s ON pc.r < s.rnk
       |  GROUP BY pc.p, s.rnk),
       |pick AS (
       |  SELECT t, p, d,
       |         ROW_NUMBER() OVER (PARTITION BY t ORDER BY d DESC, p) AS rn
       |  FROM md)
       |SELECT CAST(rnk AS BIGINT) AS rnk, CAST(vec_id AS BIGINT) AS vec_id,
       |       CAST(d2 AS BIGINT) AS d2 FROM (
       |  SELECT 1 AS rnk, (SELECT MIN(vec_id) FROM exq) AS vec_id, 0 AS d2
       |  UNION ALL
       |  SELECT t AS rnk, p AS vec_id, d AS d2 FROM pick WHERE rn = 1)
       |ORDER BY rnk""".stripMargin,
    "SELECT rnk, vec_id, d2 FROM out ORDER BY rnk")

  /** name → (base-table digest SQL, output digest SQL over view
    * `out`). */
  val sql: Map[String, (String, String)] = Map(
    "dedup_embedding" -> dedupEmbedding,
    "graph_scc" -> graphScc,
    "graph_bowtie" -> graphBowtie,
    "recursion_detect" -> recursionDetect,
    "sample_coreset" -> sampleCoreset)
}
