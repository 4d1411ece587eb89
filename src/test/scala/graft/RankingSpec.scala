package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.Ranking
import graft.pipeline.Sampling

/** Hand-checkable semantics for the graph-analytics and
  * sampling/packing operators.
  */
class RankingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)

  def edges(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toDF("src", "dst")
  }

  test("triangle count: K4 has 4, a square has 0, pendant edges add none") {
    val k4 = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(Ranking.triangleCount(k4).collect()(0).getLong(0) == 4L)
    val square = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(Ranking.triangleCount(square).collect()(0).getLong(0) == 0L)
    val triPendant = edges((1L, 2L), (2L, 3L), (3L, 1L), (3L, 9L))
    assert(Ranking.triangleCount(triPendant).collect()(0).getLong(0) == 1L)
    // duplicate + reversed + self-loop edges don't change the count
    val noisy = edges((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 1L), (2L, 2L))
    assert(Ranking.triangleCount(noisy).collect()(0).getLong(0) == 1L)
  }

  test("k-core: pendant chain peels off, K4 survives as the 3-core") {
    // K4 plus a pendant chain 4-5-6: at k=3 the chain peels in
    // cascade (6 first, then 5, then 4 keeps the K4 degree only)
    val g = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L))
    val core = Ranking.kCoreBounded(g, k = 3, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // k above the max degree empties the graph
    assert(Ranking.kCoreBounded(g, k = 10, rounds = 4).collect().isEmpty)
    // duplicate/reversed/self-loop edges don't change the core
    val noisy = edges((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (3L, 4L), (3L, 3L), (4L, 5L), (5L, 6L))
    val core2 = Ranking.kCoreBounded(noisy, k = 3, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core2 == core)
  }

  test("pagerank: a cycle is a fixpoint at 1.0; sinks accumulate rank") {
    // 3-cycle: every node keeps exactly 10^6 ppm at every iteration
    val cyc = Ranking.pageRank(edges((1L, 2L), (2L, 3L), (3L, 1L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cyc == Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))
    // chain 1 -> 2 -> 3: rank strictly increases downstream
    val chain = Ranking.pageRank(edges((1L, 2L), (2L, 3L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chain(1L) < chain(2L) && chain(2L) < chain(3L))
    assert(chain(1L) == 150000L) // no in-edges: bare teleport mass
  }

  test("weighted pagerank: hot edge carries more mass; uniform weights = pageRank") {
    import spark.implicits._
    // 1 splits 9:1 between 2 and 3 — node 2 ends with ~9x node 3's
    // inflow share: contribution to 2 = ⌊pr·9/10⌋, to 3 = ⌊pr·1/10⌋
    val w = Seq((1L, 2L, 9L), (1L, 3L, 1L)).toDF("src", "dst", "weight")
    val r = Ranking.pageRankWeighted(w)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(2L) > r(3L))
    assert(r(1L) == 150000L) // no in-edges: bare teleport mass
    // weight-1 everywhere reproduces the uniform operator exactly
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
    val uni = Ranking.pageRank(g.toDF("src", "dst"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val wuni = Ranking.pageRankWeighted(
        g.map { case (a, b) => (a, b, 1L) }.toDF("src", "dst", "weight"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(uni == wuni)
  }

  def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("betweenness: Brandes dependencies on a diamond, ppm fixed point") {
    import spark.implicits._
    // 1→2→{3,4}, 1→5→3: σ(3)=2 (two shortest paths), σ(4)=1.
    // δ(2) = 1/2·(1+0) + 1/1·(1+0) = 1.5 → 1,500,000 ppm
    // δ(5) = 1/2 → 500,000 ppm; 3 and 4 lie on no interior path.
    val g = edges(1L -> 2L, 2L -> 3L, 2L -> 4L, 1L -> 5L, 5L -> 3L)
    val b = Ranking.betweennessSampled(g, Seq(1L).toDF("node"), maxDepth = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b == Map(2L -> 1500000L, 5L -> 500000L), s"got $b")
  }

  test("betweenness truncation: a depth-2 bound ignores longer dependencies") {
    import spark.implicits._
    // chain 1→2→3→4: at depth 3, δ(2) = (1+δ(3)) = 2.0; truncated at
    // depth 2, node 4 is never reached so δ(3) = 0 and δ(2) = 1.0.
    val g = edges(1L -> 2L, 2L -> 3L, 3L -> 4L)
    val d3 = Ranking.betweennessSampled(g, Seq(1L).toDF("node"), maxDepth = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val d2 = Ranking.betweennessSampled(g, Seq(1L).toDF("node"), maxDepth = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d3 == Map(2L -> 2000000L, 3L -> 1000000L), s"got $d3")
    assert(d2 == Map(2L -> 1000000L), s"got $d2")
  }

  test("betweenness source-chunk dispatch is bit-identical to the single pass") {
    import spark.implicits._
    // 4 sources over a graph with shared interior nodes; a 1-cell
    // budget forces one chunk PER SOURCE — the maximal split — and
    // the summed result must equal the packed single pass exactly
    // (betweenness = Σ_s δ(s,·) over disjoint source groups).
    val g = edges(1L -> 2L, 2L -> 3L, 2L -> 4L, 1L -> 5L, 5L -> 3L,
      6L -> 2L, 7L -> 5L, 3L -> 8L, 4L -> 8L)
    val srcs = Seq(1L, 6L, 7L, 2L).toDF("node")
    val single = Ranking.betweennessSampled(g, srcs, maxDepth = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prev = sys.props.get("graft.bw.cell.budget")
    sys.props("graft.bw.cell.budget") = "1"
    try {
      val chunked = Ranking.betweennessSampled(g, srcs, maxDepth = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(chunked == single, s"chunked $chunked vs single $single")
      assert(single.nonEmpty)
    } finally {
      prev match {
        case Some(v) => sys.props("graft.bw.cell.budget") = v
        case None => sys.props.remove("graft.bw.cell.budget"); ()
      }
    }
  }

  test("stratified sample: per-stratum quota, deterministic hash order") {
    val d = docs(
      1L -> "the cat is on the mat", 2L -> "the dog is in the house",
      3L -> "it was the best of times", 4L -> "qwerty zxcvb",
      5L -> "plmkn wsxed", 6L -> "the sun is up")
    val s = Sampling.stratifiedSample(d, perStratum = 2)
      .collect().map(r => (r.getString(1), r.getLong(0)))
    assert(s.count(_._1 == "en") == 2 && s.count(_._1 == "unknown") == 2)
    // re-running yields the identical draw (hash order, not RNG)
    val s2 = Sampling.stratifiedSample(d, perStratum = 2)
      .collect().map(r => (r.getString(1), r.getLong(0)))
    assert(s.toSeq == s2.toSeq)
  }

  test("threshold sample: quota within binomial tolerance, deterministic, no window") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val n = d.count()
    val s = Sampling.stratifiedSampleThreshold(d, frac = 0.25)
    val rows = s.collect().map(r => (r.getLong(0), r.getString(1)))
    // overall quota: binomial(n, 0.25), allow ±4σ
    val sigma = math.sqrt(n * 0.25 * 0.75)
    assert(math.abs(rows.length - n * 0.25) <= 4 * sigma,
      s"${rows.length} kept of $n at frac=0.25")
    // identical draw on re-run (hash cutoff, not RNG)
    val again = Sampling.stratifiedSampleThreshold(d, frac = 0.25)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == again.toSeq)
    // monotone in frac: the half-rate draw is a subset of the full one
    val half = Sampling.stratifiedSampleThreshold(d, frac = 0.125)
      .collect().map(_.getLong(0)).toSet
    assert(half.subsetOf(rows.map(_._1).toSet))
    // scale shape: a filter, not a per-stratum window sort
    val plan = s.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"threshold form must not window:\n$plan")
  }

  test("pack sequences: offsets and boundary spans") {
    // doc token counts: "a b c d" = 4 BPE tokens each
    val d = docs(1L -> "a b c d", 2L -> "e f g h", 3L -> "i j k l")
    val p = Sampling.packSequences(d, budget = 10, shardSize = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))
    // starts at 0, 4, 8; budget 10: doc 3 starts in seq 0 at offset 8
    // and spans into seq 1 (tokens 8..11)
    assert(p.toSeq == Seq(
      (1L, 4L, 0L, 0L, 1L),
      (2L, 4L, 0L, 4L, 1L),
      (3L, 4L, 0L, 8L, 2L)))
    // shard isolation: a doc in another shard starts its own sequences
    val far = docs(1L -> "a b c d", 2001L -> "e f g h")
    val p2 = Sampling.packSequences(far, budget = 10, shardSize = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(p2.toSeq == Seq((1L, 0L, 0L, 0L), (2001L, 2L, 0L, 0L)))
  }

  test("closeness: path-graph distance sums; a cycle never re-reaches its start") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val starts = Seq(1L).toDF("node")
    // the traversal layer expects the callEdges shape (src, dst, offset)
    def g(rows: (Long, Long)*) = edges(rows: _*).withColumn("offset", lit(1L))
    // 1→2→3→4: ball {2,3,4} at depths 1,2,3 → n=3, Σ=6, ppm=500000
    val path = g((1L, 2L), (2L, 3L), (3L, 4L))
    val c = graft.graph.Ranking.closeness(path, starts, maxDepth = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(c.toSeq == Seq((1L, 3L, 6L, 500000L)))
    // 3-cycle: start reaches 2 (d1) and 3 (d2) but NOT itself again
    val cyc = g((1L, 2L), (2L, 3L), (3L, 1L))
    val c2 = graft.graph.Ranking.closeness(cyc, starts, maxDepth = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(c2.toSeq == Seq((2L, 3L)))
  }

  test("harmonic centrality: per-depth reciprocal terms, exact integer floors") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val starts = Seq(1L).toDF("node")
    def g(rows: (Long, Long)*) = edges(rows: _*).withColumn("offset", lit(1L))
    // 1→2→3→4: ⌊10⁶/1⌋+⌊10⁶/2⌋+⌊10⁶/3⌋ = 1000000+500000+333333
    val path = g((1L, 2L), (2L, 3L), (3L, 4L))
    val h = graft.graph.Ranking.harmonic(path, starts, maxDepth = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(h.toSeq == Seq((1L, 3L, 1833333L)))
  }

  test("hits: hubs and authorities separate on a directed star; floor normalization") {
    // star 1→{2,3,4}: 1 is the pure hub, leaves are pure authorities
    val star = Ranking.hits(edges((1L, 2L), (1L, 3L), (1L, 4L)), iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(star(1L) == ((1000000L, 0L)), s"center must be the hub: $star")
    assert(Seq(2L, 3L, 4L).forall(star(_) == ((0L, 1000000L))),
      s"leaves must be authorities: $star")
    // two hubs of different strength: 1→{3,4}, 2→{3} — after round 2
    // the weaker side floors to ⌊10⁶·1.0e6/1.5e6⌋ = 666666
    val two = Ranking.hits(edges((1L, 3L), (1L, 4L), (2L, 3L)), iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(two(1L)._1 == 1000000L && two(2L)._1 == 666666L,
      s"hub ordering/floors wrong: $two")
    assert(two(3L)._2 == 1000000L && two(4L)._2 == 666666L,
      s"authority ordering/floors wrong: $two")
  }

  test("ppr batch: each seed's slice equals the single-seed run") {
    import spark.implicits._
    val g = edges((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (5L, 6L), (6L, 1L))
    val batch = Ranking.personalizedPageRankBatch(
      g, Seq(1L, 5L).toDF("seed"), iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    Seq(1L, 5L).foreach { s =>
      val single = Ranking.personalizedPageRank(
        g, Seq(s).toDF("node"), iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val slice = batch.collect { case ((`s`, n), v) => n -> v }
      assert(slice == single, s"seed $s: batch $slice vs single $single")
    }
  }

  test("degree centralization: out-star 10^6, cycle 0, path floor ppm") {
    // out-star 1→{2,3,4}: dmax = 3, gaps 0+3+3+3 = 9 over (n−1)² = 9
    val star = Ranking.degreeCentralization(
      edges((1L, 2L), (1L, 3L), (1L, 4L))).collect()
    assert(star.length == 1)
    assert(star(0).getLong(0) == 4L && star(0).getLong(1) == 3L &&
      star(0).getLong(2) == 1000000L, s"star: ${star(0)}")
    // directed 3-cycle is out-regular: every gap is 0
    val cyc = Ranking.degreeCentralization(
      edges((1L, 2L), (2L, 3L), (3L, 1L))).collect()(0)
    assert(cyc.getLong(2) == 0L, s"cycle: $cyc")
    // path 1→2→3: only the sink gaps (1), ⌊10⁶·1/4⌋ = 250000
    val path = Ranking.degreeCentralization(
      edges((1L, 2L), (2L, 3L))).collect()(0)
    assert(path.getLong(0) == 3L && path.getLong(1) == 1L &&
      path.getLong(2) == 250000L, s"path: $path")
  }

  test("eigen: in-star concentrates on the hub, directed cycle stays uniform") {
    // in-star {2,3,4}→1 under the A+I shift: hub pins at 10⁶ while
    // spokes decay geometrically but never die (round 1: ⌊10⁶/4⌋ =
    // 250000, round 2: ⌊250000·10⁶/1750000⌋ = 142857, round 3:
    // ⌊142857·10⁶/1428571⌋ = 99999) — a DAG keeps a meaningful
    // ranking instead of collapsing to the zero vector
    val star = Ranking.eigenCentrality(
      edges((2L, 1L), (3L, 1L), (4L, 1L)), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star(1L) == 1000000L && Seq(2L, 3L, 4L).forall(star(_) == 99999L),
      s"in-star must concentrate: $star")
    // directed 3-cycle: each node's shifted sum is its own score plus
    // exactly its predecessor's — the uniform vector is the fixed
    // point at every round
    val cyc = Ranking.eigenCentrality(
      edges((1L, 2L), (2L, 3L), (3L, 1L)), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L).forall(cyc(_) == 1000000L), s"cycle drifted: $cyc")
    // two-in vs one-in: {1,2}→3, 1→4 after round 1: v(3)=3e6,
    // v(4)=2e6, sources v=1e6 → 10⁶ / 666666 / 333333
    val uneven = Ranking.eigenCentrality(
      edges((1L, 3L), (2L, 3L), (1L, 4L)), iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(uneven(3L) == 1000000L && uneven(4L) == 666666L &&
      uneven(1L) == 333333L && uneven(2L) == 333333L,
      s"floor ratios wrong: $uneven")
  }

  test("triad census: feedforward vs cycle separation, rotations counted once") {
    // 1→2→3 with shortcut 1→3: one FFL, no cycle
    val ffl = Ranking.triadCensus(edges((1L, 2L), (2L, 3L), (1L, 3L)))
      .collect()(0)
    assert((ffl.getLong(0), ffl.getLong(1)) == ((1L, 0L)))
    // directed 3-cycle: no FFL, ONE cycle (not three rotations)
    val cyc = Ranking.triadCensus(edges((1L, 2L), (2L, 3L), (3L, 1L)))
      .collect()(0)
    assert((cyc.getLong(0), cyc.getLong(1)) == ((0L, 1L)))
    // both at once, plus loop/duplicate noise that must not count
    val both = Ranking.triadCensus(edges((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (6L, 4L), (4L, 4L), (1L, 2L)))
      .collect()(0)
    assert((both.getLong(0), both.getLong(1)) == ((1L, 1L)))
  }

  test("cooccurrence: shared-item pair counts, frequent items capped out") {
    import spark.implicits._
    // items: 10 shared by {1,2,3}; 11 by {1,2}; 12 by {1,2} — so
    // (1,2) shares 3 items, (1,3)/(2,3) share 1
    val pairs = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 11L), (2L, 11L),
      (1L, 12L), (2L, 12L), (2L, 12L)).toDF("entity", "item")
    val all = Ranking.cooccurrence(pairs, maxItemDeg = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(all == Map((1L, 2L) -> 3L, (1L, 3L) -> 1L, (2L, 3L) -> 1L))
    // cap at 2 drops item 10 (3 holders) entirely
    val capped = Ranking.cooccurrence(pairs, maxItemDeg = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(capped == Map((1L, 2L) -> 2L))
    // minShared trims singleton overlaps
    val trimmed = Ranking.cooccurrence(pairs, maxItemDeg = 30, minShared = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(trimmed == Map((1L, 2L) -> 3L))
  }

  test("cooccurrence: duplicate-heavy items count toward the chunk estimate") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // item 100: 4 DISTINCT entities but 20 raw rows (entity 1 ×17).
    // With cap 5 it emits C(4,2)=6 real pairs; a raw-count FILTER
    // (c <= cap) would score it 0 and pick the unchunked branch over
    // budget — the r13 advice under-estimate. The clamped statistic
    // scores it C(5,2)=10 > budget 5, so the chunked branch engages.
    val rows = (1 to 17).map(_ => (1L, 100L)) ++
      Seq((2L, 100L), (3L, 100L), (4L, 100L))
    val pairs = rows.toDF("entity", "item")
    val single = Ranking.cooccurrence(pairs, maxItemDeg = 5)
      .collect().map(_.toSeq).toSet
    assert(single.size == 6)
    sys.props("graft.cooc.pair.budget") = "5"
    try {
      val out = Ranking.cooccurrence(pairs, maxItemDeg = 5)
      val p = out.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(p.contains("Union") && p.contains("Scan ExistingRDD"),
        s"duplicate-heavy input no longer reaches the chunked branch:\n$p")
      assert(out.collect().map(_.toSeq).toSet === single)
    } finally sys.props.remove("graft.cooc.pair.budget")
  }

  test("boundedDistinct: dedups, sorts ascending, truncates to the smallest limit") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.functions.BoundedSetAgg.boundedDistinct
    // duplicates collapse; output sorted ascending
    val df = Seq((1L, 5L), (1L, 3L), (1L, 5L), (1L, 9L), (1L, 1L),
      (2L, 7L)).toDF("g", "v")
    val full = df.groupBy("g").agg(boundedDistinct(col("v"), 10).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(full(1L) == Seq(1L, 3L, 5L, 9L) && full(2L) == Seq(7L))
    // limit keeps the SMALLEST values (the merge-safe semilattice);
    // a group returning exactly `limit` values signals overflow
    val capped = df.groupBy("g").agg(boundedDistinct(col("v"), 3).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(capped(1L) == Seq(1L, 3L, 5L))
    // distributed parity: many partitions, same result as one
    val wide = spark.range(0, 1000)
      .select((col("id") % 7).as("g"), (col("id") % 50).as("v"))
      .repartition(13)
    val a = wide.groupBy("g").agg(boundedDistinct(col("v"), 12).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = wide.coalesce(1).groupBy("g")
      .agg(boundedDistinct(col("v"), 12).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a == b)
    a.values.foreach(s => assert(s.size == 12 && s == s.sorted))
  }

  test("temporal paths: offset must increase, nodes distinct") {
    import spark.implicits._
    // 1→2 at offset 1; 2→3 at offset 2 (valid continuation);
    // 2→4 at offset 1 (NOT later than 1→2 — invalid); 3→1 at 5
    // would close a cycle back to the source (excluded by c≠a)
    val g = Seq((1L, 2L, 1L), (2L, 3L, 2L), (2L, 4L, 1L), (3L, 1L, 5L))
      .toDF("src", "dst", "offset")
    val r = graft.graph.Traversal.temporalPaths(g)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    // from 1: only 1→2→3 (offset 1<2); 2→4 fails the clock
    // from 2: 2→3→1... c=1 ≠ src=2 and ≠ b=3, offsets 2<5 → valid
    assert(r == Map(1L -> ((1L, 1L)), 2L -> ((1L, 1L))))
  }

  test("reciprocity: mutual pairs counted once, loops and duplicates ignored") {
    val g = edges((1L, 2L), (2L, 1L), (1L, 3L), (3L, 3L), (1L, 2L))
    val r = Ranking.reciprocity(g).collect()(0)
    // distinct non-loop edges {(1,2),(2,1),(1,3)}; one mutual pair;
    // ratio = ⌊2·10⁶·1/3⌋
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (3L, 1L, 666666L))
    // no mutual edges → ratio 0
    val dag = edges((1L, 2L), (2L, 3L))
    val r2 = Ranking.reciprocity(dag).collect()(0)
    assert((r2.getLong(0), r2.getLong(1), r2.getLong(2)) == (2L, 0L, 0L))
  }

  test("clustering coefficient: triangle+pendant wedge math; triangle-free graph is 0") {
    // triangle {1,2,3} + pendant 3—9: degrees (2,2,3,1) → wedges
    // Σd(d−1)/2 = 1+1+3+0 = 5, one triangle → 3·10⁶·1/5 = 600000
    val g = edges((1L, 2L), (2L, 3L), (3L, 1L), (3L, 9L))
    val r = Ranking.clusteringCoefficient(g).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (1L, 5L, 600000L))
    val sq = Ranking.clusteringCoefficient(
      edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))).collect()(0)
    assert(sq.getLong(0) == 0L && sq.getLong(2) == 0L)
  }

  test("degreePowerLaw: exact fit through a constructed two-point histogram") {
    // 1 node of out-degree 4 (hub 1→{2,3,4,5}); 4 nodes of out-degree
    // 1 (2→6, 3→6, 4→6, 5→6): histogram {(1,4), (4,1)} → the exact
    // line through (ln1, ln4) and (ln4, ln0⁺): slope = (0 − ln4)/(ln4
    // − 0) = −1, intercept = ln4 ≈ 1.3863
    val g = edges((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L),
      (2L, 6L), (3L, 6L), (4L, 6L), (5L, 6L))
      .withColumn("offset", org.apache.spark.sql.functions.lit(0L))
    val r = Ranking.degreePowerLaw(g).collect()(0)
    assert(r.getLong(0) == 2L)
    assert(math.abs(r.getDouble(1) - (-1.0)) < 1e-9, s"slope ${r.getDouble(1)}")
    assert(math.abs(r.getDouble(2) - 1.3863) < 1e-3, s"int ${r.getDouble(2)}")
  }

  test("sparsifyTopK: keeps the k heaviest out-edges, reports the cut") {
    import spark.implicits._
    val w = Seq((1L, 10L, 5L), (1L, 11L, 3L), (1L, 12L, 1L), (2L, 10L, 7L))
      .toDF("src", "dst", "weight")
    val r = Ranking.sparsifyTopK(w, k = 2).collect()
      .map(x => (x.getLong(0), x.getLong(3)) ->
        ((x.getLong(1), x.getLong(2), x.getLong(4), x.getLong(5)))).toMap
    // node 1: keeps (10, w5) then (11, w3); drops (12, w1); totals 3 edges / 9 weight
    assert(r == Map(
      (1L, 1L) -> ((10L, 5L, 3L, 9L)),
      (1L, 2L) -> ((11L, 3L, 3L, 9L)),
      (2L, 1L) -> ((10L, 7L, 1L, 7L))), s"$r")
  }

  test("neighborDegreeCurve: star graph hub sees leaves, leaves see hub") {
    // star 1—{2,3,4}: hub degree 3 with three degree-1 neighbors →
    // knn(3) = 10⁶; each leaf's single neighbor is the hub →
    // knn(1) = 3·10⁶
    val g = edges((1L, 2L), (1L, 3L), (1L, 4L))
    val r = Ranking.neighborDegreeCurve(g).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r == Map(1L -> ((3L, 3000000L)), 3L -> ((3L, 1000000L))), s"$r")
  }

  test("neighborhoodLadder: path graph cumulative pair counts and ppm") {
    import spark.implicits._
    // path 1->2->3->4, start at 1: depth 1 → {2}, depth 2 → {3},
    // depth 3 → {4}; cum shares 1/3, 2/3, 3/3
    val g = edges((1L, 2L), (2L, 3L), (3L, 4L))
      .withColumn("offset", org.apache.spark.sql.functions.lit(0L))
    val starts = Seq(1L).toDF("node")
    val r = Ranking.neighborhoodLadder(g, starts, maxDepth = 3).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
      .toMap
    assert(r == Map(
      1L -> ((1L, 1L, 333333L)),
      2L -> ((1L, 2L, 666666L)),
      3L -> ((1L, 3L, 1000000L))), s"$r")
  }

  test("localClustering: triangle+pendant per-node ppm, degree-1 nodes excluded") {
    // triangle {1,2,3} + pendant 3—9: nodes 1,2 have d=2 t=1 →
    // 2·10⁶·1/(2·1) = 10⁶; node 3 has d=3 t=1 → 2·10⁶/(3·2) =
    // 333333; node 9 (d=1) is excluded from the output
    val g = edges((1L, 2L), (2L, 3L), (3L, 1L), (3L, 9L))
    val r = Ranking.localClustering(g).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r == Map(
      1L -> ((2L, 1L, 1000000L)),
      2L -> ((2L, 1L, 1000000L)),
      3L -> ((3L, 1L, 333333L))))
    // K4: every node d=3, t=3 → 2·10⁶·3/6 = 10⁶ (fully clustered)
    val k4 = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val rk = Ranking.localClustering(k4).collect()
    assert(rk.length == 4 && rk.forall(_.getLong(3) == 1000000L))
    // square: 4 nodes of degree 2, zero triangles → lcc 0 everywhere
    val sq = Ranking.localClustering(
      edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))).collect()
    assert(sq.length == 4 && sq.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L))
  }

  test("assortativity: a star is perfectly disassortative (-1), regular graphs degenerate to 0") {
    val star = Ranking.assortativity(edges((1L, 2L), (1L, 3L), (1L, 4L))).collect()(0)
    assert(star.getDouble(3) == -1.0, s"star should be -1: $star")
    // 3-cycle: every degree equal → zero variance → guarded 0
    val cyc = Ranking.assortativity(edges((1L, 2L), (2L, 3L), (3L, 1L))).collect()(0)
    assert(cyc.getLong(2) == 0L && cyc.getDouble(3) == 0.0)
  }

  test("balance sample: min source keeps everything, rates inverse to token mass") {
    import spark.implicits._
    val rows = (1L to 2L).map(i => (i, "alpha beta", "small")) ++
      (11L to 40L).map(i => (i, "alpha beta", "large"))
    val d = rows.toDF("doc_id", "text", "source")
    val out = Sampling.balanceSample(d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // small: 2 docs × 2 tokens = min mass → rate 10⁶, keeps all
    assert(out("small") == (2L, 4L, 1000000L, 2L))
    // large: 30 docs × 2 tokens → rate ⌊10⁶·4/60⌋ = 66666; the md5
    // draw keeps SOME strict subset (binomial around 2 of 30)
    val (nd, nt, rate, kept) = out("large")
    assert((nd, nt, rate) == (30L, 60L, 66666L))
    assert(kept < nd)
    // deterministic: same input → same kept counts
    val again = Sampling.balanceSample(d).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(again("large") == kept && again("small") == 2L)
  }

  test("shardPlan: exact token mass, floor shares, purely deterministic") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "d e"), (3L, "f"), (4L, "g h"))
      .toDF("doc_id", "text")
    val r = Sampling.shardPlan(docs, nShards = 2).collect()
    // total 8 tokens across the 2 shards; every share is ⌊10⁶·n/8⌋
    assert(r.map(_.getLong(2)).sum == 8L)
    assert(r.map(_.getLong(1)).sum == 4L)
    r.foreach(x => assert(x.getLong(3) == 1000000L * x.getLong(2) / 8))
    // the md5 assignment is pure — a rerun is bit-identical
    val r2 = Sampling.shardPlan(docs, nShards = 2).collect()
    assert(r.toSeq.map(_.toSeq) == r2.toSeq.map(_.toSeq))
  }

  test("kTruss: K4 survives with support 2, a triangle+tail peels away at k=4") {
    // K4: every edge in exactly 2 triangles → the whole clique is the
    // 4-truss. A lone triangle (support 1 each) peels in round 1, and
    // its tail edge (support 0) with it.
    val g = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (10L, 11L), (11L, 12L), (12L, 10L), (12L, 13L))
    val r = Ranking.kTrussBounded(g, k = 4, rounds = 6).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(r.keySet == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    assert(r.values.toSet == Set(2L))
  }

  test("coreness: K4 nodes report 3, the tail reports 1, a triangle 2") {
    // K4 (4-clique) = 3-core; a pendant off node 4 is only 1; a
    // detached triangle is exactly the 2-core.
    val g = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 9L), (20L, 21L), (21L, 22L), (22L, 20L))
    val r = Ranking.coreness(g, maxK = 6, rounds = 8).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(r(_) == 3L), s"clique coreness: $r")
    assert(r(9L) == 1L)
    assert(Seq(20L, 21L, 22L).forall(r(_) == 2L), s"triangle coreness: $r")
  }

  test("weakTies: bridge edges score, triangle edges don't") {
    // triangle {1,2,3} + bridge 3-9: node 3 has 3 edges, 1 weak
    // (333333 ppm); 9 has 1 edge, all weak; 1 and 2 have none.
    val g = edges((1L, 2L), (2L, 3L), (3L, 1L), (3L, 9L))
    val r = Ranking.weakTies(g).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(3L) == ((3L, 1L, 333333L)))
    assert(r(9L) == ((1L, 1L, 1000000L)))
    assert(r(1L) == ((2L, 0L, 0L)) && r(2L) == ((2L, 0L, 0L)))
  }

  test("kTruss: k=3 keeps any triangle edge, drops bridges") {
    val g = edges((1L, 2L), (2L, 3L), (3L, 1L), (3L, 9L), (9L, 8L))
    val r = Ranking.kTrussBounded(g, k = 3, rounds = 6).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(r == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("maintainSupports: deletion delta ≡ from-scratch re-index") {
    import spark.implicits._
    // K4 + a pendant: delete edge (3,4) — every K4 edge loses the
    // triangles through it, the pendant edge is untouched
    val g = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 9L))
    val sup0 = Ranking.edgeSupportIndex(g).localCheckpoint(true)
    val removed = Seq((3L, 4L)).toDF("a", "b")
    val maintained = Ranking.maintainSupports(sup0, removed).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    val surviving = g.filter("NOT (src = 3 AND dst = 4)")
    val recomputed = Ranking.edgeSupportIndex(surviving).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(maintained == recomputed)
    // hand values: (1,2) still closes via 3 AND 4 → 2; (1,3)/(2,3)
    // close only via {1,2,3} → 1; (4,9) stays 0
    assert(maintained((1L, 2L)) == 2L)
    assert(maintained((1L, 3L)) == 1L && maintained((2L, 3L)) == 1L)
    assert(maintained((4L, 9L)) == 0L)
    // the incident-only branch (dispatched on graphs too big to
    // broadcast) produces the identical index
    val kept = sup0.join(removed, Seq("a", "b"), "left_anti")
      .localCheckpoint(true)
    val incident = Ranking.maintainSupportsIncident(kept, removed).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(incident == recomputed)
  }
  test("eccentricity: path graph depth-bounded, ball sizes exact") {
    import spark.implicits._
    // path 1->2->3->4->5; depth 3: ecc(1)=3 over {2,3,4}, ecc(4)=1 over {5};
    // sink 5 reaches nothing and is omitted
    val g = Seq((1L, 2L, 0L), (2L, 3L, 0L), (3L, 4L, 0L), (4L, 5L, 0L))
      .toDF("src", "dst", "offset")
    val starts = Seq(1L, 4L, 5L).toDF("node")
    val r = Ranking.eccentricity(g, starts, maxDepth = 3).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r == Map(1L -> ((3L, 3L)), 4L -> ((1L, 1L))))
  }

  test("katz: in-walk counting with 1/8 decay, hand-checked star") {
    // star: 1->3, 2->3, 3->4. After round 1: k(3)=1e6+2*125000=1250000,
    // k(4)=1125000. Round 2: k(3) unchanged (sources stay 1e6),
    // k(4)=1e6+1250000/8=1156250. Round 3: k(4)=1156250 again.
    val g = edges((1L, 3L), (2L, 3L), (3L, 4L))
    val r = Ranking.katz(g, iters = 3).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 1000000L, 2L -> 1000000L,
      3L -> 1250000L, 4L -> 1156250L))
  }

  test("richClub: K4 hub core is fully wired above the pendant degrees") {
    // K4 on {1,2,3,4} + pendants 5−1, 6−2:
    // degrees 1:4, 2:4, 3:3, 4:3, 5:1, 6:1
    val g = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 1L), (6L, 2L))
    val r = Ranking.richClub(g, ks = Seq(1, 2, 4)).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
      .toMap
    // k=1 and k=2: the club is exactly the K4 → φ = 6/(4·3/2) = 1
    assert(r(1L) == ((4L, 6L, 1000000L)))
    assert(r(2L) == ((4L, 6L, 1000000L)))
    // k=4: nobody has degree > 4
    assert(r(4L) == ((0L, 0L, 0L)))
  }

  test("attributeMixing: two same-class paths + one cross edge, hand values") {
    // class = node % 2; within-class edges (2,4),(4,6),(1,3),(3,5)
    // plus the single cross edge (2,1)
    val g = edges((2L, 4L), (4L, 6L), (1L, 3L), (3L, 5L), (2L, 1L))
    val r = Ranking.attributeMixing(g, n => n % 2).collect()(0)
    assert(r.getLong(0) == 10L)      // n_ends = 2·5
    assert(r.getLong(1) == 8L)       // same-class ends
    assert(r.getLong(2) == 800000L)  // homophily 0.8
    // c0 = c1 = 5 → r = (80 − 50)/(100 − 50) = 0.6
    assert(r.getLong(3) == 600000L)
  }

  test("squareCount: 4-cycle = 1, K4 = 3, triangle = 0") {
    def squares(e: Seq[(Long, Long)]) = {
      import spark.implicits._
      Ranking.squareCount(e.toDF("src", "dst")).collect().head.getLong(1)
    }
    assert(squares(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L)) == 1L)
    assert(squares(Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L,
      3L -> 4L)) == 3L)
    assert(squares(Seq(1L -> 2L, 2L -> 3L, 3L -> 1L)) == 0L)
  }

  test("salsa: degree-normalized push/pull, final ppm max-scaling") {
    // 1→3, 2→3: a(3) = ⌊10⁶/1⌋·2 = 2·10⁶; h(1)=h(2)=⌊2·10⁶/2⌋ = 10⁶
    // — stable across rounds, so hub 1,2 = 10⁶ / auth 3 = 10⁶.
    val r = Ranking.salsa(edges(1L -> 3L, 2L -> 3L), iters = 2).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r(1L) == ((1000000L, 0L)), s"$r")
    assert(r(2L) == ((1000000L, 0L)))
    assert(r(3L) == ((0L, 1000000L)))
  }

  test("salsa vs hits: a flooding hub is suppressed by degree normalization") {
    // hub 1 → {10,11,12,13}; focused 2 → {10}. Under HITS node 1's
    // full score floods each target; under SALSA each gets 1/4 of it.
    val e = edges(1L -> 10L, 1L -> 11L, 1L -> 12L, 1L -> 13L, 2L -> 10L)
    val s = Ranking.salsa(e, iters = 2).collect()
      .map(x => x.getLong(0) -> x.getLong(2)).toMap
    // round 2: a(10) = ⌊1375000/4⌋+625000 = 968750 → scales to 10⁶;
    // a(11..13) = 343750 → ⌊343750·10⁶/968750⌋ = 354838
    assert(s(10L) == 1000000L && s(11L) == 354838L, s"$s")
  }

}
