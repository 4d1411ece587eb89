package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Similarity

/** ANN quality harness: recall of the LSH- and IVF-bucketed paths
  * against brute-force cosine ground truth on the sf0.001 embeddings
  * table (500 × 64d). The synthetic embeddings are near-isotropic
  * (pairwise cosine mean ≈ 0, max ≈ 0.35), so top-3 "neighbors" sit
  * at the noise floor — the interesting guarantees are (a) the
  * recall-vs-nProbe tradeoff curve, (b) probing every list reduces
  * IVF to exact brute force (recall 1.0), and (c) the LSH dedup
  * blocker keeps high pair-recall where real structure exists
  * (cosine ≥ τ near-dup pairs). Measured numbers go to SURVEY.md.
  */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  private val dir = "/root/testdata/sf0.001"

  private def emb = Tables.embeddings(spark, dir)
  private val queryPred = col("vec_id") % 100 === 0

  private def neighbors(df: DataFrame, queries: Set[Long]): Map[Long, Set[Long]] =
    df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .filter { case (q, _) => queries.contains(q) }
      .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }

  private def recall(ann: Map[Long, Set[Long]], gt: Map[Long, Set[Long]]): Double = {
    val per = gt.map { case (q, truth) =>
      ann.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    per.sum / per.size
  }

  test("IVF recall@3 rises with nProbe and hits 1.0 at nProbe = nCentroids") {
    val gtDf = Similarity.topKCosine(emb, queryPred, k = 3)
    val queries = gtDf.select("query_id").distinct().collect()
      .map(_.getLong(0)).toSet
    val gt = neighbors(gtDf, queries)
    assert(gt.nonEmpty)

    val curve = Seq(2, 4, 8, 16).map { nProbe =>
      val r = recall(
        neighbors(Similarity.ivfTopK(emb, queryPred, k = 3, nProbe = nProbe), queries), gt)
      nProbe -> r
    }
    info(curve.map { case (p, r) => f"nProbe=$p recall=$r%.3f" }.mkString("  "))
    // Probing every list makes the candidate set the whole corpus →
    // IVF degenerates to exact brute force.
    assert(curve.last._2 == 1.0)
    // More probes never lose recall (same rerank, superset candidates).
    curve.sliding(2).foreach { case Seq((_, a), (_, b)) => assert(b >= a) }
    assert(curve.head._2 >= 0.3, s"nProbe=2 recall ${curve.head._2} collapsed")

    val rSeed = recall(
      neighbors(Similarity.ivfTopK(emb, queryPred, k = 3, iters = 0), queries), gt)
    val rLsh = recall(neighbors(Similarity.lshTopK(emb, k = 3), queries), gt)
    info(f"ivf(seed-centroids)=$rSeed%.3f lsh(8 planes)=$rLsh%.3f")
  }

  test("LSH dedup blocker: pair-recall vs exact all-pairs at tau=0.4") {
    // Exact ground truth: every pair with cosine >= 0.4 under the
    // operator's exact scoring contract (quantized integer dot, 4dp
    // rounding) — 500² is trivial here; at scale this is exactly what
    // you cannot run, which is the point of the blocked operator.
    val v = Similarity.withNorm(emb)
    val exact = v.as("x").join(v.as("y"), col("x.vec_id") < col("y.vec_id"))
      .withColumn("cos", org.apache.spark.sql.functions.floor(
        graft.functions.VectorOps.dotLong(col("x.qv"), col("y.qv"))
          / (col("x.nrm") * col("y.nrm")) * 10000 + 0.5) / 10000)
      .filter(col("cos") >= 0.4)
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = Similarity.embeddingNearDup(emb, threshold = 0.4)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(blocked.subsetOf(exact)) // no false positives: rerank is exact
    val rec = if (exact.isEmpty) 1.0 else blocked.size.toDouble / exact.size
    info(f"near-dup pair recall @tau=0.4: $rec%.3f (${blocked.size}/${exact.size})")
    assert(rec >= 0.5, s"LSH dedup pair recall $rec collapsed")
  }

  test("streamed and band-chunked rerank are bit-identical to the single pass") {
    // Force both scale dispatches (the sf10 disk-fill path in
    // miniature): a 1-pair budget alone → streamed broadcast rerank;
    // additionally zeroing the broadcast-row budget → per-band
    // sequential chunks. The output contract is set equality of FULL
    // rows — cosine included, so the final distinct provably
    // collapses duplicate scorings of the same deterministic value.
    def rows(df: DataFrame): Set[(Long, Long, Double)] = df.collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("cosine"))).toSet
    val single = rows(Similarity.embeddingNearDup(emb, threshold = 0.4))
    assert(single.nonEmpty)
    sys.props("graft.emb.pair.budget") = "1"
    try {
      val streamed = rows(Similarity.embeddingNearDup(emb, threshold = 0.4))
      assert(streamed == single)
      // ~3.6k pairs/band at sf0.001: a 2000-pair budget still forces
      // the chunked branch AND the hot-band bucket-hash sub-split
      // (each band → 2 sub-chunks) without degenerating into one
      // checkpoint job per bucket the way budget=1 would
      sys.props("graft.emb.pair.budget") = "2000"
      sys.props("graft.emb.bcast.rows") = "0"
      val chunked = rows(Similarity.embeddingNearDup(emb, threshold = 0.4))
      assert(chunked == single)
      // non-broadcastable vectors but measured pairs under budget
      // (~86k total at sf0.001) → the occupancy-gated pre-distinct
      // plan, the one branch the two dispatches above skip
      sys.props("graft.emb.pair.budget") = "100000"
      val preDistinct = rows(Similarity.embeddingNearDup(emb, threshold = 0.4))
      assert(preDistinct == single)
    } finally {
      sys.props.remove("graft.emb.pair.budget")
      sys.props.remove("graft.emb.bcast.rows")
    }
  }

  test("IVF recall@3 on clustered embeddings: high recall at nProbe << nCentroids") {
    import spark.implicits._
    // Planted structure: 8 well-separated centers (orthogonal dim
    // blocks), 25 points each, deterministic small noise. Unlike the
    // near-isotropic sf0.001 table — where top-3 sits at the noise
    // floor — real neighbors here share a cluster, so recall at small
    // nProbe is a meaningful claim. vec_id % 8 = cluster, so the
    // deterministic seeds (first 8 ids) start one per cluster.
    val dim = 64; val nClusters = 8; val perCluster = 25
    def vec(id: Long): Array[Float] = {
      val c = (id % nClusters).toInt
      Array.tabulate(dim) { i =>
        val center = if (i / 8 == c) 8.0 else 0.0
        val noise = ((id * 31 + i * 17) % 13 - 6) * 0.02
        (center + noise).toFloat
      }
    }
    val df = (0L until (nClusters * perCluster).toLong).map(id => (id, vec(id)))
      .toDF("vec_id", "embedding")
    val qp = col("vec_id") % 25 === 0
    val gtDf = Similarity.topKCosine(df, qp, k = 3)
    val queries = gtDf.select("query_id").distinct().collect().map(_.getLong(0)).toSet
    val gt = neighbors(gtDf, queries)
    assert(gt.nonEmpty)
    val curve = Seq(1, 2, 4).map { nProbe =>
      nProbe -> recall(neighbors(
        Similarity.ivfTopK(df, qp, k = 3, nCentroids = 8, nProbe = nProbe), queries), gt)
    }
    val rLsh = recall(neighbors(Similarity.lshTopK(df, k = 3), queries), gt)
    info(curve.map { case (p, r) => f"nProbe=$p recall=$r%.3f" }.mkString("  ") +
      f"  lsh(8 planes)=$rLsh%.3f")
    // nProbe=2 of 8 lists (a quarter of the corpus probed) must
    // recover ≥ 0.9 of true top-3 — the clustered-data guarantee the
    // isotropic table cannot express.
    assert(curve(1)._2 >= 0.9, s"clustered IVF recall ${curve(1)._2} at nProbe=2")
    curve.sliding(2).foreach { case Seq((_, a), (_, b)) => assert(b >= a) }

    // the auto form sizes itself: n=200 → ⌈√200⌉=15 centroids,
    // nProbe=2; on clustered data it must stay near the fixed-8 curve
    val rAuto = recall(neighbors(Similarity.ivfTopKAuto(df, qp, k = 3), queries), gt)
    info(f"auto (15 lists, 2 probes) recall=$rAuto%.3f")
    assert(rAuto >= 0.8, s"auto-sized IVF recall $rAuto")
  }

  test("bandingFor scales planes with corpus size and keeps the recall S-curve") {
    // r (planes/band) must grow with n — fixed banding is the measured
    // 10×-scale killer (24×5: 3.5 s at 2k vectors, 105 s at 20k)
    val picks = Seq(2000L, 20000L, 200000L, 2000000L)
      .map(n => Similarity.bandingFor(n, 0.4))
    info(picks.map { case (b, r) => s"${b}x$r" }.mkString("  "))
    picks.map(_._2).sliding(2).foreach { case Seq(a, b) => assert(b >= a) }
    // every pick satisfies the recall target under the S-curve model
    val s = 1.0 - math.acos(0.4) / math.Pi
    picks.foreach { case (bands, r) =>
      val recall = 1.0 - math.pow(1.0 - math.pow(s, r.toDouble), bands.toDouble)
      assert(recall >= 0.9, s"($bands,$r) model recall $recall")
    }
    // at a high (true near-dup) threshold the signature stays small
    val (bHi, rHi) = Similarity.bandingFor(2000000L, 0.9)
    assert(bHi * rHi <= 24 * 10, s"tau=0.9 pick ($bHi,$rHi) over-sized")

    // the auto variant stays exact-subset correct on the real table
    val auto = Similarity.embeddingNearDupAuto(emb, threshold = 0.4)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val v = Similarity.withNorm(emb)
    val exact = v.as("x").join(v.as("y"), col("x.vec_id") < col("y.vec_id"))
      .withColumn("cos", org.apache.spark.sql.functions.floor(
        graft.functions.VectorOps.dotLong(col("x.qv"), col("y.qv"))
          / (col("x.nrm") * col("y.nrm")) * 10000 + 0.5) / 10000)
      .filter(col("cos") >= 0.4)
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto.subsetOf(exact))
    val rec = if (exact.isEmpty) 1.0 else auto.size.toDouble / exact.size
    info(f"auto-banded pair recall @tau=0.4: $rec%.3f (${auto.size}/${exact.size})")
    assert(rec >= 0.5)
  }

  test("jittered twins plant τ=0.9 positives and the cost-model banding finds them") {
    // every (original, twin) pair must land at cosine ≈ 1/√E[f²] ≈ 0.96
    // and NO other pair may cross 0.9 (raw corpus max cosine ≈ 0.51)
    val twinned = Similarity.withJitteredTwins(emb)
    val v = Similarity.withNorm(twinned).filter(col("nrm") > 0)
    val nOrig = v.filter(col("vec_id") < Similarity.TwinIdOffset).count()
    val exact = v.as("x").join(v.as("y"), col("x.vec_id") < col("y.vec_id"))
      .withColumn("cos",
        graft.functions.VectorOps.dotLong(col("x.qv"), col("y.qv"))
          / (col("x.nrm") * col("y.nrm")))
      .filter(col("cos") >= 0.9)
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "no planted pair crossed tau=0.9")
    assert(exact.forall { case (a, b) => b == a + Similarity.TwinIdOffset },
      s"non-twin pair above 0.9: ${exact.filterNot { case (a, b) => b == a + Similarity.TwinIdOffset }}")
    assert(exact.size == nOrig, s"${exact.size} twin pairs for $nOrig originals")

    // the gate's operating point: bandingFor at the pinned scale n
    val (bands, planes) = graft.queries.PipelineEntries.AutoBanding
    info(s"pinned-200k tau=0.9 banding: ${bands}x$planes")
    assert(bands * planes <= 120, "tau=0.9 signature should be <= the 24x5 default")
    val found = Similarity.embeddingNearDup(twinned, 0.9, bands, planes)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(found.subsetOf(exact))
    val rec = found.size.toDouble / exact.size
    info(f"banded twin-pair recall @tau=0.9: $rec%.3f (${found.size}/${exact.size})")
    assert(rec >= 0.9, f"S-curve promises >= 0.9 recall, got $rec%.3f")
  }

  test("partial top-k aggregate == window row_number formulation, ties included") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TopKAgg
    // deterministic pseudo-random scores with DELIBERATE 6dp ties so
    // the id tiebreak is exercised; many groups, k smaller than group
    val rows = for (g <- 0L until 20L; i <- 0L until 30L) yield {
      // dense ties plus sprinkled NULL scores (the zero-norm-vector
      // case): window `desc` puts them LAST — the aggregate must too
      val score = if ((g + i) % 11 == 0) None
        else Some(((g * 31 + i * 17) % 7).toDouble / 7.0)
      (g, i, score)
    }
    val df = rows.toDF("query_id", "cand", "cos").repartition(8)
    val viaAgg = df.groupBy("query_id")
      .agg(TopKAgg.topK(col("cos"), col("cand"), 5).as("top"))
      .select(col("query_id"), org.apache.spark.sql.functions.posexplode(col("top")))
      .select(col("query_id"), col("col.id").as("cand"),
        org.apache.spark.sql.functions.round(col("col.score"), 4).as("cos"),
        (col("pos") + 1).as("rnk"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getInt(3))).toSet
    val viaWindow = df
      .withColumn("rnk", org.apache.spark.sql.functions.row_number().over(
        Window.partitionBy("query_id")
          .orderBy(org.apache.spark.sql.functions.round(col("cos"), 6).desc, col("cand"))))
      .filter(col("rnk") <= 5)
      .select(col("query_id"), col("cand"),
        org.apache.spark.sql.functions.round(col("cos"), 4).as("cos"), col("rnk"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getInt(3))).toSet
    assert(viaAgg == viaWindow)
  }

  test("trained centroids are means of their members (fixture)") {
    import spark.implicits._
    // Two obvious clusters around (0,…) and (10,…): after one Lloyd
    // round from seeds {0,1} the centroids must be the cluster means.
    val dim = 64
    def vec(base: Double) = Array.tabulate(dim)(i => (base + (i % 3) * 0.01).toFloat)
    val rows = Seq(
      (0L, vec(0.0)), (1L, vec(10.0)),
      (2L, vec(0.2)), (3L, vec(0.1)), (4L, vec(9.8)), (5L, vec(10.2)))
    val df = rows.toDF("vec_id", "embedding")
    // centroids live in the 10^6-quantized integer space: floor of the
    // per-dim mean of round(x*1e6)
    val cents = Similarity.kmeansCentroids(df, k = 2, iters = 1)
      .collect().map(r => r.getAs[Long]("cid") ->
        r.getAs[scala.collection.Seq[Long]]("cv").head).toMap
    assert(math.abs(cents(0L) - 100000L) <= 1L)    // mean(0.0, 0.2, 0.1)·1e6
    assert(math.abs(cents(1L) - 10000000L) <= 1L)  // mean(10.0, 9.8, 10.2)·1e6
  }

  test("k-means trains on non-64-dim embeddings (width read from data)") {
    import spark.implicits._
    // 8-dim corpus: a hardcoded width would aggregate out-of-range
    // getItem = null into the centroid arrays (regression gate)
    def vec(base: Double) = Array.tabulate(8)(i => (base + i * 0.01).toFloat)
    val df = Seq((0L, vec(0.0)), (1L, vec(5.0)), (2L, vec(0.1)), (3L, vec(4.9)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(df, k = 2, iters = 1)
      .collect().map(r => r.getAs[scala.collection.Seq[Long]]("cv"))
    assert(cents.length == 2)
    assert(cents.forall(cv => cv.length == 8 && cv.forall(_ != null)),
      s"centroids must be 8 non-null entries: ${cents.toSeq}")
  }

  test("semanticDedup drops in-cluster near-dups onto their smallest anchor") {
    import spark.implicits._
    val dim = 64
    def vec(base: Double, jit: Double = 0.0) =
      Array.tabulate(dim)(i => (base + (i % 3) * 0.01 + (if (i == 0) jit else 0.0)).toFloat)
    // cluster A near 1.0: ids 0,2,3 are ~identical (cos ≈ 1); cluster
    // B near 10.0: ids 1,4 identical-direction too. Seeds {0,1}.
    val df = Seq(
      (0L, vec(1.0)), (1L, vec(10.0)),
      (2L, vec(1.0, 0.02)), (3L, vec(1.0, 0.04)), (4L, vec(10.0, 0.1)))
      .toDF("vec_id", "embedding")
    val r = Similarity.semanticDedup(df, threshold = 0.999, k = 2, iters = 1)
      .collect().map(x => x.getLong(0) ->
        (x.getAs[Long]("cid"), x.getAs[Long]("anchor_id"))).toMap
    // 0 survives (smallest in its cluster); 2 and 3 both anchor to 0,
    // never to each other; 4 anchors to 1 across the other cluster
    assert(r.keySet == Set(2L, 3L, 4L))
    assert(r(2L)._2 == 0L && r(3L)._2 == 0L && r(4L)._2 == 1L)
    // direction-orthogonal-ish pairs across clusters never pair up:
    // every anchor shares the vector's own cluster id
    assert(r.values.forall { case (cid, _) => cid == 0L || cid == 1L })
    // cluster-boundedness: at a lax threshold the cross-cluster pair
    // (0,1) still cannot appear — pairs form within cid only
    val lax = Similarity.semanticDedup(df, threshold = 0.0, k = 2, iters = 1)
      .collect().map(x => (x.getAs[Long]("anchor_id"), x.getLong(0))).toSet
    assert(!lax.contains((0L, 1L)) && !lax.contains((1L, 0L)))
  }

  test("product quantization: per-subspace codes separate per-subspace clusters") {
    import spark.implicits._
    // 4-dim, m=2 subspaces of 2 dims. First subspace separates
    // {0,1,4} (near [1,0]) from {2,3,5} (near [0,1]); the SECOND
    // subspace groups them differently ({0,1,2,3} vs {4,5}) — PQ must
    // code the two subspaces independently.
    val rows = Seq(
      (0L, Array(1.0f, 0.0f, 1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f, 1.0f, 0.1f)),
      (3L, Array(0.1f, 0.9f, 0.8f, 0.0f)),
      (4L, Array(1.0f, 0.1f, 0.0f, 1.0f)),
      (5L, Array(0.0f, 0.9f, 0.1f, 1.0f)))
    val d = rows.toDF("vec_id", "embedding")
    val pq = Similarity.productQuantize(d, m = 2, k = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(pq.size == 12) // 6 vecs × 2 subspaces
    // subspace 0: {0,1,4} share a code, {2,3,5} share the other
    val s0 = (0 to 5).map(i => pq((i.toLong, 0)))
    assert(s0(0) == s0(1) && s0(0) == s0(4))
    assert(s0(2) == s0(3) && s0(2) == s0(5))
    assert(s0(0) != s0(2))
    // subspace 1: {0,1,2,3} vs {4,5} — a DIFFERENT partition
    val s1 = (0 to 5).map(i => pq((i.toLong, 1)))
    assert(Set(s1(0), s1(1), s1(2), s1(3)).size == 1)
    assert(s1(4) == s1(5) && s1(0) != s1(4))
    // exact-distance column: a vector equal to its codeword has dist 0
    val dists = Similarity.productQuantize(d, m = 2, k = 2, iters = 2)
      .collect().map(r => r.getLong(3))
    assert(dists.forall(_ >= 0L))
  }

  test("signed projection: dim-agnostic, exactly linear, zero maps to zero") {
    import spark.implicits._
    // 4-dim fixture (width must come from the data, not a constant);
    // quarters quantize exactly, so 2× input ⇒ exactly 2× projection
    val d = Seq(
      (1L, Array(0.25f, 0.5f, -0.25f, 0.75f)),
      (2L, Array(0.5f, 1.0f, -0.5f, 1.5f)),
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val p = Similarity.projectSigned(d, outDims = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(p.size == 12) // 3 vecs × 4 output dims
    (0 until 4).foreach { j =>
      assert(p((3L, j)) == 0L, s"zero vector projects nonzero at $j")
      assert(p((2L, j)) == 2L * p((1L, j)), s"projection not linear at $j")
    }
    assert((0 until 4).exists(j => p((1L, j)) != 0L), "weights degenerate")
    // deterministic across invocations
    val again = Similarity.projectSigned(d, outDims = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(again == p)
  }

  test("clusterSummary: two tight groups split cleanly, every vector counted") {
    import spark.implicits._
    // seeds are vec_id 0 (x-axis) and 1 (y-axis); 2,4 join 0 and 3,5
    // join 1 — sizes 3/3, and the within-group spread is tiny next to
    // the cross-group distance.
    val d = Seq(
      0L -> Seq(1.00f, 0.00f), 2L -> Seq(0.98f, 0.02f), 4L -> Seq(0.99f, 0.01f),
      1L -> Seq(0.00f, 1.00f), 3L -> Seq(0.02f, 0.98f), 5L -> Seq(0.01f, 0.99f))
      .toDF("vec_id", "embedding")
    val r = Similarity.clusterSummary(d, k = 2, iters = 1).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r.keySet == Set(0L, 1L))
    assert(r.values.map(_._1).sum == 6L)
    assert(r(0L)._1 == 3L && r(1L)._1 == 3L)
    // centroid ≈ group mean → avg squared quantized dist well under
    // one cross-group hop (~2e12); within-group it's ~1e8-scale
    assert(r.values.forall(_._2 < 1000000000L), s"inertia too large: $r")
  }
  test("normStats: exact quantized norms, zero vectors counted") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f), 0),          // qx [1000000, 0] -> n2 = 1e12
      (2L, Seq(0.0f, 0.0f), 0),          // zero vector
      (3L, Seq(0.0f, 2.0f), 1))          // n2 = 4e12
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.normStats(emb).collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5))))
      .toMap
    assert(r(0L) == ((2L, 1L, 0L, 1000000000000L, 500000000000L)))
    assert(r(1L) == ((1L, 0L, 4000000000000L, 4000000000000L, 4000000000000L)))
  }

  test("annRecallAudit: per-query recall bounded, consistent, non-degenerate") {
    val r = Similarity.annRecallAudit(emb, queryPred, k = 3).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      val (t, h, ppm) = (x.getLong(1), x.getLong(2), x.getLong(3))
      assert(h >= 0 && h <= t, s"hits out of range: ${x.toSeq}")
      assert(ppm == 1000000L * h / t, s"ppm formula: ${x.toSeq}")
    }
    // on the raw near-isotropic corpus the true top-3 sit at the
    // noise floor, so zero recall is HONEST — the non-degeneracy
    // check runs on the planted-twin corpus instead, where each
    // query's true top-1 is its cosine≈0.96 twin and the 8-plane
    // bucket keeps it with high probability
    val twins = Similarity.withJitteredTwins(emb)
    val r2 = Similarity.annRecallAudit(twins, queryPred, k = 1).collect()
    assert(r2.map(_.getLong(2)).sum > 0,
      "LSH recovered zero planted twins at cosine 0.96")
  }

  test("dimProfile: hand means and exact variance, flat dim reads zero") {
    import spark.implicits._
    // dim 0: qx {1e6, 3e6} → mean 2e6, var = ((2·(1e12+9e12) − 16e12)/4)
    //   = (20e12−16e12)/4 = 1e12; dim 1: both 0.5 → qx 5e5 flat, var 0
    val d = Seq((1L, Seq(1.0f, 0.5f)), (2L, Seq(3.0f, 0.5f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.dimProfile(d).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r(0L) == ((2000000L, 1000000000000L)), s"$r")
    assert(r(1L) == ((500000L, 0L)), s"$r")
  }

  test("labelDrift: orthogonal label means near 0, aligned near 1") {
    import spark.implicits._
    // label 0 = x-axis cluster, label 1 = y-axis, label 2 = x-axis
    // again → cos(0,1) ≈ 0, cos(0,2) ≈ 1, cos(1,2) ≈ 0
    val d = Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(0.9f, 0.1f), 0),
      (3L, Seq(0.0f, 1.0f), 1), (4L, Seq(0.1f, 0.9f), 1),
      (5L, Seq(1.0f, 0.05f), 2))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.labelDrift(d).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2)).toMap
    assert(r((0L, 1L)) < 0.2, s"$r")
    assert(r((0L, 2L)) > 0.98, s"$r")
    assert(r((1L, 2L)) < 0.2, s"$r")
    // a zero-vector-only label has no direction and is excluded
    val z = d.unionByName(Seq((6L, Seq(0.0f, 0.0f), 3)).toDF("vec_id", "embedding", "label"))
    val keys = Similarity.labelDrift(z).collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(!keys.exists(k => k._1 == 3L || k._2 == 3L))
  }

  test("knnPurity: coherent clusters score pure, a planted mislabel doesn't") {
    import spark.implicits._
    // two tight direction-clusters; label 0 = x-axis, label 1 =
    // y-axis — except vec 12, which sits in the y cluster with label
    // 0. Queries = ids % 2 == 0 (6 of 12). k=3 majorities: x-cluster
    // queries see x neighbors (label 0, pure); query 12's neighbors
    // are y vectors labeled 1 ≠ own 0 (impure).
    val xs = (0L to 5L).map(i => (i * 2, Seq(1.0f, (i * 0.01f)), 0))
    val ys = (0L to 4L).map(i => (i * 2 + 1, Seq((i * 0.01f), 1.0f), 1))
    val planted = Seq((12L, Seq(0.02f, 1.0f), 0))
    val d = (xs ++ ys ++ planted).toDF("vec_id", "embedding", "label")
    val r = Similarity.knnPurity(d, col("vec_id") % 2 === 0, k = 3)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    // label-0 queries: 0,2,4,6,8,10 pure; 12 impure → 6/7
    assert(r(0L) == ((7L, 6L, 857142L)), s"$r")
  }

  test("pcaTopComponent: recovers the dominant direction exactly") {
    import spark.implicits._
    // variance only along dim 0 → v = (10⁶, 0)
    val axis = Seq(
      (1L, Array(0.000001, 0.0)), (2L, Array(-0.000001, 0.0)),
      (3L, Array(0.000002, 0.0)), (4L, Array(-0.000002, 0.0)))
      .toDF("vec_id", "embedding")
    val r1 = Similarity.pcaTopComponent(axis).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r1 == Map(0L -> 1000000L, 1L -> 0L), s"$r1")
    // diagonal y=x cloud → both coordinates saturate at 10⁶
    val diag = Seq(
      (1L, Array(0.000001, 0.000001)), (2L, Array(-0.000002, -0.000002)),
      (3L, Array(0.000003, 0.000003)))
      .toDF("vec_id", "embedding")
    val r2 = Similarity.pcaTopComponent(diag).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r2 == Map(0L -> 1000000L, 1L -> 1000000L), s"$r2")
  }

  test("cosineHistogram: adjacent-pair deci-buckets") {
    import spark.implicits._
    // pairs (1,2) cos=1 → bucket 10; (2,3) cos=0 → 0; (3,4) cos=−1 → −10
    val emb = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(1.0, 0.0)),
      (3L, Array(0.0, 1.0)), (4L, Array(0.0, -1.0)))
      .toDF("vec_id", "embedding")
    val r = Similarity.cosineHistogram(emb).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(-10L -> 1L, 0L -> 1L, 10L -> 1L), s"$r")
  }

  test("centroidOutliers: farthest from the truncating mean, tie-broken") {
    import spark.implicits._
    // quantized coords 0, 0, 0, 8: centroid = 8/4 = 2 → d² = 4,4,4,36
    val emb = Seq(
      (1L, Array(0.0, 0.0)), (2L, Array(0.0, 0.0)),
      (3L, Array(0.0, 0.0)), (4L, Array(0.000008, 0.0)))
      .toDF("vec_id", "embedding")
    val r = Similarity.centroidOutliers(emb, k = 3).collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    assert(r.toList == List((4L, 36L), (1L, 4L), (2L, 4L)), s"${r.toList}")
  }

  test("coresetKCenter: farthest-first order on a 1-D line") {
    import spark.implicits._
    // points 0, 1, 10, 21 on a line (2nd dim 0): seed = min id (at 0),
    // then farthest-first picks 21 (d²=441), 10 (min(100,121)=100), 1 (d²=1)
    val emb = Seq(
      (1L, Array(0.0, 0.0)), (2L, Array(0.000001, 0.0)),
      (3L, Array(0.00001, 0.0)), (4L, Array(0.000021, 0.0)))
      .toDF("vec_id", "embedding")
    val r = Similarity.coresetKCenter(emb, k = 4).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.toList == List((1L, 1L, 0L), (2L, 4L, 441L),
      (3L, 3L, 100L), (4L, 2L, 1L)), s"${r.toList}")
  }

  test("rangeSearch: exact integer threshold at cosine 0.3") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0, 0.0)),    // the query
      (1L, Array(1.0, 0.1)),    // cos ≈ 0.995 → in range
      (2L, Array(0.5, 0.5)),    // cos ≈ 0.707 → in range
      (3L, Array(0.0, 1.0)),    // cos 0 → out
      (4L, Array(-1.0, 0.0)))   // cos −1 → out (dot ≤ 0 guard)
      .toDF("vec_id", "embedding")
    val r = Similarity.rangeSearch(emb, col("vec_id") === 0).collect()
    assert(r.length == 1)
    assert(r.head.getLong(0) == 0L && r.head.getLong(1) == 2L)
    assert(r.head.getDouble(2) == 0.995)  // 1/√1.01 @4dp
  }

  test("truncate fidelity: identical-half pairs sit on the diagonal, divergent halves off it") {
    import spark.implicits._
    val df = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),   // (0,1): full cos 1.0 -> (10, 10)
      (1L, Array(1f, 0f, 0f, 0f)),   // (1,2): full 0.707 -> (7, 10)
      (2L, Array(1f, 0f, 1f, 0f)),   // (2,3): full 0.0, half 1.0 -> (0, 10)
      (3L, Array(1f, 0f, -1f, 0f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.truncateFidelity(df).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toList
    assert(r == List((0L, 10L, 1L), (7L, 10L, 1L), (10L, 10L, 1L)), s"$r")
  }

}
