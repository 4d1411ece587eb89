package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Similarity search over an embedding column (SURVEY.md §2 D5–D7).
  *
  * Vectors stay as array columns end-to-end: dot products are
  * `zip_with` + `aggregate` higher-order functions (codegen'd, no
  * UDF, no explode → no 64× row blowup on the hot path). The ANN
  * scale path buckets by deterministic random-hyperplane signs so
  * the pair space shrinks from O(n²) to O(n²/256) before any exact
  * scoring.
  */
object Similarity {

  /** Dot product of two double-array columns: fused native Catalyst
    * expression (graft.functions.DotProduct) — one primitive codegen
    * loop, no intermediate array. Summation order matches the
    * composable `aggregate(zip_with(...))` form exactly (sequential
    * in array order), so results are bit-identical. */
  def dot(a: Column, b: Column): Column = VectorOps.dotNative(a, b)

  /** Euclidean norm of a double-array column. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Embeddings with precomputed norm: (vec_id, v, nrm). */
  def withNorm(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))

  /** D6 brute-force cosine top-k for a query subset: query rows ×
    * corpus with array-local dot products; ranking on the rounded
    * cosine keeps cross-engine order stable. The corpus side is the
    * big side — Catalyst broadcasts the (small) query side.
    */
  def topKCosine(emb: DataFrame, queryPred: Column, k: Int = 5): DataFrame = {
    val v = withNorm(emb)
    val q = v.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val pairs = v.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
    pairs
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(round(col("cos"), 6).desc, col("vec_id"))))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 4).as("cosine"), col("rnk"))
      .orderBy("query_id", "rnk")
  }

  /** Deterministic pseudo-random hyperplane weight for (plane j,
    * dim i), identical formula in the DuckDB oracle: a centered
    * residue of a Knuth-style multiplicative hash. */
  def planeWeightSql(j: Int, i: String): String =
    s"((($j * 64 + $i + 1) * 2654435761) % 97 - 48)"

  private def planeWeight(j: Int, i: Column): Column =
    ((lit(j) * 64 + i + 1) * lit(2654435761L)) % 97 - 48

  /** 8-bit LSH bucket from random-hyperplane sign bits. The
    * projection is rounded before the sign test so FP noise cannot
    * flip a bucket between engines. */
  def lshBucket(emb: DataFrame, planes: Int = 8): DataFrame = {
    val v = withNorm(emb)
    val proj = (0 until planes).map { j =>
      val p = aggregate(
        zip_with(col("v"), sequence(lit(0), lit(63)),
          (x, i) => x * planeWeight(j, i).cast("double")),
        lit(0.0), (acc, x) => acc + x)
      when(round(p, 6) > 0, 1L << j).otherwise(0L)
    }
    v.withColumn("bucket", proj.reduce(_ + _))
  }

  /** D7 LSH-bucketed ANN: exact cosine within each bucket only,
    * top-k per query among same-bucket candidates. At scale the
    * bucket id is the shuffle key; bucket population is ~n/2^planes.
    */
  def lshTopK(emb: DataFrame, k: Int = 3): DataFrame = {
    val b = lshBucket(emb)
    val pairs = b.as("x").join(b.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("query_id"), col("y.vec_id").as("neighbor_id"),
        (dot(col("x.v"), col("y.v")) / (col("x.nrm") * col("y.nrm"))).as("cos"))
    pairs
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(round(col("cos"), 6).desc, col("neighbor_id"))))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 4).as("cosine"),
        col("rnk"))
      .orderBy("query_id", "rnk")
  }

  /** IVF coarse assignment: distance to each of the `nCentroids`
    * fixed coarse-quantizer centroids (vec_id < nCentroids — a
    * deterministic stand-in for trained k-means centroids; the
    * structure, probe flow and plan shape are what matter), ranked
    * with rounded distances so assignment is engine-stable. */
  private def ivfAssign(v: DataFrame, nCentroids: Int, nProbe: Int): DataFrame = {
    val cents = v.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val d2 = v.crossJoin(broadcast(cents))
      .withColumn("dist", round(
        aggregate(zip_with(col("v"), col("cv"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x), 6))
      .withColumn("crank", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("dist"), col("cid"))))
    d2.filter(col("crank") <= nProbe)
      .select(col("vec_id"), col("v"), col("nrm"), col("cid"), col("crank"))
  }

  /** D7b IVF-style ANN: vectors live in their nearest-centroid list
    * (crank=1); queries probe their `nProbe` nearest lists and rerank
    * exactly within them. At scale the inverted lists are the
    * partition key — each query touches nProbe/nCentroids of the
    * corpus instead of all of it.
    */
  def ivfTopK(emb: DataFrame, queryPred: Column, k: Int = 3,
      nCentroids: Int = 16, nProbe: Int = 2): DataFrame = {
    val v = withNorm(emb)
    val assigned = ivfAssign(v, nCentroids, nProbe)
    val lists = assigned.filter(col("crank") === 1)
      .select(col("cid"), col("vec_id"), col("v"), col("nrm"))
    val probes = assigned.filter(queryPred)
      .select(col("cid"), col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val pairs = lists.join(probes,
        lists("cid") === probes("cid") && col("vec_id") =!= col("query_id"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
    pairs
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(round(col("cos"), 6).desc, col("vec_id"))))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 4).as("cosine"), col("rnk"))
      .orderBy("query_id", "rnk")
  }

  /** D5 embedding near-dup, scale path: LSH sign-bucket blocking +
    * exact cosine rerank ≥ threshold within each bucket. The ONLY
    * shuffle key is the (uniform by construction) bucket id — no
    * corpus fraction is ever broadcast and no near-cross-join exists
    * anywhere in the plan, so the same shape runs at 100 TB with
    * ~n²/2^planes candidate pairs. Recall is the LSH bucket recall
    * (measured against [[embeddingNearDupExact]] in SimilaritySpec).
    */
  def embeddingNearDup(emb: DataFrame, threshold: Double, planes: Int = 8): DataFrame = {
    val b = lshBucket(emb, planes)
    b.as("x").join(b.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      .withColumn("cosine",
        round(dot(col("x.v"), col("y.v")) / (col("x.nrm") * col("y.nrm")), 4))
      .filter(col("cosine") >= threshold)
      .select(col("x.vec_id").as("doc_a"), col("y.vec_id").as("doc_b"), col("cosine"))
      .orderBy("doc_a", "doc_b")
  }

  /** Exact-semantics embedding near-dup over a sampled anchor set
    * (anchor % sampleMod == 0): every anchor×corpus pair gets an
    * exact cosine. Correct at any size but the anchor set is
    * broadcast — small-corpus / ground-truth use only; the scale
    * operator is [[embeddingNearDup]]. */
  def embeddingNearDupExact(emb: DataFrame, threshold: Double,
      sampleMod: Int = 10): DataFrame = {
    val v = withNorm(emb)
    val a = v.filter(col("vec_id") % sampleMod === 0)
      .select(col("vec_id").as("doc_a"), col("v").as("va"), col("nrm").as("na"))
    v.join(broadcast(a), col("doc_a") < col("vec_id"))
      .withColumn("cosine", round(dot(col("va"), col("v")) / (col("na") * col("nrm")), 4))
      .filter(col("cosine") >= threshold)
      .select(col("doc_a"), col("vec_id").as("doc_b"), col("cosine"))
      .orderBy("doc_a", "doc_b")
  }
}
