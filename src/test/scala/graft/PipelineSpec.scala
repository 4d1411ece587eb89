package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Dedup, Similarity}

/** Semantics checks for the dedup/similarity operators on crafted
  * inputs where the expected answer is hand-checkable.
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)

  def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts under min doc_id") {
    val d = Dedup.exact(docs(1L -> "a b c", 2L -> "a b c", 3L -> "x y z"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(d == Set((2L, 1L), (1L, 3L)))
  }

  test("minhash LSH finds an obvious near-duplicate pair") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val d = Dedup.minhashLsh(docs(
      1L -> base, 2L -> (base + " extra"), 3L -> "completely different words here entirely"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(d.exists(p => p._1 == 1L && p._2 == 2L && p._3 > 0.5))
    assert(!d.exists(p => p._2 == 3L || p._1 == 3L))
  }

  test("simhash: identical docs at hamming 0; disjoint docs not paired") {
    val d = Dedup.simhashNearDup(docs(
      1L -> "alpha beta gamma delta", 2L -> "alpha beta gamma delta",
      3L -> "zq wx kv jn pm")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(d.contains((1L, 2L, 0L)))
    assert(!d.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("ngram jaccard: identical docs score 1.0") {
    val d = Dedup.ngramJaccard(docs(
      1L -> "one two three four five", 2L -> "one two three four five",
      3L -> "six seven eight nine ten"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(d == Set((1L, 2L, 1.0)))
  }

  test("prefix-filtered jaccard equals plain jaccard (lossless)") {
    val d = docs(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "alpha beta gamma delta epsilon zeta eta iota",
      3L -> "one two three four five six seven eight",
      4L -> "one two three four five six seven eight")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(key(Dedup.ngramJaccardPrefix(d, 0.5)) == key(Dedup.ngramJaccard(d, 0.5)))
    assert(key(Dedup.ngramJaccardPrefix(d, 0.5)).nonEmpty)
  }

  test("cosine top-k ranks the aligned vector first") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = Similarity.topKCosine(emb, org.apache.spark.sql.functions.col("vec_id") === 0, k = 2)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(top.head == (1L, 1)) // most-aligned neighbor ranked 1
  }
}
