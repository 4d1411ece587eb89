package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.CorpusPipeline

/** Contracts for the composed corpus pipeline (SURVEY §2 D97):
  * survivor-set semantics (set-level decisions are made over what
  * earlier stages kept, so stage ORDER matters), the curate gates
  * composing with near-dup canonical collapse, and the shard-plan
  * terminal conserving the survivor corpus.
  */
class CorpusPipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)

  private val base = "the quick brown fox jumps over the lazy dog and then " +
    "the small bird sings in the green tree near the old house every single day"
  // shares NO shingle with `base` — a second near-dup family
  private val base2 = "a tall ship sails across the wide blue sea while " +
    "a young sailor watches the bright stars above the calm water at night"

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("curated + dedupNear: exact dup, near dup, junk and non-en all drop") {
    val d = docs(
      1L -> (base + " alpha"),
      2L -> (base + " alpha"),      // exact dup of 1 → canonical 1 keeps
      3L -> (base2 + " beta"),
      4L -> (base2 + " gamma"),     // near-dup of 3 → cluster canonical 3
      5L -> "12345 67890 11111 22222 33333", // digit junk → fails quality
      6L -> ("zzz " * 25).trim)     // no stopwords → lang unknown
    val p = CorpusPipeline.over(d).curated().dedupNear()
    val kept = p.decisions.collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L), s"got $kept")
    assert(p.stages.size == 2 && p.stages.head.startsWith("curated"))
  }

  test("stage order changes set-level decisions (survivor-set semantics)") {
    // 7 and 8 share all shingles; 7 is the min-id cluster canonical.
    val d = docs(7L -> (base + " delta"), 8L -> (base + " delta"))
    // drop 7 FIRST: the near-dup cluster among survivors is {8} alone,
    // so 8 is its own canonical and survives
    val after = CorpusPipeline.over(d)
      .where(col("doc_id") =!= 7L).dedupNear()
      .decisions.collect().map(_.getLong(0)).toSet
    assert(after == Set(8L), s"got $after")
    // cluster FIRST: canonical is 7, so 8 drops — then dropping 7
    // leaves nothing. Same stages, different order, different corpus.
    val before = CorpusPipeline.over(d)
      .dedupNear().where(col("doc_id") =!= 7L)
      .decisions.collect().map(_.getLong(0)).toSet
    assert(before == Set.empty[Long], s"got $before")
  }

  test("shardPlan terminal conserves the survivor corpus") {
    val d = docs((1L to 40L).map(i =>
      i -> (base + s" word$i")): _*)
    val p = CorpusPipeline.over(d).curated()
    val nDocs = p.docs.count()
    val plan = p.shardPlan(4).collect()
    assert(plan.map(_.getAs[Long]("n_docs")).sum == nDocs)
    assert(plan.map(_.getAs[Long]("share_ppm")).sum <= 1000000L)
  }
}
