package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Query-time COMPOSITION of the corpus operators (SURVEY §2 D91):
  * chain dedup → curate → shard in one session as one logical plan,
  * the way a training-data engineer actually strings the stages
  * together, instead of running each gated operator as its own job
  * over its own corpus scan.
  *
  * Two design rules make the composition scale:
  *
  *  1. **Survivor-set semantics.** Every stage operates on the corpus
  *     SURVIVING the stages before it: set-level decisions (exact
  *     canonical min-id, near-dup cluster membership, contamination)
  *     are computed over the current survivor set — dropping a doc in
  *     stage 2 can change stage 3's canonical picks, exactly as if
  *     the survivor corpus had been written out and re-read.
  *  2. **Per-doc signals ride the ROOT memos.** Token stats, language
  *     id and minhash signatures are PER-DOCUMENT (identical on any
  *     subset), so the pipeline computes them against the root frame
  *     — hitting the same identity-keyed shared memos the individual
  *     gated queries use ([[graft.functions.TextOps.shinglesShared]],
  *     [[Dedup.minhashSigsShared]]) — and restricts per doc_id
  *     afterwards. A three-stage pipeline over 100 TB pays ONE
  *     tokenize+shingle+sign pass, then works on survivor-sized
  *     frames; only genuinely set-level steps (the band join, the
  *     label fixpoint, the exact-hash groupBy) re-run per stage, and
  *     those are near-dup-pair-sized, not corpus-sized.
  *
  * The state between stages is a narrow (doc_id) survivor frame —
  * shuffle-light at any scale. Nothing executes until a terminal
  * ([[docs]]/[[shardPlan]]/[[decisions]]) is consumed; Catalyst sees
  * the whole chain as one plan and prunes/pushes across stages.
  */
final class CorpusPipeline private (
    val root: DataFrame,
    keep: DataFrame,
    val stages: Seq[String]) {

  private def next(k: DataFrame, stage: String): CorpusPipeline =
    new CorpusPipeline(root, k, stages :+ stage)

  /** Arbitrary per-doc predicate over the root columns (source/lang/
    * length gates). */
  def where(pred: Column): CorpusPipeline =
    next(root.filter(pred).select("doc_id").join(keep, "doc_id"),
      s"where($pred)")

  /** The [[Curate.curate]] gates — quality + language + exact-dedup
    * canonical — with the canonical min-id chosen among CURRENT
    * survivors. Per-doc quality/langid signals come from the root
    * frame (memo-shared); only the exact-hash groupBy sees the
    * survivor set. */
  def curated(minTokens: Long = 20L, maxDigitRatio: Double = 0.3,
      minQuality: Double = 0.2): CorpusPipeline = {
    val q = TextAnalysis.quality(root)
      .select("doc_id", "n_tokens", "digit_ratio", "quality")
    val lang = TextAnalysis.langId(root).select("doc_id", "lang_pred")
    val canon = root.join(keep, "doc_id")
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val kept = canon
      .join(q, "doc_id").join(lang, "doc_id")
      .filter(col("n_tokens") >= minTokens
        && col("digit_ratio") <= maxDigitRatio
        && col("quality") >= minQuality
        && col("lang_pred") === "en")
      .select("doc_id")
    next(kept, s"curated($minTokens,$maxDigitRatio,$minQuality)")
  }

  /** Near-dup collapse over the survivors: minhash-LSH clusters at
    * `minEstJaccard` ([[Dedup.clustersFromSigs]] over the root's
    * memoized signatures restricted per doc_id), keeping only each
    * cluster's canonical min-id member. */
  def dedupNear(minEstJaccard: Double = 0.5,
      rounds: Int = 12): CorpusPipeline = {
    val sigs = Dedup.minhashSigsShared(root).join(keep, "doc_id")
    val drop = Dedup.clustersFromSigs(sigs, minEstJaccard, rounds)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select("doc_id")
    next(keep.join(drop, Seq("doc_id"), "left_anti"),
      s"dedupNear($minEstJaccard,$rounds)")
  }

  /** Benchmark decontamination over the survivors: drops the bench
    * docs themselves and any survivor sharing a k-gram with one
    * ([[Contamination.decontaminate]] semantics on the current set). */
  def decontaminated(benchPred: Column): CorpusPipeline = {
    val cur = root.join(keep, "doc_id")
    val kept = Contamination.decontaminate(cur, benchPred)
      .filter(!col("contaminated") && !col("is_bench"))
      .select("doc_id")
    next(kept, "decontaminated")
  }

  /** Terminal: the surviving corpus (all root columns). */
  def docs: DataFrame = root.join(keep, "doc_id")

  /** Terminal: the survivor doc_id decision frame, with the audit
    * trail of applied stages available via [[stages]]. */
  def decisions: DataFrame = keep.orderBy("doc_id")

  /** Terminal: [[Sampling.shardPlan]] over the survivors — the
    * training-shard layout of the curated, deduplicated corpus. */
  def shardPlan(nShards: Int = 64): DataFrame =
    Sampling.shardPlan(docs, nShards)
}

object CorpusPipeline {
  /** Start a pipeline over a documents frame. Pass the session's
    * shared frame ([[graft.Tables.documentsShared]]) so every per-doc
    * artifact rides the engine's identity-keyed memos. */
  def over(docs: DataFrame): CorpusPipeline =
    new CorpusPipeline(docs, docs.select("doc_id"), Nil)
}
