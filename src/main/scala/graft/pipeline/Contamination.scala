package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Benchmark decontamination (SURVEY.md §2 D18): flag training
  * documents that share word k-grams with an evaluation/benchmark
  * set — the GPT-3/PaLM-style n-gram collision check that every
  * serious pretraining pipeline runs before training.
  *
  * Scale shape: the benchmark side is an eval suite — thousands of
  * documents, not billions — so its distinct gram set broadcasts;
  * the training corpus contributes one narrow (doc_id, gh) stream
  * (the k-gram rolling hashes from [[TextOps.kgrams]], computed
  * inside the per-document window partition, never a wide shuffle).
  * The whole check is one broadcast semi join + one groupBy(doc_id):
  * linear in corpus size, no pair materialization anywhere.
  */
object Contamination {

  /** Per-training-doc contamination report against the documents
    * matching `benchPred`: (doc_id, n_hits = distinct k-grams shared
    * with ANY benchmark doc, contaminated flag). Benchmark docs are
    * excluded from the output. `k` is the overlap length — 13 in the
    * GPT-3 recipe; smaller for short-document corpora.
    */
  def decontaminate(docs: DataFrame, benchPred: Column, k: Int = 4): DataFrame = {
    // Filter BEFORE tokenizing on each branch: the benchmark side only
    // ever tokenizes the (tiny) eval subset — a semi join placed after
    // kgrams cannot push below the tokenize window, which would cost a
    // second full-corpus tokenization at scale.
    val benchGrams = TextOps.kgrams(docs.filter(benchPred), k)
      .select("gh").distinct()
    val train = TextOps.kgrams(docs.filter(!benchPred), k).distinct()
    val hits = train.join(broadcast(benchGrams), Seq("gh"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    docs.filter(!benchPred).select("doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
      .orderBy("doc_id")
  }
}
