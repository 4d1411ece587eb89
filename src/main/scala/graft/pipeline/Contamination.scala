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

  /** Bloom geometry for [[decontaminateBloom]]: kHashes bit positions
    * in [0, MBits) per gram, each from its own 8-hex window of
    * md5(gh) — the [[graft.functions.Sketches]] hash discipline. */
  val MBits = 65536L
  val KHashes = 3

  def bloomPos(gh: Column, i: Int): Column =
    conv(substring(md5(gh.cast("string")), 1 + 8 * i, 8), 16, 10)
      .cast("long") % MBits

  def bloomPosSql(gh: String, i: Int): String =
    s"(${graft.functions.Sketches.hexToLongSql(s"md5(CAST($gh AS VARCHAR))", 1 + 8 * i, 8)} % $MBits)"

  /** [[decontaminate]] behind a BLOOM FILTER instead of the exact
    * gram set: the benchmark's grams are folded into kHashes bit
    * positions each and only the DISTINCT SET-BIT POSITIONS ship to
    * the probe side — ≤ min(k·|bench grams|, 2¹⁶) values no matter
    * how big the eval suite grows, vs the exact join's full gram
    * set. A training gram counts as a (possible) hit iff ALL k of
    * its positions are set; false positives are the classic
    * (1−e^(−kn/m))^k and — because every hash is deterministic —
    * IDENTICAL in both engines, so the oracle replays flags exactly.
    * In production the position set packs into an m-bit bitmap
    * broadcast once per executor; the position-set form here keeps
    * the whole filter SQL-replayable. Report is a SUPERSET of the
    * exact [[decontaminate]] flags — the cheap first pass that
    * gates the expensive exact check at 100 TB.
    */
  def decontaminateBloom(docs: DataFrame, benchPred: Column, k: Int = 4): DataFrame = {
    // ONE tokenize+window pass per side, checkpointed before the
    // 3-way position fan-out (the kgrams lineage would otherwise
    // re-run per hash — the D35 "one tokenize pass feeds every join"
    // discipline; the oracle's kgd is MATERIALIZED for the same
    // reason).
    val benchGrams = TextOps.kgrams(docs.filter(benchPred), k)
      .select("gh").distinct().localCheckpoint(true)
    val benchBits = (0 until KHashes).map { i =>
      benchGrams.select(bloomPos(col("gh"), i).as("pos"))
    }.reduce(_ unionByName _).distinct()
    val train = TextOps.kgrams(docs.filter(!benchPred), k).distinct()
      .localCheckpoint(true)
    val probes = (0 until KHashes).map { i =>
      train.select(col("doc_id"), col("gh"), bloomPos(col("gh"), i).as("pos"))
    }.reduce(_ unionByName _)
    val maybe = probes.join(broadcast(benchBits), Seq("pos"), "left_semi")
      .groupBy("doc_id", "gh").agg(count(lit(1)).as("n_set"))
      .filter(col("n_set") === KHashes)
      .groupBy("doc_id").agg(count(lit(1)).as("n_maybe"))
    docs.filter(!benchPred).select("doc_id")
      .join(maybe, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_maybe"), lit(0L)).as("n_maybe"),
        (coalesce(col("n_maybe"), lit(0L)) > 0).as("flagged"))
      .orderBy("doc_id")
  }
}
