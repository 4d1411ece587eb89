package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Text-analysis operators for training-data pipelines
  * (SURVEY.md §2 D8–D11). Everything is native-function Column code —
  * single scan, no UDFs, fully codegen'd — so a 100 TB corpus costs
  * one pass per operator (or one fused pass if composed).
  */
object TextAnalysis {

  /** D8 language-ID heuristic: stopword-hit fraction over tokens.
    * (The classic n-gram trick reduced to a deterministic,
    * oracle-replayable scoring.) */
  def langId(docs: DataFrame, threshold: Double = 0.05): DataFrame =
    TextOps.tokensBag(docs)
      .groupBy("doc_id")
      .agg(
        round(avg(when(col("token").isInCollection(TextOps.Stopwords), 1.0)
          .otherwise(0.0)), 4).as("stopword_ratio"))
      .withColumn("lang_pred",
        when(col("stopword_ratio") >= threshold, "en").otherwise("unknown"))
      .orderBy("doc_id")

  /** D9 quality scoring: length/digit/stopword signals in one pass. */
  def quality(docs: DataFrame): DataFrame = {
    val tok = TextOps.tokensBag(docs)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(length(col("token"))), 4).as("avg_token_len"),
        round(avg(when(col("token").isInCollection(TextOps.Stopwords), 1.0)
          .otherwise(0.0)), 4).as("stopword_ratio"))
    docs.select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
        round(length(regexp_replace(col("text"), "[^0-9]", "")).cast("double")
          / length(col("text")), 4).as("digit_ratio"))
      .join(tok, "doc_id")
      .withColumn("quality",
        round(least(lit(1.0), col("n_tokens") / 100.0) * (lit(1.0) - col("digit_ratio")), 4))
      .select("doc_id", "n_chars", "n_tokens", "avg_token_len", "stopword_ratio",
        "digit_ratio", "quality")
      .orderBy("doc_id")
  }

  /** D10 token counting: whitespace tokens and a BPE-ish regex count
    * (letter runs | digit runs | single punctuation). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
        col("doc_id"),
        size(filter(split(col("text"), " +"), t => t =!= "")).cast("long").as("n_ws_tokens"),
        size(expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
          .cast("long").as("n_bpe_tokens"))
      .orderBy("doc_id")

  /** D11 document fingerprint: min rolling (shingle) hash + shingle
    * cardinality — a compact content signature for incremental dedup. */
  def fingerprint(docs: DataFrame): DataFrame =
    TextOps.shingles(docs)
      .groupBy("doc_id")
      .agg(min(col("sh")).as("fingerprint"),
        countDistinct(col("sh")).as("n_distinct_shingles"))
      .orderBy("doc_id")
}
