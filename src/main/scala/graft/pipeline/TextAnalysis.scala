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

  /** D19 corpus vocabulary: per-token document frequency + total term
    * frequency, top-k by (df desc, token) — the df table every other
    * text operator leans on (fulltext idf, the prefix-filter rarity
    * ranking, stopword candidates), surfaced as its own operator.
    * One narrow shuffle on token; partial-aggregated map-side. */
  def vocabulary(docs: DataFrame, topK: Int = 100): DataFrame =
    TextOps.tokensBag(docs)
      .groupBy("token")
      .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("total_tf"))
      .orderBy(col("df").desc, col("token"))
      .limit(topK)

  /** PII regex patterns (D20). Written with `[.]` instead of `\.` and
    * `[0-9]` instead of `\d` so the identical pattern string is valid
    * in Java regex AND RE2 with the same match extents. */
  val EmailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}"
  val IpPat = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
  val PhonePat = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Deterministic synthetic PII rider for the gate: the corpus text
    * carries no PII, so (multimodal-style, Multimodal.scala precedent)
    * each doc gets email/IP/phone spans synthesized from doc_id.
    * Spark then runs the REAL regex detector/redactor over the result;
    * the DuckDB oracle never runs a regex — it constructs the expected
    * redacted string arithmetically, so an over- or under-matching
    * pattern hash-mismatches immediately. */
  def withSyntheticPii(docs: DataFrame): DataFrame =
    docs.withColumn("pii_text", concat(
      col("text"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com"))).otherwise(lit("")),
      when(col("doc_id") % 4 === 0,
        concat(lit(" from 10."), (col("doc_id") % 256).cast("string"),
          lit(".0."), ((col("doc_id") % 254) + 1).cast("string"))).otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        concat(lit(" call 555-"), lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
          lit("-"), lpad(((col("doc_id") * 7) % 10000).cast("string"), 4, "0")))
        .otherwise(lit(""))))

  /** D20 PII detection + redaction: count email/IPv4/phone matches and
    * replace each with a typed placeholder — the C4/Dolma-style scrub
    * pass. Pure codegen'd regexp Columns, one scan, no UDFs; order
    * matters (emails first — their local parts contain digits). */
  def piiRedact(docs: DataFrame): DataFrame = {
    val d = withSyntheticPii(docs)
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(col("pii_text"), EmailPat, "[EMAIL]"),
        IpPat, "[IP]"),
      PhonePat, "[PHONE]")
    d.select(
        col("doc_id"),
        size(expr(s"regexp_extract_all(pii_text, '$EmailPat', 0)")).cast("long")
          .as("n_emails"),
        size(expr(s"regexp_extract_all(pii_text, '$IpPat', 0)")).cast("long")
          .as("n_ips"),
        size(expr(s"regexp_extract_all(pii_text, '$PhonePat', 0)")).cast("long")
          .as("n_phones"),
        length(redacted).cast("long").as("redacted_len"),
        md5(redacted).as("redacted_hash"))
      .orderBy("doc_id")
  }
}
