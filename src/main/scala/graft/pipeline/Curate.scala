package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation: the D-operators composed into
  * one declarative pipeline — quality gate → exact-dedup canonical
  * filter → language gate — emitting a per-document decision record.
  *
  * Because each stage is a Column predicate over one shared pass of
  * derived signals, Catalyst fuses the whole pipeline into a handful
  * of stages: at 100 TB this is two shuffles (token agg + md5 group),
  * not one job per stage.
  */
object Curate {

  /** Per-document curation decisions:
    * (doc_id, n_tokens, quality, lang_pred, pass_quality,
    *  is_canonical, pass_lang, kept). */
  def curate(docs: DataFrame,
      minTokens: Long = 20L,
      maxDigitRatio: Double = 0.3,
      minQuality: Double = 0.2): DataFrame = {
    val q = TextAnalysis.quality(docs)
    val lang = TextAnalysis.langId(docs).select("doc_id", "lang_pred")
    val canon = Dedup.exact(docs)
      .select(col("canonical_id").as("doc_id"), lit(true).as("is_canonical"))
    q.join(lang, "doc_id")
      .join(canon, Seq("doc_id"), "left")
      .withColumn("is_canonical", coalesce(col("is_canonical"), lit(false)))
      .withColumn("pass_quality",
        col("n_tokens") >= minTokens && col("digit_ratio") <= maxDigitRatio &&
          col("quality") >= minQuality)
      .withColumn("pass_lang", col("lang_pred") === "en")
      .withColumn("kept",
        col("pass_quality") && col("is_canonical") && col("pass_lang"))
      .select("doc_id", "n_tokens", "quality", "lang_pred", "pass_quality",
        "is_canonical", "pass_lang", "kept")
      .orderBy("doc_id")
  }

  /** The curated corpus itself (what downstream training reads). */
  def curatedDocs(docs: DataFrame): DataFrame =
    docs.join(curate(docs).filter(col("kept")).select("doc_id"), "doc_id")
}
