package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Distributed fulltext search (SURVEY.md §2 B11) — the Spark-first
  * replacement for the reference's Lucene fulltext index
  * (importer.rs:378-429, schema.rs `string_value_fulltext`).
  *
  * The inverted index is itself a DataFrame (term → doc postings
  * with tf), so it is incrementally maintainable and term-partition
  * prunable at scale; scoring is tf-idf (the BM25 shape without
  * length normalization, so the oracle can replay it exactly).
  */
object Fulltext {

  /** Postings with term frequency: (doc_id, token, tf). */
  def postings(docs: DataFrame): DataFrame =
    TextOps.tokensBag(docs)
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"))

  /** Document frequency per term: (token, df). */
  def docFrequency(post: DataFrame): DataFrame =
    post.groupBy("token").agg(count(lit(1)).as("df"))

  /** Keyword search: score(doc) = Σ_t tf·ln((N+1)/(df+1)) over the
    * query terms; n_terms = how many distinct query terms matched.
    * The term filter lands on the postings scan (partition-prunable
    * by token at scale); N rides along as a 1-row broadcast. */
  def search(docs: DataFrame, terms: Seq[String], limit: Int = 20): DataFrame = {
    val post = postings(docs).filter(col("token").isInCollection(terms))
    val df = docFrequency(postings(docs)).filter(col("token").isInCollection(terms))
    val n = docs.agg(count(lit(1)).as("n"))
    post.join(broadcast(df), "token")
      .crossJoin(broadcast(n))
      .groupBy("doc_id")
      .agg(
        round(sum(col("tf") * log((col("n") + 1.0) / (col("df") + 1.0))), 4).as("score"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(limit)
  }

  /** Prefix (wildcard) search `pref*`: same scoring over every term
    * with the prefix — the analogue of the reference's auto-wildcard
    * Lucene queries (README "fulltext with auto wildcard"). */
  def prefixSearch(docs: DataFrame, prefix: String, limit: Int = 20): DataFrame = {
    val post = postings(docs).filter(col("token").startsWith(prefix))
    val df = docFrequency(postings(docs)).filter(col("token").startsWith(prefix))
    val n = docs.agg(count(lit(1)).as("n"))
    post.join(broadcast(df), "token")
      .crossJoin(broadcast(n))
      .groupBy("doc_id")
      .agg(
        round(sum(col("tf") * log((col("n") + 1.0) / (col("df") + 1.0))), 4).as("score"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(limit)
  }
}
