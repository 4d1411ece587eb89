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

  // ---- boolean ("raw Lucene") queries -----------------------------------

  /** Minimal boolean query AST: terms, `pref*` wildcards, AND/OR,
    * parentheses — the subset the reference documents for `--raw`
    * (README: `"ransom* AND (bitcoin OR wallet)"`). */
  sealed trait Q
  case class Term(t: String) extends Q
  case class Prefix(p: String) extends Q
  case class And(l: Q, r: Q) extends Q
  case class Or(l: Q, r: Q) extends Q

  /** Recursive-descent parser; bare adjacency = OR (Lucene default). */
  def parseQuery(s: String): Q = {
    val tokens = s.replace("(", " ( ").replace(")", " ) ")
      .trim.split("\\s+").filter(_.nonEmpty).toList
    def atom(ts: List[String]): (Q, List[String]) = ts match {
      case "(" :: rest =>
        val (q, rem) = or(rest)
        rem match {
          case ")" :: tail => (q, tail)
          case other => (q, other) // tolerate unbalanced close
        }
      case w :: rest if w.endsWith("*") =>
        (Prefix(w.dropRight(1).toLowerCase), rest)
      case w :: rest => (Term(w.toLowerCase), rest)
      case Nil => throw new IllegalArgumentException("empty query")
    }
    def and(ts: List[String]): (Q, List[String]) = {
      var (q, rem) = atom(ts)
      while (rem.headOption.contains("AND")) {
        val (r, rem2) = atom(rem.tail)
        q = And(q, r); rem = rem2
      }
      (q, rem)
    }
    def or(ts: List[String]): (Q, List[String]) = {
      var (q, rem) = and(ts)
      while (rem.headOption.exists(t => t == "OR" ||
          (t != ")" && t != "AND"))) {
        val next = if (rem.head == "OR") rem.tail else rem
        val (r, rem2) = and(next)
        q = Or(q, r); rem = rem2
      }
      (q, rem)
    }
    or(tokens)._1
  }

  private def atoms(q: Q): Seq[Q] = q match {
    case And(l, r) => atoms(l) ++ atoms(r)
    case Or(l, r) => atoms(l) ++ atoms(r)
    case leaf => Seq(leaf)
  }

  /** Boolean fulltext search (reference `query strings --raw`):
    * documents satisfying the boolean expression, scored by tf-idf
    * over every matched atom. One postings scan filtered to the
    * query's atoms (partition-prunable), matched-atom sets folded
    * per doc, the boolean tree evaluated as a Column expression.
    */
  def booleanSearch(docs: DataFrame, query: String, limit: Int = 20): DataFrame = {
    val q = parseQuery(query)
    val leafList = atoms(q).distinct
    val atomId = leafList.zipWithIndex.toMap
    val post = postings(docs)
    val df = docFrequency(post)
    def atomPred(a: Q) = a match {
      case Term(t) => col("token") === t
      case Prefix(p) => col("token").startsWith(p)
      case _ => lit(false)
    }
    val matchedPost = post.join(broadcast(df), "token")
      .withColumn("atom_ids", array(leafList.map(a =>
        when(atomPred(a), atomId(a)).otherwise(lit(null))): _*))
      .filter(size(filter(col("atom_ids"), _.isNotNull)) > 0)
    val n = docs.agg(count(lit(1)).as("n"))
    val perDoc = matchedPost
      .crossJoin(broadcast(n))
      .groupBy("doc_id")
      .agg(
        round(sum(col("tf") * log((col("n") + 1.0) / (col("df") + 1.0))), 4).as("score"),
        array_distinct(flatten(collect_list(filter(col("atom_ids"), _.isNotNull))))
          .as("matched"))
    def sat(x: Q): org.apache.spark.sql.Column = x match {
      case And(l, r) => sat(l) && sat(r)
      case Or(l, r) => sat(l) || sat(r)
      case leaf => array_contains(col("matched"), atomId(leaf))
    }
    perDoc.filter(sat(q))
      .select(col("doc_id"), col("score"), size(col("matched")).as("n_atoms"))
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
