package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Rounding, TextOps}

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
        Rounding.rnd(avg(when(col("token").isInCollection(TextOps.Stopwords), 1.0)
          .otherwise(0.0)), 4).as("stopword_ratio"))
      .withColumn("lang_pred",
        when(col("stopword_ratio") >= threshold, "en").otherwise("unknown"))
      .orderBy("doc_id")

  /** D9 quality scoring: length/digit/stopword signals in one pass. */
  def quality(docs: DataFrame): DataFrame = {
    val tok = TextOps.tokensBag(docs)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        Rounding.rnd(avg(length(col("token"))), 4).as("avg_token_len"),
        Rounding.rnd(avg(when(col("token").isInCollection(TextOps.Stopwords), 1.0)
          .otherwise(0.0)), 4).as("stopword_ratio"))
    docs.select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
        Rounding.rnd(length(regexp_replace(col("text"), "[^0-9]", "")).cast("double")
          / length(col("text")), 4).as("digit_ratio"))
      .join(tok, "doc_id")
      .withColumn("quality",
        Rounding.rnd(least(lit(1.0), col("n_tokens") / 100.0) * (lit(1.0) - col("digit_ratio")), 4))
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
    // over the shared distinct set: min is dup-insensitive and the
    // distinct count becomes a plain count
    TextOps.shinglesShared(docs)
      .groupBy("doc_id")
      .agg(min(col("sh")).as("fingerprint"),
        count(lit(1)).as("n_distinct_shingles"))
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

  /** Characteristic keywords per document: top-`k` tokens by tf·idf
    * with idf = ln((N+1)/(df+1)) — the exact fulltext scoring contract
    * (Fulltext.scala), so the two operators rank by the same notion of
    * term weight. The score is fixed-point-floored to micro units
    * BEFORE the rank cut, so the top-k boundary compares longs, and
    * ties break on token asc — fully deterministic. Plan shape: one
    * (doc_id, token) shuffle for tf; the df table is vocabulary-sized
    * (broadcast); N is a 1-row broadcast; the rank window partitions
    * per doc (uniform keys). The df branch re-derives tf from the scan
    * rather than materializing the corpus-sized tf frame — two cheap
    * pruned scans beat checkpointing a fact-sized intermediate.
    */
  def keywords(docs: DataFrame, k: Int = 3): DataFrame = {
    val tf = TextOps.tokensBag(docs)
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score_micro").desc, col("token"))
    tf.join(broadcast(dfreq), Seq("token"))
      .crossJoin(broadcast(n))
      .withColumn("score_micro",
        floor(col("tf") * log((col("n") + lit(1.0)) / (col("df") + lit(1.0)))
          * 1000000 + lit(0.5)).cast("long"))
      .withColumn("kw_rank", row_number().over(w))
      .filter(col("kw_rank") <= k)
      .select(col("doc_id"), col("kw_rank"), col("token"), col("tf"),
        col("df"), col("score_micro"))
      .orderBy("doc_id", "kw_rank")
  }

  /** Unigram cross-entropy scoring — the CCNet/perplexity-filter shape
    * with a corpus-trained unigram LM standing in for the n-gram model:
    * ce(doc) = Σ_t tf_dt·ln(T/tf_t) / n_d, where T = corpus token
    * count and tf_t = corpus frequency of t (every token observed ≥ 1
    * time, so the log never sees zero). High CE = doc looks unlike the
    * corpus (gibberish, other language); low = boilerplate. The
    * corpus LM is vocabulary-sized → broadcast; the log-likelihood sum
    * follows the Fulltext scoring contract (round 4dp); the final
    * per-token normalization is floor-form 4dp of one divide.
    */
  def unigramCrossEntropy(docs: DataFrame): DataFrame = {
    val tf = TextOps.tokensBag(docs)
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    // vocabulary-sized → checkpoint, so the total and the join both
    // ride one LM build instead of re-tokenizing the corpus
    val lm = tf.groupBy("token").agg(sum(col("tf")).as("ctf")).localCheckpoint(true)
    val total = lm.agg(sum(col("ctf")).as("t"))
    tf.join(broadcast(lm), Seq("token"))
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_tokens"),
        round(sum(col("tf") * log(col("t").cast("double") / col("ctf"))), 4)
          .as("ll_sum"))
      .select(col("doc_id"), col("n_tokens"), col("ll_sum"),
        rnd(col("ll_sum") / col("n_tokens"), 4).as("ce"))
      .orderBy("doc_id")
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): per document,
    * the mean unigram log-likelihood ratio between a TARGET
    * distribution (here the stopword-ratio-'en' stratum — the
    * trusted-subset stand-in; in production, the wiki/books LM) and
    * the full-corpus source distribution, Laplace-smoothed over the
    * source vocabulary. High score = looks like the target; sampling
    * ∝ exp(score·n) IS importance resampling. Same plan shape as
    * [[unigramCrossEntropy]]: both LMs are vocabulary-sized
    * broadcast frames off ONE (doc, token, tf) aggregate; the
    * corpus-sized pass is a single broadcast-join + doc-keyed agg
    * (rounded to 4 dp — the CE float-sum contract).
    */
  def dsirWeights(docs: DataFrame): DataFrame = {
    val tf = TextOps.tokensBag(docs)
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val enDocs = langId(docs).filter(col("lang_pred") === "en").select("doc_id")
    val src = tf.groupBy("token").agg(sum(col("tf")).as("ctf"))
    val tgt = tf.join(enDocs, Seq("doc_id"), "left_semi")
      .groupBy("token").agg(sum(col("tf")).as("ttf"))
    val lm = src.join(tgt, Seq("token"), "left")
      .select(col("token"), col("ctf"), coalesce(col("ttf"), lit(0L)).as("ttf"))
      .localCheckpoint(true)
    val tot = lm.agg(sum(col("ctf")).as("ts"), sum(col("ttf")).as("tt"),
      count(lit(1)).as("v"))
    tf.join(broadcast(lm), Seq("token"))
      .crossJoin(broadcast(tot))
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_tokens"),
        round(sum(col("tf") * log(
          ((col("ttf") + 1).cast("double") / (col("tt") + col("v"))) /
            ((col("ctf") + 1).cast("double") / (col("ts") + col("v"))))), 4)
          .as("llr_sum"))
      .select(col("doc_id"), col("n_tokens"), col("llr_sum"),
        rnd(col("llr_sum") / col("n_tokens"), 4).as("dsir_score"))
      .orderBy("doc_id")
  }

  /** Context-length truncation planning: for a ladder of maximum
    * sequence lengths, how many documents overflow and how many
    * tokens a hard truncation would discard — the measurement behind
    * choosing context length and chunk-vs-truncate policy
    * ([[graft.pipeline.Sampling.chunkDocs]] is the remedial path).
    * The corpus collapses to a (token-count → doc-count) histogram
    * FIRST; the ladder joins histogram rows, never documents (the
    * rich-club histogram-ladder shape), and everything is exact
    * longs.
    */
  def truncationPlan(docs: DataFrame,
      ls: Seq[Int] = Seq(128, 512, 2048, 8192)): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val n = TextOps.tokensBag(docs)
      .groupBy("doc_id").agg(count(lit(1)).as("nt"))
    val hist = n.groupBy("nt").agg(count(lit(1)).as("nd"))
      .localCheckpoint(true)
    val tot = hist.agg(sum(col("nt") * col("nd")).as("total"))
    ls.toDF("max_len")
      .join(broadcast(hist), col("nt") > col("max_len"), "left")
      .groupBy("max_len")
      .agg(coalesce(sum(col("nd")), lit(0L)).as("n_docs_over"),
        coalesce(sum((col("nt") - col("max_len")) * col("nd")), lit(0L))
          .as("tokens_lost"))
      .crossJoin(broadcast(tot))
      .select(col("max_len").cast("long").as("max_len"), col("n_docs_over"),
        col("tokens_lost"),
        // 10⁶·tokens_lost wraps a long past ~9·10¹² lost tokens — a
        // 100 TB corpus is past it (the modularity DECIMAL discipline)
        expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * tokens_lost)
               div CAST(total AS DECIMAL(38,0)) AS BIGINT)""").as("lost_ppm"))
      .orderBy("max_len")
  }

  /** D21 BPE merge induction — the core loop of tokenizer training as
    * set-oriented DataFrame ops: per round, count adjacent symbol
    * pairs over the word-frequency table, pick the most frequent
    * (ties: lexicographically smallest — deterministic), and merge it
    * everywhere; repeat.
    *
    * Symbol strings use DOUBLE-SPACE separators with double-space
    * padding ("  a  b  c  ") so plain left-to-right `replace` with
    * the pattern `' x  y '` IS the greedy BPE merge: consecutive pair
    * occurrences ("a b a b") don't share characters (a single-space
    * encoding makes them overlap, dropping every second merge), and
    * the one-space anchors stop the pattern matching a SUFFIX of a
    * longer symbol ("ta b" must not merge as "a b"). Both engines'
    * replace is non-overlapping left-to-right, so Spark and the
    * oracle replay identical merges.
    *
    * Scale shape: pair counting shuffles on the pair key over the
    * word-TYPE table (not the corpus); the winning rule is a 1-row
    * broadcast; the merge is a codegen'd string replace. Returns the
    * merge table (merge_round, pair, merged, pair_freq).
    */
  def bpeMerges(docs: DataFrame, rounds: Int = 3): DataFrame =
    bpeTrain(docs, rounds)._1

  /** The [[bpeMerges]] training loop with its end state exposed:
    * returns (mergeTable, symbolTable) where symbolTable carries each
    * word TYPE's double-space symbol string AFTER every merge — the
    * trained tokenizer state [[bpeEncode]] applies. */
  private def bpeTrain(docs: DataFrame, rounds: Int): (DataFrame, DataFrame) = {
    require(rounds >= 1, "bpeMerges needs at least one round")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("token").orderBy("i")
    def pairCounts(sym: DataFrame): DataFrame =
      sym.select(col("token"), col("freq"),
          posexplode(split(trim(col("sym")), "  ")))
        .toDF("token", "freq", "i", "s")
        .withColumn("pr", concat(col("s"), lit(" "), lead(col("s"), 1).over(w)))
        .filter(col("pr").isNotNull)
        .groupBy("pr").agg(sum(col("freq")).as("f"))
    var sym = TextOps.tokensBag(docs)
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .withColumn("sym", concat(lit("  "), regexp_replace(col("token"), "(.)", "$1  ")))
      .localCheckpoint(true)
    // rule rows accumulate here; starting from an empty typed frame
    // keeps the degenerate all-rounds-empty case a normal empty result
    var out = sym.sparkSession.range(0).select(
      lit(0).as("merge_round"), lit("").as("pair"), lit("").as("merged"),
      lit(0L).as("pair_freq"))
    var exhausted = false
    for (r <- 1 to rounds if !exhausted) {
      val top = pairCounts(sym)
        .orderBy(col("f").desc, col("pr")).limit(1)
        .select(col("pr"),
          expr("replace(pr, ' ', '')").as("merged"),
          expr("' ' || replace(pr, ' ', '  ') || ' '").as("pat"),
          col("f"))
        .localCheckpoint(true)
      // no adjacent pairs left (single-symbol words only): stop — a
      // crossJoin against the empty top frame would DELETE every sym
      // row and silently conflate "nothing to merge" with "no corpus"
      if (top.isEmpty) exhausted = true
      else {
        out = out.unionByName(top.select(lit(r).as("merge_round"),
          col("pr").as("pair"), col("merged"), col("f").as("pair_freq")))
        sym = sym.crossJoin(broadcast(top.select(col("pat").as("_p"), col("merged").as("_m"))))
          .withColumn("sym", expr("replace(sym, _p, ' ' || _m || ' ')"))
          .drop("_p", "_m")
          .localCheckpoint(true)
      }
    }
    (out.orderBy("merge_round"), sym)
  }

  /** Apply the [[bpeTrain]]ed merges to the corpus: per-doc token and
    * post-merge SYMBOL counts — the number a sequence-length budget
    * actually needs (a merge that fuses frequent pairs shrinks
    * n_symbols toward n_tokens; untouched rare words still count one
    * symbol per character). The symbol table is word-TYPE-sized →
    * broadcast; the corpus pass is the plain tokensBag tf aggregate,
    * so encoding adds zero wide shuffles beyond training itself.
    */
  def bpeEncode(docs: DataFrame, rounds: Int = 3): DataFrame = {
    val sym = bpeTrain(docs, rounds)._2
    val nsym = sym.select(col("token"),
      size(split(trim(col("sym")), "  ")).cast("long").as("n_sym"))
    TextOps.tokensBag(docs)
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .join(broadcast(nsym), Seq("token"))
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * col("n_sym")).as("n_symbols"))
      .orderBy("doc_id")
  }

  /** Bigram-LM cross-entropy (the [[unigramCrossEntropy]] ladder one
    * order up): ce(doc) = Σ tf_ab·ln(c(a)/c(a,b)) / n_bigrams over
    * the corpus-trained conditional model p(b|a) = c(a,b)/c(a) —
    * context-aware surprise, so scrambled word salad scores high even
    * when every individual word is common (the failure mode a unigram
    * filter cannot see). Every count is exact-long; both counts come
    * from the SAME bigram frame (c(a) = Σ_b c(a,b), so the log never
    * sees zero); the float surface is the shared 4dp-sum contract.
    * The LM is bigram-vocabulary-sized → broadcast joins, and the
    * bigram explode stays inside the per-doc partition (one lead()).
    */
  def bigramCrossEntropy(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("seq")
    val bi = TextOps.tokens(docs)
      .withColumn("next", lead(col("token"), 1).over(w))
      .filter(col("next").isNotNull)
      .groupBy("doc_id", "token", "next").agg(count(lit(1)).as("tf"))
    val lm = bi.groupBy("token", "next").agg(sum(col("tf")).as("cab"))
      .localCheckpoint(true)
    val ctx = lm.groupBy("token").agg(sum(col("cab")).as("ca"))
    bi.join(broadcast(lm), Seq("token", "next"))
      .join(broadcast(ctx), Seq("token"))
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_bigrams"),
        round(sum(col("tf") * log(col("ca").cast("double") / col("cab"))), 4)
          .as("ll_sum"))
      .select(col("doc_id"), col("n_bigrams"), col("ll_sum"),
        rnd(col("ll_sum") / col("n_bigrams"), 4).as("ce"))
      .orderBy("doc_id")
  }

  /** Flesch readability (reading-ease) per doc in exact MILLI-units:
    * 206.835 − 1.015·(words/sentence) − 84.6·(syllables/word) with
    * both ratios as integer floor divisions — the classic
    * quality-filter signal (too-easy ≈ template spam, unreadable ≈
    * OCR garbage), on the fixed-point contract so both engines
    * replay every value bit-exactly. Heuristic conventions,
    * documented and replayed identically by the oracle: words are
    * the tokenizer's alnum runs, sentences = max(1, terminator-run
    * count [.!?]+), syllables = vowel-group runs [aeiouy]+ (a
    * vowel-free word contributes 0 — the standard estimator bias).
    * Vowel-less docs report −1. MAP-ONLY: three regexp counts per
    * row, no shuffle at all — at 100 TB this runs at scan speed.
    */
  def readability(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        greatest(lit(1L), size(regexp_extract_all(col("text"),
          lit("[.!?]+"), lit(0))).cast("long")).as("n_sentences"),
        size(regexp_extract_all(lower(col("text")),
          lit("[a-z0-9]+"), lit(0))).cast("long").as("n_words"),
        size(regexp_extract_all(lower(col("text")),
          lit("[aeiouy]+"), lit(0))).cast("long").as("n_syllables"))
      .withColumn("flesch_milli",
        when(col("n_words") > 0,
          lit(206835L) - expr("(1015 * n_words) div n_sentences")
            - expr("(84600 * n_syllables) div n_words"))
          .otherwise(lit(-1L)))
      .orderBy("doc_id")

  /** PMI collocations (Church & Hanks 1990): the top-`topK` adjacent
    * token pairs by pointwise mutual information over the corpus
    * bigram event space — ln(c_ab·T / (c_a·c_b)) with both margins
    * and the total drawn from the SAME bigram frame (the
    * [[bigramCrossEntropy]] discipline: no zero ever reaches the
    * log). The `minCount` support cut kills the degenerate top of
    * the ranking (hapax pairs score highest by construction —
    * Church & Hanks' own caveat). Scores fixed-point-floor to
    * micro-units BEFORE the rank cut (the [[keywords]] lesson:
    * longs compare, ties on (a, b)), and the cut is a parallel
    * TakeOrdered — never a global window. The count products ride
    * doubles (c_a·c_b wraps a long once margins pass ~3·10⁹ at
    * corpus scale; both engines promote identically). The pair
    * frame is checkpointed once and read three times (two margins
    * + total); margins are vocab-sized → broadcast.
    */
  def pmiCollocations(docs: DataFrame, minCount: Int = 5,
      topK: Int = 40): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("seq")
    val pair = TextOps.tokens(docs)
      .withColumn("next", lead(col("token"), 1).over(w))
      .filter(col("next").isNotNull)
      .groupBy(col("token").as("a"), col("next").as("b"))
      .agg(count(lit(1)).as("cab"))
      .localCheckpoint(true)
    val total = pair.agg(sum(col("cab")).as("t"))
    val ca = pair.groupBy("a").agg(sum(col("cab")).as("ca"))
    val cb = pair.groupBy("b").agg(sum(col("cab")).as("cb"))
    pair.filter(col("cab") >= minCount)
      .join(broadcast(ca), "a").join(broadcast(cb), "b")
      .crossJoin(broadcast(total))
      .withColumn("pmi_micro",
        floor(log(col("cab").cast("double") * col("t") /
            (col("ca").cast("double") * col("cb")))
          * 1000000 + lit(0.5)).cast("long"))
      .select(col("a"), col("b"), col("cab"), col("ca"), col("cb"),
        col("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("a"), col("b"))
      .limit(topK)
  }

  /** Feature hashing (the "hashing trick" featurizer): each token
    * lands in bucket tokenHash mod `dim`; per-doc bucket counts form
    * a fixed-width sparse count vector with NO vocabulary state — the
    * featurizer that needs no fit() pass, no dictionary broadcast,
    * and no OOV path at 100 TB. Map-only until one (doc, bucket)
    * aggregate; the hash is the shared cross-engine tokenHash, so
    * bucket assignment replays exactly.
    */
  def hashFeatures(docs: DataFrame, dim: Int = 64): DataFrame =
    TextOps.tokensBag(docs)
      .select(col("doc_id"), (TextOps.tokenHash(col("token")) % dim).as("bucket"))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("n"))
      .orderBy("doc_id", "bucket")

  /** Tokenizer-coverage / OOV profile: per-doc fraction of token
    * occurrences outside the top-`topV` corpus vocabulary (rank by
    * total tf desc, token asc — deterministic boundary), as exact
    * integer ppm. THE number a fixed-vocab tokenizer budget is sized
    * against: high OOV docs are either foreign-domain or junk. The
    * vocab is topV rows → broadcast; one (doc, token) tf shuffle.
    */
  def oovRate(docs: DataFrame, topV: Int = 200): DataFrame = {
    val tf = TextOps.tokensBag(docs)
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val vocab = tf.groupBy("token").agg(sum(col("tf")).as("ctf"))
      .orderBy(col("ctf").desc, col("token")).limit(topV)
      .select(col("token"), lit(1L).as("in_vocab"))
      .localCheckpoint(true)
    tf.join(broadcast(vocab), Seq("token"), "left")
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_tokens"),
        sum(when(col("in_vocab").isNull, col("tf")).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        expr("(1000000 * n_oov) div n_tokens").as("oov_ppm"))
      .orderBy("doc_id")
  }

  /** Lexical diversity (type-token ratio) per doc: distinct tokens /
    * token occurrences in exact ppm — the cheap repetition screen
    * (template floods and keyword stuffing crater it; natural prose
    * sits in a stable band for a given length). One (doc, token)
    * count; map-side combine does the heavy lifting. */
  def typeTokenRatio(docs: DataFrame): DataFrame =
    TextOps.tokensBag(docs)
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_types"), sum(col("tf")).as("n_tokens"))
      .select(col("doc_id"), col("n_types"), col("n_tokens"),
        expr("(1000000 * n_types) div n_tokens").as("ttr_ppm"))
      .orderBy("doc_id")

  /** Vocabulary coverage point: the smallest top-k vocab prefix (tf
    * desc, token asc — the deterministic [[vocabulary]] rank) whose
    * cumulative frequency reaches `num`/`den` of total token mass,
    * with the exact share it lands on. The tokenizer-budget planning
    * scalar ("how big must the vocab be to cover 90%"). The rank
    * window runs over the VOCAB-sized tf aggregate, never the corpus
    * (the zipfFit discipline); the crossing test is an integer
    * cross-multiply and the share a DECIMAL(38,0)/HUGEINT-widened
    * floor-ppm. */
  def vocabCoverage(docs: DataFrame, num: Int = 9, den: Int = 10): DataFrame = {
    val tf = TextOps.tokensBag(docs).groupBy("token").agg(count(lit(1)).as("tf"))
    val w = Window.orderBy(col("tf").desc, col("token"))
    val ranked = tf
      .withColumn("rk", row_number().over(w))
      .withColumn("cum", sum(col("tf")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint(true)
    val tot = ranked.agg(max(col("cum")).as("total"),
      count(lit(1)).as("vocab"))
    ranked.crossJoin(broadcast(tot))
      .filter(col("cum") * den >= col("total") * num)
      .orderBy("rk").limit(1)
      .select(col("total").as("n_tokens_total"), col("vocab").as("vocab_size"),
        col("rk").cast("long").as("cover_k"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * cum)" +
          " div CAST(total AS DECIMAL(38,0)) AS BIGINT)").as("cover_share_ppm"))
  }

  /** Tokenizer fertility by language: regex tokens emitted per
    * whitespace word, aggregated per `lang` bucket — the
    * multilingual-corpus health check (a tokenizer that fragments one
    * language inflates its effective sequence length and its compute
    * share; fertility per language is the standard diagnostic).
    * Word counts are a MAP-ONLY split-length expression, token counts
    * one doc-keyed agg, the final frame |langs| rows; fertility is
    * exact floor-ppm, −1 when a bucket has no words (NULL-free gate
    * columns). */
  def tokenizerFertility(docs: DataFrame): DataFrame = {
    val tok = TextOps.tokensBag(docs).groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"))
    docs
      .select(col("doc_id"), col("lang"),
        when(length(trim(col("text"))) === 0, 0L)
          .otherwise(size(split(trim(col("text")), "\\s+")).cast("long"))
          .as("n_words"))
      .join(tok, Seq("doc_id"), "left")
      .select(col("lang"), col("n_words"),
        coalesce(col("n_tok"), lit(0L)).as("n_tok"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        sum(col("n_words")).as("n_words"))
      .select(col("lang"), col("n_docs"), col("n_tokens"), col("n_words"),
        // DECIMAL(38,0)-widened ppm (oracle: HUGEINT): 10⁶·n_tokens
        // outgrows a long once a language bucket passes ~9e12 tokens —
        // the 100 TB regime, not a corner case
        expr("CASE WHEN n_words = 0 THEN CAST(-1 AS BIGINT)" +
          " ELSE (CAST(1000000 AS DECIMAL(38,0)) * n_tokens)" +
          " div CAST(n_words AS DECIMAL(38,0)) END").as("fertility_ppm"))
      .orderBy("lang")
  }

  /** N-gram novelty: the fraction of a doc's DISTINCT 3-token
    * shingles that appear in no other document (corpus df = 1) — how
    * much text this doc contributes that exists nowhere else. The
    * inverse signal of the dedup family: boilerplate scores ~0,
    * unique content ~10⁶ ppm. One shingle-df aggregation joined back
    * to the per-doc distinct shingle frame; exact integer ppm.
    */
  def ngramNovelty(docs: DataFrame): DataFrame = {
    val sh = TextOps.shinglesShared(docs)
    val df = TextOps.shingleDfShared(docs)
    sh.join(df, "sh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1L, 1L).otherwise(0L)).as("n_unique"))
      .select(col("doc_id"), col("n_shingles"), col("n_unique"),
        expr("(1000000 * n_unique) div n_shingles").as("novelty_ppm"))
      .orderBy("doc_id")
  }

  /** Templated-ness score — [[ngramNovelty]]'s opposite tail: the
    * fraction of a doc's DISTINCT 3-token shingles that are CORPUS-
    * COMMON, i.e. appear in at least ⌈n_docs/dfDen⌉ documents (the
    * threshold rides the integer cross-multiplication df·dfDen ≥
    * n_docs, so it is scale-free and float-free). The C4/boilerplate
    * quality gate: navigation chrome, license blocks, and template
    * pages score near 10⁶ ppm while organic prose stays low. Same
    * plan shape as novelty — one shingle-df agg joined back to the
    * per-doc distinct shingles, one 1-row corpus count broadcast —
    * and the df frame is computed once for both signals at 100 TB.
    */
  def templateScore(docs: DataFrame, dfDen: Int = 20): DataFrame = {
    val sh = TextOps.shinglesShared(docs)
    val df = TextOps.shingleDfShared(docs)
    val nDocs = docs.select(countDistinct(col("doc_id")).as("n_docs"))
    sh.join(df, "sh")
      .crossJoin(broadcast(nDocs))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") * dfDen >= col("n_docs"), 1L).otherwise(0L))
          .as("n_common"))
      .select(col("doc_id"), col("n_shingles"), col("n_common"),
        expr("(1000000 * n_common) div n_shingles").as("template_ppm"))
      .orderBy("doc_id")
  }

  /** Zipf fit over the top-`topV` vocabulary: least-squares slope of
    * ln(freq) on ln(rank) — the corpus-health scalar (natural text
    * sits near −1; template floods flatten it, spam steepens it).
    * Ranks come from the deterministic (ctf desc, token) order; the
    * four regression sums are over ≤ topV terms of ln(exact longs),
    * each rounded at 6dp (the entropy contract), and the final
    * slope/intercept are floor-form 4dp — the intercept reuses the
    * ROUNDED slope so both engines divide identical doubles. The
    * top-topV cut is a parallel TakeOrdered over the vocab-sized tf
    * frame; only the ≤ topV surviving rows see a ranking window.
    */
  def zipfFit(docs: DataFrame, topV: Int = 30): DataFrame = {
    val ctf = TextOps.tokensBag(docs)
      .groupBy("token").agg(count(lit(1)).as("ctf"))
    // top-topV via TakeOrdered (the oovRate shape — parallel partial
    // top-k, never a global row_number window that would funnel the
    // whole vocabulary into one partition); ranks are then assigned
    // on the ≤ topV-row frame, where a single-partition window is
    // exactly the right plan
    val ranked = ctf
      .orderBy(col("ctf").desc, col("token")).limit(topV)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("ctf").desc, col("token"))))
      .select(log(col("rk").cast("double")).as("x"),
        log(col("ctf").cast("double")).as("y"))
    val s = ranked.agg(count(lit(1)).as("k"),
      round(sum(col("x")), 6).as("sx"), round(sum(col("y")), 6).as("sy"),
      round(sum(col("x") * col("y")), 6).as("sxy"),
      round(sum(col("x") * col("x")), 6).as("sxx"))
    val rnd = graft.functions.Rounding.rnd _
    s.withColumn("slope",
        rnd((col("k") * col("sxy") - col("sx") * col("sy")) /
          (col("k") * col("sxx") - col("sx") * col("sx")), 4))
      .select(col("k").as("n_tokens"), col("slope"),
        rnd((col("sy") - col("slope") * col("sx")) / col("k"), 4)
          .as("intercept"))
  }

  /** Per-source domain drift: KL(source ‖ corpus) over the unigram
    * distributions — the mixture-health number that flags a source
    * whose token distribution has diverged from the pool it feeds
    * (crawl rot, template floods). KL = Σ_t (c_st/n_s)·ln((c_st·n)/
    * (n_s·c_t)) with every count an exact long; the float surface is
    * the entropy-style contract: the weighted log sum rounds
    * at 4dp, the final per-token division floor-rounds at 4dp. Two
    * narrow aggs ((source, token) then token/corpus) and a broadcast
    * of the vocab-sized frames — nothing scales with the corpus but
    * the first count.
    */
  def sourceKl(docs: DataFrame): DataFrame = {
    val tf = TextOps.tokensBag(docs)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy("source", "token").agg(count(lit(1)).as("c_st"))
      .localCheckpoint(true)
    val corpus = tf.groupBy("token").agg(sum(col("c_st")).as("c_t"))
    val nS = tf.groupBy("source").agg(sum(col("c_st")).as("n_s"))
    val n = corpus.agg(sum(col("c_t")).as("n"))
    tf.join(broadcast(corpus), "token")
      .join(broadcast(nS), "source")
      .crossJoin(broadcast(n))
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_tokens"),
        round(sum(col("c_st") *
          (log(col("c_st").cast("double")) + log(col("n").cast("double"))
            - log(col("n_s").cast("double")) - log(col("c_t").cast("double")))),
          4).as("_skl"))
      .select(col("source"), col("n_tokens"),
        graft.functions.Rounding.rnd(col("_skl") / col("n_tokens"), 4).as("kl"))
      .orderBy("source")
  }

  /** D22 training-mixture weights: per-source token counts →
    * temperature-scaled sampling weights (the PaLM/LLaMA-style α=0.5
    * mixing that upsamples small high-value sources). The weight base
    * is the FIXED-POINT integer ⌊√(n_tokens·10⁶)⌋ — sqrt of the same
    * integer is the same correctly-rounded double on every engine, so
    * weights are ratios of exact integers and immune to summation
    * order. One groupBy(source) + a 1-row broadcast of the totals.
    */
  def mixtureWeights(docs: DataFrame): DataFrame = {
    val per = docs.select(col("source"),
        size(expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
          .cast("long").as("n_tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .withColumn("w", floor(sqrt(col("n_tokens").cast("double") * 1000000.0)).cast("long"))
      // one row per source — materialize so the totals row below reuses
      // this aggregate instead of re-scanning the corpus
      .localCheckpoint(true)
    val tot = per.agg(sum(col("n_tokens")).as("tot_tokens"), sum(col("w")).as("tot_w"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens") / col("tot_tokens"), 6).as("share"),
        round(col("w") / col("tot_w"), 6).as("mix_weight"),
        round((col("w") / col("tot_w")) / (col("n_tokens") / col("tot_tokens")), 4)
          .as("upsample"))
      .orderBy("source")
  }

  /** PII regex patterns (D20). Written with `[.]` instead of `\.` and
    * `[0-9]`/`[a-zA-Z]` instead of `\d`/case flags so the identical
    * pattern string is valid in Java regex AND RE2 with the same
    * match extents (mixed-case real-world PII matches too — the gate's
    * synthetic spans are lowercase, but the detector must not be). */
  val EmailPat = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z]{2,}"
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

  private def rnd(c: org.apache.spark.sql.Column, s: Int): org.apache.spark.sql.Column =
    graft.functions.Rounding.rnd(c, s)

  /** D24 repetition signals (the Gopher quality-filter family,
    * Rae et al. 2021 §A1.1): per document, the duplicate-word
    * fraction, duplicate-word-2-gram fraction, and top-single-word
    * fraction — the three cheapest "is this doc degenerate
    * boilerplate" measurements. Everything is per-row ARRAY
    * expression code: no explode, no shuffle, one codegen'd scan —
    * at 100 TB this is a map-only pass.
    *
    * All three ratios are small-integer divisions rounded floor-form,
    * so the oracle replays bit-identical doubles. The per-doc
    * top-word count is O(distinct·n) array work, bounded by document
    * length — cheap next to the I/O of the scan.
    */
  def repetition(docs: DataFrame): DataFrame = {
    val words = filter(split(lower(col("text")), "[^a-z0-9]+"), w => w =!= "")
    docs.select(col("doc_id"), words.as("w"))
      .withColumn("n_words", size(col("w")).cast("long"))
      .withColumn("g",
        when(col("n_words") >= 2,
          transform(sequence(lit(1), size(col("w")) - 1),
            i => concat(element_at(col("w"), i), lit(" "),
              element_at(col("w"), i + 1))))
          .otherwise(array().cast("array<string>")))
      .select(
        col("doc_id"), col("n_words"),
        when(col("n_words") > 0,
          rnd((col("n_words") - size(array_distinct(col("w"))))
            / col("n_words"), 4)).otherwise(lit(0.0)).as("dup_word_frac"),
        when(size(col("g")) > 0,
          rnd((size(col("g")) - size(array_distinct(col("g"))))
            / size(col("g")), 4)).otherwise(lit(0.0)).as("dup_2gram_frac"),
        when(col("n_words") > 0,
          rnd(array_max(transform(array_distinct(col("w")),
            t => size(filter(col("w"), x => x === t))))
            / col("n_words"), 4)).otherwise(lit(0.0)).as("top_word_frac"))
      .orderBy("doc_id")
  }

  /** Positional-overlap candidate pairs from winnowing fingerprints
    * (the MOSS/plagiarism-detection join, Schleimer et al. §4): two
    * documents sharing ≥ `minShared` selected fingerprints contain
    * aligned runs the set-based dedup family can only score, not
    * localize. Candidates come from an equality join on the
    * fingerprint, so a boilerplate shingle selected in thousands of
    * docs would go quadratic — fingerprints with document frequency
    * > `maxDf` are dropped first (the same stopword cap as
    * calleeJaccard's hub rule, replayed by the oracle).
    */
  def winnowPairs(docs: DataFrame, window: Int = 4, minShared: Int = 2,
      maxDf: Int = 100): DataFrame = {
    val fp = winnow(docs, window)
      .select(col("doc_id"), col("fingerprint")).distinct()
    val kept = fp.join(
        fp.groupBy("fingerprint").agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxDf).select("fingerprint"),
        Seq("fingerprint"), "left_semi")
      .localCheckpoint(true)
    kept.as("x").join(kept.as("y"),
        col("x.fingerprint") === col("y.fingerprint") &&
          col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy("doc_a", "doc_b")
  }

  /** Winnowing pack base: key = sh·PACK + (PACK−1−seq) makes one long
    * whose integer MIN is the (hash asc, position DESC) arg-min — the
    * standard winnowing tie rule (rightmost minimal hash) with no
    * struct comparison to diverge on. sh < 2³¹ and seq < 10⁹ keep the
    * key < 2.2e18 < 2⁶³. */
  private val Pack = 1000000000L

  /** D25 winnowing fingerprints (Schleimer, Wilkerson, Aiken,
    * "Winnowing: Local Algorithms for Document Fingerprinting",
    * SIGMOD 2003): slide a window of `window` consecutive word-3-gram
    * hashes and keep each window's minimal hash (ties → rightmost).
    * Guarantees every shared run of ≥ window+2 words between two
    * documents shares a selected fingerprint, at ~2/(window+1)
    * storage — the positional overlap-LOCALIZATION primitive that
    * set-based dedup (minhash et al.) cannot provide.
    *
    * Shape: the shingle hashes and both window functions live inside
    * the per-document partition (documents are the partition unit at
    * scale — no wide shuffle), and the distinct on selections is the
    * only corpus-wide op. Returns (doc_id, pos, fingerprint).
    */
  def winnow(docs: DataFrame, window: Int = 4): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("seq")
      .rowsBetween(Window.currentRow, window - 1)
    TextOps.shinglesSeq(docs)
      .withColumn("key", col("sh") * Pack + (lit(Pack - 1) - col("seq")))
      .withColumn("mk", min(col("key")).over(w))
      .withColumn("wn", count(lit(1)).over(w))
      .filter(col("wn") === window)
      .select(col("doc_id"), col("mk")).distinct()
      .select(col("doc_id"),
        (lit(Pack - 1) - (col("mk") % Pack)).as("pos"),
        // integer div — a double division would lose precision on
        // keys above 2⁵³
        expr(s"mk div ${Pack}L").as("fingerprint"))
      .orderBy("doc_id", "pos")
  }

  /** CCNet-style perplexity buckets (Wenzek et al. 2020): docs split
    * into head / middle / tail by the corpus TERCILES of their
    * unigram cross-entropy — the classic "train on head+middle, drop
    * tail" quality gate. The tercile cuts come from a centi-nat CE
    * histogram cum-crossed at n/3 and 2n/3 (the RFM quartile
    * discipline — no global ntile window ever sees the corpus; the
    * histogram is ≤ a few thousand rows at any size since CE lives
    * in [0, ~20] nats). ce2 = ⌊100·ce⌋ on the 4-dp CE contract
    * double, identical on both engines. Returns (bucket, n_docs,
    * n_tokens). */
  def perplexityBuckets(docs: DataFrame): DataFrame = {
    val ced = unigramCrossEntropy(docs)
      .select(col("doc_id"), col("n_tokens"),
        floor(col("ce") * 100).cast("long").as("ce2"))
      .localCheckpoint(true)
    val hist = ced.groupBy("ce2").agg(count(lit(1)).as("c")).localCheckpoint(true)
    val n = hist.agg(coalesce(sum("c"), lit(0L)).as("n"))
    val cum = hist.withColumn("cum",
        sum("c").over(org.apache.spark.sql.expressions.Window.orderBy("ce2")))
      .crossJoin(broadcast(n))
    val cut1 = cum.filter(col("cum") * 3 >= col("n")).agg(min("ce2").as("cut1"))
    val cut2 = cum.filter(col("cum") * 3 >= col("n") * 2).agg(min("ce2").as("cut2"))
    ced.crossJoin(broadcast(cut1)).crossJoin(broadcast(cut2))
      .select(col("doc_id"), col("n_tokens"),
        when(col("ce2") <= col("cut1"), "head")
          .when(col("ce2") <= col("cut2"), "middle")
          .otherwise("tail").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
      .orderBy("bucket")
  }

  /** Power-of-two document-length histogram — the sequence-packing
    * planner's length profile (which context budget wastes least
    * padding): bucket = index of n_bpe_tokens' highest set bit,
    * computed as length(bin(n)) − 1 — a pure codegen integer on both
    * engines, no float log2 anywhere; zero-token docs land in bucket
    * −1. Map-only to a ≤ 64-row histogram. */
  def lengthHistogram(docs: DataFrame): DataFrame =
    docs.select(
        size(expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
          .cast("long").as("n"))
      .select(when(col("n") === 0, lit(-1L))
        .otherwise((length(bin(col("n"))) - 1).cast("long")).as("bucket_log2"),
        col("n"))
      .groupBy("bucket_log2")
      .agg(count(lit(1)).as("n_docs"), sum("n").as("n_tokens"))
      .orderBy("bucket_log2")

  /** Language-ID evaluation: the confusion matrix of the D8 n-gram
    * heuristic's prediction against the corpus's ground-truth `lang`
    * column — the calibration read that decides whether the cheap
    * classifier is good enough to stratify on. One langId pass + one
    * doc-keyed join + a |langs|²-row agg; docs the tokenizer yields
    * no tokens for are absent on BOTH engines (same tok frame). */
  def langIdConfusion(docs: DataFrame): DataFrame =
    langId(docs)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "lang_pred")

  /** Per-source corpus profile — the one-pager a mixture designer
    * reads before weighting sources: doc count, char and token mass
    * (the text_tokens BPE regex contract), floor-mean tokens/doc,
    * language spread (distinct `lang` values) and the majority
    * language (count desc, lang asc — the min-of-struct argmax, no
    * per-source sort). ONE corpus scan collapses to the
    * (source, lang)-sized frame; everything downstream re-aggregates
    * those few rows, so the profile costs a single
    * map-side-combinable shuffle at any corpus size. */
  def sourceProfile(docs: DataFrame): DataFrame = {
    val byLang = docs.select(col("source"), col("lang"),
        col("n_chars").cast("long").as("nc"),
        size(expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
          .cast("long").as("toks"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n"), sum("nc").as("c"), sum("toks").as("t"))
      .localCheckpoint(true)
    val top = byLang.groupBy("source")
      .agg(min(struct((lit(0L) - col("n")).as("nn"), col("lang").as("l"))).as("m"))
      .select(col("source"), col("m.l").as("top_lang"))
    byLang.groupBy("source")
      .agg(sum("n").as("n_docs"), sum("c").as("n_chars"),
        sum("t").as("n_tokens"), count(lit(1)).as("n_langs"))
      .join(top, "source")
      .select(col("source"), col("n_docs"), col("n_chars"), col("n_tokens"),
        expr("n_tokens div n_docs").as("mean_tokens"),
        col("n_langs"), col("top_lang"))
      .orderBy("source")
  }

  /** Per-document sentence-shape statistics — the readability/
    * formatting companion to [[quality]]: sentences are maximal
    * spans between [.!?] runs with at least one word character;
    * reported per doc are the sentence count, total words, and the
    * floor mean/max words-per-sentence. Everything is ONE map-only
    * projection (split + lambda filter + transform — all codegen
    * higher-order functions, zero shuffle before the final sort), so
    * the 100 TB cost is the scan itself. */
  def sentenceStats(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        expr("""filter(
                 transform(split(lower(text), '[.!?]+'),
                   s -> size(filter(split(s, '[^a-z0-9]+'), w -> w != ''))),
                 n -> n > 0)""").as("wc"))
      .select(col("doc_id"),
        size(col("wc")).cast("long").as("n_sentences"),
        coalesce(expr("aggregate(wc, 0L, (a, x) -> a + x)"), lit(0L))
          .as("n_words"),
        coalesce(expr("array_max(wc)"), lit(0)).cast("long")
          .as("max_sentence_words"))
      .withColumn("mean_sentence_words",
        when(col("n_sentences") === 0, 0L)
          .otherwise(expr("n_words div n_sentences")))
      .orderBy("doc_id")

  /** Source-concentration profile (Herfindahl–Hirschman index over
    * token mass) — the one-number "is this mixture dominated by one
    * crawl" screen read next to [[mixtureWeights]]: hhi_ppm =
    * Σ_s ⌊10⁶·t_s²/N²⌋ (per-term floor, DECIMAL(38,0)/HUGEINT
    * products) ranges from 10⁶/n_sources (balanced) to 10⁶
    * (monopoly); top_share_ppm names the dominant source's share.
    * Token counts are the [[tokenCounts]] regex contract. ONE corpus
    * scan collapsing to the |sources|-row frame; everything after is
    * arithmetic on that frame. */
  def sourceConcentration(docs: DataFrame): DataFrame = {
    val bySrc = docs
      .select(col("source"),
        size(expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
          .cast("long").as("toks"))
      .groupBy("source").agg(sum(col("toks")).as("t"))
      .localCheckpoint(true)
    val tot = bySrc.agg(sum(col("t")).as("n"))
    bySrc.crossJoin(broadcast(tot))
      .agg(count(lit(1)).as("n_sources"),
        max(col("n")).as("n_tokens"),
        sum(expr("""(CAST(1000000 AS DECIMAL(38,0)) * t * t) div
          (CAST(n AS DECIMAL(38,0)) * n)""")).cast("long").as("hhi_ppm"),
        expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * MAX(t))
          div MAX(CAST(n AS DECIMAL(38,0))) AS BIGINT)""").as("top_share_ppm"))
  }

  /** Per-source token-length percentiles — the sequence-length budget
    * read per source before packing/truncation decisions (D15/D61
    * plan against these): rank-selected min/med/p90/max over the
    * [[tokenCounts]] regex contract, ties broken by doc_id (the
    * events_mad selection — never interpolation, so the engines'
    * percentile functions never meet). One map-only count + one
    * source-keyed window. */
  def lengthProfile(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("source").orderBy(col("toks"), col("doc_id"))
    docs
      .select(col("source"), col("doc_id"),
        size(expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
          .cast("long").as("toks"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("source")))
      .groupBy("source")
      .agg(max(col("n")).as("n_docs"),
        min(col("toks")).as("min_toks"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("toks"))).as("med_toks"),
        max(when(col("rn") === expr("(9 * n + 9) div 10"), col("toks"))).as("p90_toks"),
        max(col("toks")).as("max_toks"))
      .orderBy("source")
  }

  /** Per-source hapax-legomena profile — the vocabulary-health screen
    * (a healthy natural corpus keeps ~40-60% of its vocabulary at
    * frequency 1; templated or deduplicate-to-death corpora collapse
    * below that, OCR noise inflates it): vocabulary size, hapax
    * count (types seen exactly once in the source), both ratios as
    * floor ppm over exact longs. Two narrow (source, token)-keyed
    * aggs — the (source, token) frame is the operator's only
    * shuffle, and it map-side combines. */
  def hapax(docs: DataFrame): DataFrame =
    TextOps.tokensBag(docs)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy("source", "token").agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(count(lit(1)).as("vocab_size"),
        sum(col("c")).as("n_tokens"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("source"), col("vocab_size"), col("n_tokens"), col("n_hapax"),
        expr("(1000000 * n_hapax) div vocab_size").as("hapax_vocab_ppm"),
        expr("(1000000 * n_hapax) div n_tokens").as("hapax_token_ppm"))
      .orderBy("source")

  /** Pairwise Jensen-Shannon divergence between source unigram
    * distributions — the SYMMETRIC, bounded ([0, ln 2]) companion to
    * [[sourceKl]] for mixture design (KL explodes on disjoint
    * support; JS is what you threshold when deciding whether two
    * crawls are "the same distribution"). JS(P‖Q) = ½Σp·ln(2p/(p+q))
    * + ½Σq·ln(2q/(p+q)) over the union vocabulary, computed from
    * exact counts — p = c_a/n_a, q = c_b/n_b — with the single float
    * surface the shared 4dp-round contract ([[graft.functions
    * .Rounding]]). Plan: ONE (source, token) agg, a self-join keyed
    * on token restricted to source_a < source_b (vocab-sized, not
    * corpus-sized), one pair-keyed agg — |sources|² output rows.
    * Absent-token terms use p=0 (their ½p·ln(...) term vanishes), so
    * the full outer union is two one-sided complements computed from
    * the same frame rather than a dense cross. */
  def sourceJsDivergence(docs: DataFrame): DataFrame = {
    val tf = TextOps.tokensBag(docs)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy("source", "token").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val nS = tf.groupBy("source").agg(sum(col("c")).as("n")).localCheckpoint(true)
    val a = tf.join(nS, "source")
      .select(col("source").as("source_a"), col("token"),
        col("c").as("ca"), col("n").as("na"))
    val b = tf.join(nS, "source")
      .select(col("source").as("source_b"), col("token"),
        col("c").as("cb"), col("n").as("nb"))
    val pairs = nS.select(col("source").as("source_a"))
      .crossJoin(nS.select(col("source").as("source_b")))
      .filter(col("source_a") < col("source_b"))
    // ONE token-keyed join carries the shared-support terms AND both
    // shared masses; a token absent from one side contributes exactly
    // p·ln 2, and Σ_only-in-a p = 1 − Σ_shared p, so the one-sided
    // contribution is (1 − sharedMass)·ln 2 per side — no outer join.
    val shared = a.join(b, "token")
      .filter(col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"),
        (col("ca") / col("na")).as("p"), (col("cb") / col("nb")).as("q"))
      .groupBy("source_a", "source_b")
      .agg(
        sum(col("p") * log(lit(2.0) * col("p") / (col("p") + col("q")))
          + col("q") * log(lit(2.0) * col("q") / (col("p") + col("q"))))
          .as("t_shared"),
        sum(col("p")).as("pa_shared"),
        sum(col("q")).as("qb_shared"))
    pairs.join(shared, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"),
        graft.functions.Rounding.rnd(
          (coalesce(col("t_shared"), lit(0.0))
            + (lit(2.0) - coalesce(col("pa_shared"), lit(0.0))
              - coalesce(col("qb_shared"), lit(0.0))) * log(lit(2.0)))
            / lit(2.0), 4).as("js_div"))
      .orderBy("source_a", "source_b")
  }
}
