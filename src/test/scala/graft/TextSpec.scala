package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextOps
import graft.pipeline.TextAnalysis
import graft.search.Fulltext

/** Unit semantics for tokenization, fulltext scoring, and the text
  * analysis operators on hand-checked inputs.
  */
class TextSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)

  def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("tokenizer lowercases, splits on non-alnum, renumbers") {
    val t = TextOps.tokens(docs(1L -> "Hello, World! 42x"))
      .collect().map(r => (r.getString(1), r.getInt(2)))
    assert(t.toSeq == Seq(("hello", 1), ("world", 2), ("42x", 3)))
  }

  test("fulltext: tf-idf ranks the doc with more matches higher") {
    val d = docs(
      1L -> "spark spark spark query",
      2L -> "spark and nothing else relevant",
      3L -> "no relevant words at all")
    val hits = Fulltext.search(d, Seq("spark", "query"))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(hits.map(_._1).toSeq == Seq(1L, 2L)) // doc 3 absent
    assert(hits.head._2 == 2L) // doc 1 matched both terms
  }

  test("bm25 rank-diverges from tf-idf on a length-skewed corpus") {
    // doc 1: short, one exact hit. doc 2: verbose, repeats the term.
    // tf-idf (no length norm) must put doc 2 first; BM25's dl/avgdl
    // penalty must flip the order — the Lucene-parity behavior the
    // reference's score column exhibits.
    val filler = (1 to 60).map(i => s"filler$i").mkString(" ")
    val d = docs(
      1L -> "spark overview",
      2L -> s"spark spark $filler",
      3L -> "completely unrelated text")
    val tfidf = Fulltext.search(d, Seq("spark")).collect().map(_.getLong(0)).toSeq
    val bm25 = Fulltext.bm25Search(d, Seq("spark")).collect().map(_.getLong(0)).toSeq
    assert(tfidf == Seq(2L, 1L), s"tf-idf should favor raw tf: $tfidf")
    assert(bm25 == Seq(1L, 2L), s"bm25 should favor the short exact hit: $bm25")
    // and at b = 0, BM25 degrades to pure tf saturation (no length
    // penalty): the verbose doc leads again
    val noNorm = Fulltext.bm25SearchIndex(Fulltext.buildIndex(d), Seq("spark"), b = 0.0)
      .collect().map(_.getLong(0)).toSeq
    assert(noNorm == Seq(2L, 1L), s"b=0 should drop the length penalty: $noNorm")
  }

  test("prefix search matches wildcard tokens") {
    val hits = Fulltext.prefixSearch(docs(1L -> "windows window wind", 2L -> "door"),
      "wind").collect()
    assert(hits.length == 1 && hits(0).getLong(0) == 1L && hits(0).getLong(2) == 3L)
  }

  test("contains search: infix wildcard, terms AND-joined (reference default)") {
    val d = docs(
      1L -> "bitcoinwallet_v2 sendmoney",   // "coin" infix, "send" prefix-infix
      2L -> "bitcoin only here",            // matches coin but not send
      3L -> "sending stuff",                // matches send but not coin
      4L -> "nothing relevant")
    val hits = Fulltext.containsSearch(d, Seq("coin", "send"))
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(hits.map(_._1).toSeq == Seq(1L)) // AND semantics: only doc 1 has both
    assert(hits.head._2 == 2)
  }

  test("index save/load round-trips and searches identically") {
    val d = docs(
      1L -> "spark spark window", 2L -> "spark query", 3L -> "plain words")
    val dir = java.nio.file.Files.createTempDirectory("ftidx").toString
    Fulltext.saveIndex(Fulltext.buildIndex(d), dir)
    val loaded = Fulltext.loadIndex(spark, dir)
    val direct = Fulltext.search(d, Seq("spark", "window")).collect().toSeq
    val viaIndex = Fulltext.searchIndex(loaded, Seq("spark", "window")).collect().toSeq
    assert(direct == viaIndex)
    assert(Fulltext.containsSearchIndex(loaded, Seq("par")).collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("mergeIndex: append docs, search merged == search rebuilt") {
    val base = docs(1L -> "spark spark window", 2L -> "spark query")
    val extra = docs(3L -> "window merge spark", 4L -> "unrelated words")
    val merged = Fulltext.mergeIndex(Fulltext.buildIndex(base), extra)
    val rebuilt = Fulltext.buildIndex(docs(
      1L -> "spark spark window", 2L -> "spark query",
      3L -> "window merge spark", 4L -> "unrelated words"))
    for (terms <- Seq(Seq("spark"), Seq("window", "merge"))) {
      val a = Fulltext.searchIndex(merged, terms).collect().toSeq
      val b = Fulltext.searchIndex(rebuilt, terms).collect().toSeq
      assert(a == b, s"merged != rebuilt for $terms")
    }
    // the merged corpus size (idf denominator) re-aggregated correctly
    assert(merged.meta.collect()(0).getLong(0) == 4L)
  }

  test("mergeIndex: re-imported doc id gets last-write-wins, no double count") {
    val base = docs(1L -> "spark spark window", 2L -> "spark query")
    // doc 2 re-imported with NEW content (the GraphStore.merge case)
    val update = docs(2L -> "merge words only", 3L -> "window spark")
    val merged = Fulltext.mergeIndex(Fulltext.buildIndex(base), update)
    val rebuilt = Fulltext.buildIndex(docs(
      1L -> "spark spark window", 2L -> "merge words only", 3L -> "window spark"))
    for (terms <- Seq(Seq("spark"), Seq("query"), Seq("merge"))) {
      assert(Fulltext.searchIndex(merged, terms).collect().toSeq ==
        Fulltext.searchIndex(rebuilt, terms).collect().toSeq, s"terms $terms")
    }
    assert(merged.meta.collect()(0).getLong(0) == 3L) // not 4
    // doc 2's stale tokens no longer match
    assert(!Fulltext.searchIndex(merged, Seq("query")).collect()
      .map(_.getLong(0)).contains(2L))
  }

  test("mergeIndex: duplicate doc_id rows inside one batch collapse, no double count") {
    val base = docs(1L -> "spark spark window")
    // doc 3 appears TWICE in the batch: must count once in the corpus
    // size and produce one postings set (deterministically: max text)
    val update = docs(3L -> "alpha words", 3L -> "zeta words", 4L -> "window spark")
    val merged = Fulltext.mergeIndex(Fulltext.buildIndex(base), update)
    val rebuilt = Fulltext.buildIndex(docs(
      1L -> "spark spark window", 3L -> "zeta words", 4L -> "window spark"))
    assert(merged.meta.collect()(0).getLong(0) == 3L) // not 4
    for (terms <- Seq(Seq("spark"), Seq("zeta"), Seq("alpha"), Seq("words"))) {
      assert(Fulltext.searchIndex(merged, terms).collect().toSeq ==
        Fulltext.searchIndex(rebuilt, terms).collect().toSeq, s"terms $terms")
    }
    // no duplicated postings rows for doc 3
    val p3 = merged.postings.filter(org.apache.spark.sql.functions.col("doc_id") === 3L)
      .collect()
    assert(p3.map(_.getString(1)).distinct.length == p3.length)
  }

  test("char-n-gram pre-filter: contains search identical through the vocab index") {
    val d = docs(
      1L -> "bitcoinwallet_v2 sendmoney",
      2L -> "bitcoin only here",
      3L -> "sending stuff",
      4L -> "nothing relevant ab") // "ab" exercises the <n short-term fallback
    val idx = Fulltext.buildIndex(d)
    val grams = Fulltext.ngramVocab(idx)
    for (terms <- Seq(Seq("coin", "send"), Seq("coin"), Seq("ab"))) {
      val plain = Fulltext.containsSearchIndex(idx, terms).collect().toSeq
      val pruned = Fulltext.containsSearchNgramIndex(idx, grams, terms).collect().toSeq
      assert(plain == pruned, s"n-gram path diverged for $terms")
    }
  }

  test("language-ID: stopword-free text is 'unknown'") {
    val out = TextAnalysis.langId(docs(
      1L -> "the cat sat on the mat", 2L -> "qwerty zxcvb plmkn"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out == Map(1L -> "en", 2L -> "unknown"))
  }

  test("quality: digit-heavy text scores lower") {
    val q = TextAnalysis.quality(docs(
      1L -> "a normal sentence with words in it",
      2L -> "1234567890 1234567890 1234567890"))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("quality")).toMap
    assert(q(1L) > q(2L))
  }

  test("token counts: ws vs bpe-ish") {
    val t = TextAnalysis.tokenCounts(docs(1L -> "hello world, it's 42"))
      .collect()(0)
    assert(t.getLong(1) == 4L)  // whitespace tokens
    assert(t.getLong(2) == 7L)  // hello world , it ' s 42
  }

  test("fingerprint is content-determined and order-sensitive") {
    val f = TextAnalysis.fingerprint(docs(
      1L -> "one two three four", 2L -> "one two three four", 3L -> "four three two one"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(f(1L) == f(2L))
    assert(f(1L) != f(3L))
  }

  test("repetition: degenerate docs light up, varied docs stay near zero") {
    val r = TextAnalysis.repetition(docs(
      1L -> "spam spam spam spam",            // one word repeated
      2L -> "alpha beta gamma delta",         // all distinct
      3L -> "ab cd ab cd ab cd",              // repeated 2-gram
      4L -> "x"))                             // single word: no 2-grams
      .collect().map(x => x.getLong(0) -> (x.getAs[Long]("n_words"),
        x.getAs[Double]("dup_word_frac"), x.getAs[Double]("dup_2gram_frac"),
        x.getAs[Double]("top_word_frac"))).toMap
    assert(r(1L) == ((4L, 0.75, 0.6667, 1.0))) // 3 dup words; 3 grams, 1 distinct
    assert(r(2L) == ((4L, 0.0, 0.0, 0.25)))
    // doc 3: 6 words {ab,cd}→4 dups = 2/3; grams: ab-cd ×3, cd-ab ×2
    // → 5 grams, 2 distinct → 3/5; top word 3/6
    assert(r(3L) == ((6L, 0.6667, 0.6, 0.5)))
    assert(r(4L) == ((1L, 0.0, 0.0, 1.0)))
  }

  test("winnow: a shared word run yields a shared fingerprint; selection is sparse") {
    val shared = "the quick brown fox jumps over the lazy dog tonight"
    val d = docs(
      1L -> s"intro words first $shared trailing tail end here",
      2L -> s"completely different opening then $shared and another close",
      3L -> "nothing in common with those two documents at all today")
    val w = TextAnalysis.winnow(d, window = 4).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("fingerprint")))
    val byDoc = w.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // winnowing guarantee: a shared run of ≥ window+2 words (here 10)
    // shares at least one selected fingerprint
    assert((byDoc(1L) & byDoc(2L)).nonEmpty)
    assert((byDoc(1L) & byDoc(3L)).isEmpty)
    // density ~2/(w+1): far fewer selections than shingles
    val nShingles = TextOps.shingles(d.filter("doc_id = 1")).count()
    assert(byDoc(1L).size < nShingles)
  }

  test("winnow positions are in-doc 1-based shingle offsets") {
    val w = TextAnalysis.winnow(docs(1L -> "a b c d e f g h"), window = 4)
      .collect().map(r => r.getAs[Long]("pos"))
    // 8 words → 6 shingles → 3 windows of 4 → positions within [1, 6]
    assert(w.nonEmpty && w.forall(p => p >= 1 && p <= 6))
  }

  test("winnowPairs localizes the overlapping pair and honors the df cap") {
    val shared = "the quick brown fox jumps over the lazy dog tonight " +
      "while the band plays softly in the crowded park nearby"
    val d = docs(
      1L -> s"intro words first $shared trailing tail end here",
      2L -> s"completely different opening then $shared and another close",
      3L -> "nothing in common with those two documents at all today")
    val p = TextAnalysis.winnowPairs(d, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(p.map(t => (t._1, t._2)).toSeq == Seq((1L, 2L)),
      s"exactly the overlapping pair: ${p.toSeq}")
    assert(p.head._3 >= 2)
    // df cap = 1 kills every shared fingerprint → no pairs survive
    assert(TextAnalysis.winnowPairs(d, minShared = 1, maxDf = 1).count() == 0)
  }

  test("unigram cross-entropy: rare-token docs score higher than corpus-typical docs") {
    // corpus LM: a→3, b→1, T=4. doc 1 = "a a": ce = 2·ln(4/3)/2 ≈ 0.2877;
    // doc 2 = "a b": ce = (ln(4/3)+ln(4))/2 ≈ 0.8370
    val d = docs(1L -> "a a", 2L -> "a b")
    val out = TextAnalysis.unigramCrossEntropy(d)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(out(1L)._1 == 2L && out(2L)._1 == 2L)
    assert(out(2L)._2 > out(1L)._2, s"rare token must raise CE: $out")
    assert(out(1L)._2 == 0.2877 && out(2L)._2 == 0.837, s"fixed-point values: $out")
  }

  test("bpe encode: merged words collapse to trained symbol counts") {
    // word freqs: abab×2, ab×1. round 1 merges 'a b'→'ab' (weight 5);
    // round 2 merges 'ab ab'→'abab'; round 3 finds no pair and stops.
    // Final symbols: abab = 1, ab = 1.
    val d = docs(1L -> "abab ab", 2L -> "abab")
    val out = TextAnalysis.bpeEncode(d)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(1L -> ((2L, 2L)), 2L -> ((1L, 1L))),
      s"post-merge symbol counts wrong: $out")
  }

  test("bigram cross-entropy: unseen-context docs score higher, fixed-point values") {
    // corpus bigrams: (a,b)=3 [2 from doc1, 1 from doc2], (b,a)=1,
    // (a,c)=1; contexts a=4, b=1. doc3 "a c": ce = ln(4/1) = 1.3863;
    // doc2 "a b": ln(4/3) = 0.2877; doc1: (2·ln(4/3)+ln(1))/3 = 0.1918
    val d = docs(1L -> "a b a b", 2L -> "a b", 3L -> "a c")
    val out = TextAnalysis.bigramCrossEntropy(d)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(out(1L)._1 == 3L && out(2L)._1 == 1L && out(3L)._1 == 1L)
    assert(out(3L)._2 > out(2L)._2 && out(2L)._2 > out(1L)._2,
      s"rarer continuation must raise CE: $out")
    assert(out(3L)._2 == 1.3863 && out(2L)._2 == 0.2877 && out(1L)._2 == 0.1918,
      s"fixed-point values: $out")
  }

  test("hash features: counts conserve tokens, equal texts get equal vectors") {
    val d = docs(1L -> "x x y", 2L -> "x x y")
    val rows = TextAnalysis.hashFeatures(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.filter(_._1 == 1L).map(_._3).sum == 3L, s"token mass lost: ${rows.toSeq}")
    assert(rows.forall(r => r._2 >= 0 && r._2 < 64), s"bucket out of range: ${rows.toSeq}")
    val v1 = rows.filter(_._1 == 1L).map(r => (r._2, r._3)).toSet
    val v2 = rows.filter(_._1 == 2L).map(r => (r._2, r._3)).toSet
    assert(v1 == v2, s"identical docs must hash identically: $v1 vs $v2")
  }

  test("phrase search: adjacency required, occurrences counted, order matters") {
    import graft.search.Fulltext
    val d = docs(
      1L -> "the quick brown fox",
      2L -> "quick the brown",            // words present, not adjacent
      3L -> "quick brown quick brown")    // two occurrences
    val out = Fulltext.phraseSearch(d, "quick brown")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 3L -> 2L))
    // three-word phrase narrows further
    val three = Fulltext.phraseSearch(d, "the quick brown")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(three == Map(1L -> 1L))
    // reversed order matches nothing
    assert(Fulltext.phraseSearch(d, "brown the").count() == 0)
  }

  test("keywords: distinctive terms outrank the everywhere-word") {
    import org.apache.spark.sql.functions.col
    // "common" appears in every doc → idf ln(5/5) = 0 → score 0;
    // each doc's private word carries all the weight
    val d = docs(1L -> "common zebra zebra", 2L -> "common alpha",
      3L -> "common beta", 4L -> "common gamma")
    val top = TextAnalysis.keywords(d, k = 1)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(top == Map(1L -> "zebra", 2L -> "alpha", 3L -> "beta", 4L -> "gamma"))
    // tf weighting: with k=2 doc 1 ranks zebra (tf 2) above common
    // (score 0), and the common term's score really is 0
    val d1 = TextAnalysis.keywords(d, k = 2)
      .filter(col("doc_id") === 1L)
      .collect().map(r => (r.getInt(1), r.getString(2), r.getLong(5)))
    assert(d1.toSeq == Seq((1, "zebra", d1.head._3), (2, "common", 0L)))
    assert(d1.head._3 > 0)
  }

  test("readability: exact milli-unit Flesch, prose outscores a jargon wall") {
    // doc 1: "the cat sat. it ran!" — 2 sentence runs, 5 words,
    // vowel groups: e/a/a/i/a = 5 → wps=⌊1015·5/2⌋=2537,
    // spw=⌊84600·5/5⌋=84600 → 206835−2537−84600 = 119698
    // doc 2: one long latinate word pile, 1 sentence, syllable-heavy
    val d = docs(1L -> "the cat sat. it ran!",
      2L -> "incomprehensibility notwithstanding organizational",
      3L -> "zzz qqq") // vowel-free: syllables 0, score floors high
    val out = TextAnalysis.readability(d).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) == ((2L, 5L, 5L, 119698L)))
    assert(out(2L)._4 < out(1L)._4, "jargon wall reads harder than prose")
    assert(out(3L) == ((1L, 2L, 0L, 206835L - 2030L)))
  }

  test("pmi collocations: the glued pair wins with its exact micro score") {
    // (new, york) adjacent in all three docs; every other bigram is a
    // hapax and dies at minCount=2. Over the 6-bigram event space:
    // pmi = ln(3·6 / (3·3)) = ln 2 → ⌊693147.18 + 0.5⌋ = 693147
    val d = docs(1L -> "new york alpha", 2L -> "beta new york",
      3L -> "new york gamma")
    val out = TextAnalysis.pmiCollocations(d, minCount = 2, topK = 5).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getString(0), r.getString(1)) == ("new", "york"))
    assert(r.getLong(2) == 3L && r.getLong(3) == 3L && r.getLong(4) == 3L)
    assert(r.getLong(5) == 693147L)
  }

  test("zipf fit: an exact power law recovers its slope") {
    // freq(rank) = 1000·rank⁻¹ for ranks 1..4 → slope −1, intercept
    // ln 1000 ≈ 6.9078 (4dp floor-form)
    val text = Seq("aa" -> 1000, "bb" -> 500, "cc" -> 333, "dd" -> 250)
      .flatMap { case (t, n) => Seq.fill(n)(t) }.mkString(" ")
    val r = TextAnalysis.zipfFit(docs(1L -> text), topV = 4).collect()(0)
    assert(r.getLong(0) == 4L)
    assert(math.abs(r.getDouble(1) - (-1.0)) < 0.01, s"slope: ${r.getDouble(1)}")
    assert(math.abs(r.getDouble(2) - 6.9078) < 0.01, s"intercept: ${r.getDouble(2)}")
  }

  test("oov rate: tokens outside the top-V vocab counted in exact ppm") {
    val d = docs(1L -> "a a b", 2L -> "a c")
    // top-1 vocab = {a} (ctf 3); b and c are OOV
    val r = TextAnalysis.oovRate(d, topV = 1)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r == Map(1L -> ((3L, 1L, 333333L)), 2L -> ((2L, 1L, 500000L))))
    // a vocab bigger than the corpus: nothing is OOV
    val all = TextAnalysis.oovRate(d, topV = 10)
      .collect().map(x => x.getLong(0) -> x.getLong(3)).toMap
    assert(all == Map(1L -> 0L, 2L -> 0L))
  }

  test("templateScore: the shared boilerplate shingle scores, unique tails don't") {
    // 4 docs; "terms of service" appears in docs 1-3 (df=3), every
    // other shingle is doc-unique (df=1). dfDen=1 → common iff the
    // shingle is in EVERY doc (none); dfDen=2 → common iff df*2 ≥ 4.
    val d = docs(
      1L -> "terms of service alpha beta",
      2L -> "terms of service gamma delta",
      3L -> "epsilon terms of service",
      4L -> "zeta eta theta iota")
    val r2 = TextAnalysis.templateScore(d, dfDen = 2)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    // doc 1 shingles: (terms,of,service)(of,service,alpha)(service,alpha,beta)
    assert(r2(1L) == ((3L, 1L, 333333L)), s"got ${r2(1L)}")
    assert(r2(2L) == ((3L, 1L, 333333L)))
    assert(r2(3L) == ((2L, 1L, 500000L))) // (epsilon,terms,of)(terms,of,service)
    assert(r2(4L) == ((2L, 0L, 0L)))
    val r1 = TextAnalysis.templateScore(d, dfDen = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r1.values.forall(_ == 0L), s"df=3 < n_docs=4 must not be common: $r1")
  }
  test("lengthHistogram: highest-set-bit buckets, empty doc sentinel") {
    // token counts: 1 → bucket 0; 2,3 → bucket 1; 5 → bucket 2;
    // "" → 0 tokens → bucket −1
    val d = docs((1L, "a"), (2L, "a b"), (3L, "a b c"),
      (4L, "a b c d e"), (5L, ""))
    val r = graft.pipeline.TextAnalysis.lengthHistogram(d).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r == Map(-1L -> ((1L, 0L)), 0L -> ((1L, 1L)),
      1L -> ((2L, 5L)), 2L -> ((1L, 5L))), s"$r")
  }

  test("perplexityBuckets: common-token docs head, rare-token docs tail") {
    // CE ordering by construction: "a a a" (tf 6 of 14) ≈ 0.85 nat <
    // "b c" ≈ 1.95 < unique-token docs ≈ 2.64 — terciles split the
    // six docs 2/2/2 with token masses 6/4/4
    val d = docs((1L, "a a a"), (2L, "a a a"), (3L, "b c"), (4L, "b c"),
      (5L, "x y"), (6L, "z w"))
    val r = graft.pipeline.TextAnalysis.perplexityBuckets(d).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r == Map(
      "head" -> ((2L, 6L)), "middle" -> ((2L, 4L)), "tail" -> ((2L, 4L))), s"$r")
  }

  test("tokenizer fertility: regex tokens per whitespace word per lang") {
    import spark.implicits._
    // "a-b c": 2 whitespace words but 3 alnum-run tokens -> 1.5 fertility
    val d = Seq((1L, "a-b c", "en"), (2L, "x y", "de"))
      .toDF("doc_id", "text", "lang")
    val r = TextAnalysis.tokenizerFertility(d).collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r("en") == ((1L, 3L, 2L, 1500000L)))
    assert(r("de") == ((1L, 2L, 2L, 1000000L)))
  }

  test("vocab coverage: smallest prefix crossing 90% of token mass") {
    // "a" x9 + "b" x1: top-1 vocab covers exactly 90%
    val d = docs(1L -> (Seq.fill(9)("a") ++ Seq("b")).mkString(" "))
    val r = TextAnalysis.vocabCoverage(d).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((10L, 2L, 1L, 900000L)))
  }

  test("dsirWeights: target-looking docs score positive, off-target negative") {
    // doc 1 is pure stopwords (the en target); doc 2 shares nothing
    // with the target. Hand LM: V=5, ts=6, tt=4 → every doc-1 token
    // has ratio (ttf+1)/9 ÷ (ctf+1)/11 = 11/9; doc-2 tokens 11/18.
    val d = docs(1L -> "the and of the", 2L -> "zebra quark")
    val r = TextAnalysis.dsirWeights(d).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(3)))).toMap
    assert(r(1L)._1 == 4L && r(2L)._1 == 2L)
    assert(math.abs(r(1L)._2 - math.log(11.0 / 9)) < 1e-3, s"got ${r(1L)}")
    assert(math.abs(r(2L)._2 - math.log(11.0 / 18)) < 1e-3, s"got ${r(2L)}")
  }

  test("truncationPlan: histogram ladder, exact lost-token counts") {
    val d = docs(1L -> "a b c", 2L -> "a b c d e f")
    val r = TextAnalysis.truncationPlan(d, ls = Seq(2, 4, 8)).collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    // total = 9 tokens; L=2: both over, lose 1+4=5; L=4: doc2 loses 2
    assert(r(2L) == ((2L, 5L, 555555L)))
    assert(r(4L) == ((1L, 2L, 222222L)))
    assert(r(8L) == ((0L, 0L, 0L)))
  }

  test("hapax: frequency-1 types counted per source") {
    import spark.implicits._
    val d = Seq((1L, "a a b", "s1"), (2L, "c c c d e", "s2"))
      .toDF("doc_id", "text", "source")
    val r = TextAnalysis.hapax(d).collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    // s1: vocab {a,b}, hapax {b} → 500000 ppm of vocab
    assert(r("s1") == ((2L, 3L, 1L, 500000L)), s"$r")
    // s2: vocab {c,d,e}, hapax {d,e} → 666666 ppm
    assert(r("s2") == ((3L, 5L, 2L, 666666L)))
  }

  test("sourceJsDivergence: identical → 0, disjoint → ln 2") {
    import spark.implicits._
    val d = Seq((1L, "a b c", "s1"), (2L, "a b c", "s2"),
      (3L, "x y z", "s3")).toDF("doc_id", "text", "source")
    val r = TextAnalysis.sourceJsDivergence(d).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getDouble(2)).toMap
    assert(r(("s1", "s2")) == 0.0, s"$r")
    assert(r(("s1", "s3")) == 0.6931 && r(("s2", "s3")) == 0.6931) // ln 2 @4dp
  }

  test("lengthProfile: rank-selected percentiles per source") {
    import spark.implicits._
    // source s1: token counts 1..10 → med = rank 5 → 5, p90 = rank 9
    val d = (1 to 10).map(i =>
      (i.toLong, (1 to i).map(_ => "w").mkString(" "), "s1"))
      .toDF("doc_id", "text", "source")
    val r = TextAnalysis.lengthProfile(d).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) == ((10L, 1L, 5L, 9L, 10L)), s"${r.toSeq}")
  }

  test("sourceConcentration: monopoly → 10⁶, balance → n·(10⁶/n²)") {
    import spark.implicits._
    val mono = Seq((1L, "a b c d", "s1"), (2L, "e f", "s1"))
      .toDF("doc_id", "text", "source")
    val m = TextAnalysis.sourceConcentration(mono).collect().head
    assert((m.getLong(0), m.getLong(1), m.getLong(2), m.getLong(3)) ==
      ((1L, 6L, 1000000L, 1000000L)))
    val bal = Seq((1L, "a b c", "s1"), (2L, "d e f", "s2"))
      .toDF("doc_id", "text", "source")
    val b = TextAnalysis.sourceConcentration(bal).collect().head
    assert((b.getLong(0), b.getLong(2), b.getLong(3)) ==
      ((2L, 500000L, 500000L)), s"${b.toSeq}")
  }

  test("sentenceStats: span counting, floor mean, empty-span filter") {
    val r = TextAnalysis.sentenceStats(docs(
        1L -> "hello world. foo bar baz! x",
        2L -> "...",
        3L -> "one two three")).collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r(1L) == ((3L, 6L, 3L, 2L)), s"$r")   // [2,3,1] words
    assert(r(2L) == ((0L, 0L, 0L, 0L)))          // punctuation only
    assert(r(3L) == ((1L, 3L, 3L, 3L)))          // no terminator = 1 span
  }

}
