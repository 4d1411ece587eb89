package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Contamination, Curate, Dedup, Sampling, Similarity, TextAnalysis}

/** Semantics checks for the dedup/similarity operators on crafted
  * inputs where the expected answer is hand-checkable.
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)

  def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts under min doc_id") {
    val d = Dedup.exact(docs(1L -> "a b c", 2L -> "a b c", 3L -> "x y z"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(d == Set((2L, 1L), (1L, 3L)))
  }

  test("minhash LSH finds an obvious near-duplicate pair") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val d = Dedup.minhashLsh(docs(
      1L -> base, 2L -> (base + " extra"), 3L -> "completely different words here entirely"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(d.exists(p => p._1 == 1L && p._2 == 2L && p._3 > 0.5))
    assert(!d.exists(p => p._2 == 3L || p._1 == 3L))
  }

  test("simhash: identical docs at hamming 0; disjoint docs not paired") {
    val d = Dedup.simhashNearDup(docs(
      1L -> "alpha beta gamma delta", 2L -> "alpha beta gamma delta",
      3L -> "zq wx kv jn pm")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(d.contains((1L, 2L, 0L)))
    assert(!d.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("ngram jaccard: identical docs score 1.0") {
    val d = Dedup.ngramJaccard(docs(
      1L -> "one two three four five", 2L -> "one two three four five",
      3L -> "six seven eight nine ten"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(d == Set((1L, 2L, 1.0)))
  }

  test("prefix-filtered jaccard equals plain jaccard (lossless)") {
    val d = docs(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "alpha beta gamma delta epsilon zeta eta iota",
      3L -> "one two three four five six seven eight",
      4L -> "one two three four five six seven eight")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = key(Dedup.ngramJaccard(d, 0.5))
    assert(key(Dedup.ngramJaccardPrefixForced(d, 0.5)) == plain)
    assert(key(Dedup.ngramJaccardPrefix(d, 0.5)) == plain)
    assert(plain.nonEmpty)
  }

  test("prefix jaccard dispatch: skew statistic separates flat and hot corpora") {
    // flat: every doc draws from its own disjoint vocabulary — each
    // shingle appears in exactly one doc (df = 1, multiplier = 1)
    val flat = docs((1L to 8L).map(i =>
      i -> (1 to 10).map(t => s"w${i}_$t").mkString(" ")): _*)
    val mFlat = Dedup.prefixSkewMultiplier(flat)
    assert(mFlat >= 1.0 && mFlat < Dedup.PrefixSkewCutover, s"flat m=$mFlat")
    // hot: 80 docs over a 3-token shared vocabulary — every shingle
    // lands in most docs, the plain self-join candidate multiplier is
    // O(n_docs) and the dispatch must choose the prefix path
    val hot = docs((1L to 80L).map(i =>
      i -> Seq.tabulate(12)(j => Seq("aa", "bb", "cc")(j % 3)).mkString(" ")): _*)
    val mHot = Dedup.prefixSkewMultiplier(hot)
    assert(mHot > Dedup.PrefixSkewCutover, s"hot m=$mHot")
    // and the adaptive form still matches plain on the hot corpus
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(key(Dedup.ngramJaccardPrefix(hot, 0.5)) ==
      key(Dedup.ngramJaccard(hot, 0.5)))
  }

  test("fixed-k sample: exact size, deterministic, rank-nested") {
    val d = docs((1L to 40L).map(i => i -> s"doc number $i"): _*)
    val s10 = Sampling.fixedKSample(d, 10).collect().map(_.getLong(0)).toSet
    assert(s10.size == 10)
    // deterministic: a second evaluation draws the identical set
    assert(Sampling.fixedKSample(d, 10).collect()
      .map(_.getLong(0)).toSet == s10)
    // rank-based ⇒ nested: the k=5 sample is a subset of the k=10 one
    val s5 = Sampling.fixedKSample(d, 5).collect().map(_.getLong(0)).toSet
    assert(s5.subsetOf(s10), s"$s5 not in $s10")
    // k past the corpus keeps everything, exactly once
    assert(Sampling.fixedKSample(d, 100).collect()
      .map(_.getLong(0)).sorted.toSeq == (1L to 40L))
  }

  test("weighted-k sample: length bias, determinism, exact size") {
    // 30 docs: ids 1..15 one token, ids 16..30 sixty tokens — the
    // heavy docs divide their 48-bit rank by 60 and should dominate
    // any small-k draw
    val d = docs((1L to 30L).map(i =>
      i -> (if (i <= 15) "tok" else Seq.fill(60)("tok").mkString(" "))): _*)
    val s = Sampling.weightedKSample(d, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(s.length == 10)
    // deterministic
    assert(Sampling.weightedKSample(d, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq == s.toSeq)
    // the output is priority-sorted and heavily length-biased: at
    // least 8 of the 10 winners are long docs (P[one-token doc beats
    // a 60-token doc] ≈ 1/61 per pair)
    assert(s.count(_._1 > 15L) >= 8, s"length bias missing: ${s.toSeq}")
    assert(s.map(_._3).toSeq == s.map(_._3).toSeq.sorted,
      s"not priority-ordered: ${s.toSeq}")
  }

  test("clusters: transitive near-dup chain collapses to one cluster, min id canonical") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    // 5 ~ 6 and 6 ~ 7 (each one word changed from its neighbor) but
    // 5 ~ 7 may or may not pair directly — the cluster must still be
    // one group via transitivity; 9 is unrelated.
    val d = docs(
      5L -> base, 6L -> (base + " extra"), 7L -> (base + " extra more"),
      9L -> "completely different words here entirely unrelated stuff")
    val c = Dedup.clusters(d, minEstJaccard = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(c.map(_._1).toSet == Set(5L, 6L, 7L))
    assert(c.forall(_._2 == 5L), s"canonical id must be the min: ${c.toSeq}")
    assert(c.forall(_._3 == 3L))
  }

  test("incremental dedup == full recompute restricted to new-doc pairs") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val old = docs(1L -> base, 2L -> (base + " ancient"),
      3L -> "completely different words here entirely unrelated stuff")
    val fresh = docs(10L -> (base + " fresh"),       // near-dup of 1 and 2
      11L -> "another disjoint document with its own vocabulary",
      12L -> (base + " fresh"))                       // exact dup of 10 (new↔new)
    val store = java.nio.file.Files.createTempDirectory("sigstore").toString
    Dedup.saveSignatures(old, s"$store/sigs")
    val inc = Dedup.dedupIncremental(spark, s"$store/sigs", fresh)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getBoolean(3))).toMap
    // ground truth: full recompute over old ∪ new, pairs touching new
    val full = Dedup.minhashLsh(old.unionByName(fresh))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap.filter { case ((a, b), _) => a >= 10L || b >= 10L }
    assert(inc.view.mapValues(_._1).toMap == full,
      s"incremental $inc vs full $full")
    assert(inc.exists { case ((a, b), (_, bn)) => a == 10L && b == 12L && bn },
      s"new-new pair must be flagged both_new: $inc")
    assert(inc.keys.exists { case (a, _) => a < 10L },
      s"expected at least one old-new pair: $inc")
  }

  test("editDistance reranks minhash candidates with the exact character metric") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    // 1 ~ 2 differ by exactly one substitution ("today" → "toda7");
    // 9 shares no vocabulary so it never becomes a candidate.
    val d = docs(
      1L -> base, 2L -> (base.dropRight(1) + "7"),
      9L -> "completely different words here entirely unrelated stuff")
    val out = Dedup.editDistance(d, minEstJaccard = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(out.keySet == Set((1L, 2L)), s"unexpected candidate set: $out")
    assert(out((1L, 2L)) == 1L, s"one substitution must cost exactly 1: $out")
  }

  test("keepBest keeps the longest cluster member, not the min id") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    // same transitive chain as the clusters test; doc 7 is the longest
    // member, so keep-best must pick 7 even though the cluster id is 5
    val d = Seq(
      5L -> base, 6L -> (base + " extra"), 7L -> (base + " extra more"),
      9L -> "completely different words here entirely unrelated stuff")
      .toDF("doc_id", "text")
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length(org.apache.spark.sql.functions.col("text")).cast("long"))
    val out = Dedup.keepBest(d, minEstJaccard = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getBoolean(4)))
    assert(out.map(_._1).toSet == Set(5L, 6L, 7L))
    assert(out.forall(_._2 == 5L), s"cluster id stays the min label: ${out.toSeq}")
    assert(out.forall(_._3 == 7L), s"keep id must be the longest doc: ${out.toSeq}")
    assert(out.collect { case (id, _, _, true) => id }.toSeq == Seq(7L))
  }

  test("chunkDocs: stride-advancing starts, overlap coverage, short-doc single chunk") {
    // (Sampling imported at file top)
    def doc(id: Long, n: Int) = id -> Seq.fill(n)("a").mkString(" ")
    // 100 bpe tokens → chunks [0,64) and [48,100): every token covered,
    // 16-token overlap; 10 tokens → one short chunk; 64 → exactly one.
    val d = docs(doc(1L, 100), doc(2L, 10), doc(3L, 64))
    val out = Sampling.chunkDocs(d, size = 64, overlap = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.filter(_._1 == 1L).toSeq == Seq((1L, 0L, 0L, 64L), (1L, 1L, 48L, 52L)))
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 0L, 10L)))
    assert(out.filter(_._1 == 3L).toSeq == Seq((3L, 0L, 0L, 64L)))
  }

  test("decontaminate: flags train docs sharing a k-gram with the benchmark set") {
    val d = docs(
      0L -> "alpha beta gamma delta epsilon zeta", // benchmark (pred: id == 0)
      1L -> "intro words then alpha beta gamma delta closing", // shares a 4-gram
      2L -> "totally unrelated text with other words entirely")
    val r = Contamination.decontaminate(d, org.apache.spark.sql.functions.col("doc_id") === 0L)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getBoolean(2))).toSeq
    // exactly one shared 4-gram window: (alpha beta gamma delta)
    assert(r == Seq((1L, 1L, true), (2L, 0L, false)))
  }

  test("bloom decontamination: superset of exact flags, clean docs pass") {
    import org.apache.spark.sql.functions.col
    val d = docs(
      0L -> "alpha beta gamma delta epsilon zeta",
      1L -> "intro words then alpha beta gamma delta closing",
      2L -> "totally unrelated text with other words entirely")
    val exact = Contamination.decontaminate(d, col("doc_id") === 0L)
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    val bloom = Contamination.decontaminateBloom(d, col("doc_id") === 0L)
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    // every exact hit must be flagged (no false negatives, ever)
    exact.foreach { case (id, hit) =>
      if (hit) assert(bloom(id), s"bloom missed exact hit doc $id")
    }
    // on this fixture (handful of grams vs 2^16 bits) no false positive
    assert(bloom == exact, s"bloom=$bloom exact=$exact")
    // deterministic: a second run flags identically
    val again = Contamination.decontaminateBloom(d, col("doc_id") === 0L)
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    assert(again == bloom)
  }

  test("pii redaction: counts and typed placeholders for injected spans") {
    import spark.implicits._
    val d = Seq((0L, "plain words"), (7L, "other words")).toDF("doc_id", "text")
    val r = TextAnalysis.piiRedact(d).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    // doc 0: 0%3=0%4=0%5=0 -> all three injected; doc 7: none
    assert(r(0L) == ((1L, 1L, 1L)) && r(7L) == ((0L, 0L, 0L)))
    val red = TextAnalysis.piiRedact(d)
      .select("doc_id").collect() // force plan; content checked below
    val redacted = TextAnalysis.withSyntheticPii(d)
      .select(org.apache.spark.sql.functions.regexp_replace(
        org.apache.spark.sql.functions.regexp_replace(
          org.apache.spark.sql.functions.regexp_replace(
            org.apache.spark.sql.functions.col("pii_text"),
            TextAnalysis.EmailPat, "[EMAIL]"),
          TextAnalysis.IpPat, "[IP]"),
        TextAnalysis.PhonePat, "[PHONE]"))
      .collect().map(_.getString(0))
    assert(redacted.contains("plain words contact [EMAIL] from [IP] call [PHONE]"))
    assert(red.length == 2)
  }

  test("vocabulary: df-ordered top-k with deterministic tie-break") {
    val v = TextAnalysis.vocabulary(docs(
      1L -> "apple banana apple", 2L -> "apple cherry", 3L -> "banana"), topK = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // apple df=2 tf=3; banana df=2 tf=2; cherry df=1 — tie apple<banana
    assert(v == Seq(("apple", 2L, 3L), ("banana", 2L, 2L)))
  }

  test("curateFull: every gate fires on its own doc") {
    val base = "the quick brown fox jumps over the lazy dog again and again " +
      "today with more filler words to pass the length gate easily"
    val other = "completely different content entirely about other things " +
      "with plenty of words included to meet the token threshold for the gate"
    val d = docs(
      0L -> ("alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi"), // benchmark
      1L -> base,              // near-dup cluster canonical -> kept
      2L -> (base + " extra"), // near-dup, not canonical -> dropped
      3L -> ("intro words here alpha beta gamma delta then continues with " +
        "many other words to satisfy the minimum token requirement"), // contaminated
      4L -> other,             // clean -> kept
      5L -> other)             // exact dup of 4 -> dropped
    val r = Curate.curateFull(d, org.apache.spark.sql.functions.col("doc_id") === 0L)
      .collect().map(x => x.getLong(0) ->
        ((x.getBoolean(4), x.getBoolean(5), x.getBoolean(6), x.getBoolean(7)))).toMap
    // (pass_neardup, is_bench, contaminated, kept)
    assert(r(0L)._2 && !r(0L)._4)            // benchmark doc excluded
    assert(r(1L)._1 && r(1L)._4)             // cluster canonical kept
    assert(!r(2L)._1 && !r(2L)._4)           // near-dup member dropped
    assert(r(3L)._3 && !r(3L)._4)            // contaminated dropped
    assert(r(4L)._4 && !r(5L)._4)            // exact-dup canonical only
    assert(r.values.count(_._4) == 2)
  }

  test("bpe merges: greedy overlapping-run and multi-char-symbol semantics") {
    // word freqs: "aaab" x2, "ab" x1.
    // round 1: pairs (a,a)=4 [two per "aaab" occurrence], (a,b)=3 -> merge "a a"
    //   greedy left-to-right: a a a b -> (aa) a b — only ONE merge in the run
    // round 2: (aa,a)=2, (a,b)=3 -> merge "a b" (must NOT match inside "aa")
    // round 3: (aa,ab)=2 -> merge multi-char symbols
    val d = docs(1L -> "aaab ab", 2L -> "aaab")
    val m = TextAnalysis.bpeMerges(d, rounds = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(m == Seq((1, "a a", "aa", 4L), (2, "a b", "ab", 3L), (3, "aa ab", "aaab", 2L)))
  }

  test("mixture weights: sqrt temperature upsamples the smaller source") {
    import spark.implicits._
    val d = Seq(
      (1L, "one two three four five six seven eight", "big"),
      (2L, "nine ten eleven twelve thirteen fourteen", "big"),
      (3L, "just a few", "small")).toDF("doc_id", "text", "source")
    val r = TextAnalysis.mixtureWeights(d).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3),
        x.getDouble(4), x.getDouble(5)))).toMap
    assert(r("big")._1 == 2L && r("small")._1 == 1L)
    assert(r("big")._2 == 14L && r("small")._2 == 3L)
    // shares sum to ~1; sqrt temperature pulls weights toward uniform,
    // so the small source is upsampled (>1) and the big one damped (<1)
    assert(math.abs(r("big")._3 + r("small")._3 - 1.0) < 1e-5)
    assert(r("small")._5 > 1.0 && r("big")._5 < 1.0)
  }

  test("containment join finds a quote inside a longer doc that Jaccard misses") {
    // doc 2 quotes doc 1 verbatim inside 3x the surrounding text:
    // containment of 1 in 2 is 1.0 while Jaccard is ~0.25 — below any
    // sane Jaccard dedup cut. doc 3 is unrelated.
    val quote = "the five boxing wizards jump quickly over the frozen lake tonight"
    val host = "unrelated preamble text goes here first " + quote +
      " and then a very long trailing discussion continues with many more words" +
      " about completely different topics entirely for a while longer still"
    val d = docs(1L -> quote, 2L -> host, 3L -> "nothing shared with the others at all here")
    val r = Dedup.containmentJoin(d, tauNum = 4, tauDen = 5, dfCap = 20)
      .collect().map(x => (x.getLong(0), x.getLong(1)) ->
        ((x.getAs[Double]("cont_a"), x.getAs[Double]("cont_b")))).toMap
    assert(r.keySet == Set((1L, 2L)))
    assert(r((1L, 2L))._1 == 1.0) // the quote is fully contained
    assert(r((1L, 2L))._2 < 0.5)  // the host is not contained in the quote
  }

  test("source KL: a drifted source scores higher than an on-distribution one") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta gamma delta alpha beta", "web"),
      (2L, "alpha beta gamma delta gamma delta", "web"),
      (3L, "zzz yyy zzz yyy zzz yyy zzz", "spam"))
      .toDF("doc_id", "text", "source")
    val r = TextAnalysis.sourceKl(d).collect()
      .map(x => x.getString(0) -> x.getDouble(2)).toMap
    assert(r("spam") > r("web"), s"drifted source must dominate: $r")
    assert(r.values.forall(_ >= 0.0), s"KL is non-negative: $r")
  }

  test("cosine top-k ranks the aligned vector first") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = Similarity.topKCosine(emb, org.apache.spark.sql.functions.col("vec_id") === 0, k = 2)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(top.head == (1L, 1)) // most-aligned neighbor ranked 1
  }
  test("paragraph dedup: cross-doc and in-doc repeated segments flagged") {
    val seg = (1 to 20).map(i => s"w$i").mkString(" ")
    val uniq = (1 to 20).map(i => s"u$i").mkString(" ")
    val other = (1 to 20).map(i => s"v$i").mkString(" ")
    val d = docs(
      1L -> (seg + " " + uniq),    // seg shared with doc 2 -> 1 of 2 dup
      2L -> (seg + " " + other),   // ditto
      3L -> (seg2x(seg)))          // same segment twice -> both dup
    val r = graft.pipeline.Dedup.paragraphDedup(d).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
      .toMap
    assert(r(1L) == ((2L, 1L, 500000L)))
    assert(r(2L) == ((2L, 1L, 500000L)))
    assert(r(3L) == ((2L, 2L, 1000000L)))
  }

  private def seg2x(seg: String): String = seg + " " + seg

  test("cluster-size histogram counts near-dup clusters by size") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val d = docs(
      1L -> base, 2L -> base,            // identical pair -> one 2-cluster
      3L -> base, // joins the same cluster -> actually a 3-cluster
      4L -> (31 to 60).map(i => s"only$i").mkString(" "))  // unique
    val r = graft.pipeline.Dedup.clusterSizes(d).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(3L -> 1L))
  }

  test("splitLeakage: only val×train duplicate pairs surface") {
    val sentence = "the quick brown fox jumps over the lazy sleeping dog again"
    val d = docs(
      (1L, sentence),                     // train (1 % 10 < 8)
      (8L, sentence),                     // val — leaks against 1
      (18L, sentence),                    // val — leaks against 1, NOT vs 8
      (2L, "completely different words about streaming window queries"),
      (9L, "unrelated validation text mentioning graphs and joins"))
    val r = graft.pipeline.Dedup.splitLeakage(d).collect()
      .map(x => ((x.getLong(0), x.getLong(1)), x.getDouble(2))).toMap
    assert(r.keySet == Set((8L, 1L), (18L, 1L)))
    assert(r.values.forall(_ == 1.0))
  }

  test("minhashErrorAudit: exact twins land in the zero-error bucket") {
    import spark.implicits._
    val t = "the quick brown fox jumps over the lazy dog again"
    val d = Seq((1L, t), (2L, t),
      (3L, "completely different content with no overlapping shingles at all"))
      .toDF("doc_id", "text")
    // twins: est 1.0, exact 1.0 → bucket 0, one candidate pair total
    val r = graft.pipeline.Dedup.minhashErrorAudit(d).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(0L -> 1L), s"$r")
  }

  test("langIdConfusion: stopword-heavy docs predict en, others unknown") {
    import spark.implicits._
    val d = Seq(
      (1L, "the of and to in", "en"),
      (2L, "qqq www zzz", "de"),
      (3L, "the and or", "en"))
      .toDF("doc_id", "text", "lang")
    val r = graft.pipeline.TextAnalysis.langIdConfusion(d).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    assert(r == Map(("en", "en") -> 2L, ("de", "unknown") -> 1L), s"$r")
  }

  test("crossSourceDuplication: a twin straddling sources lands in the cross cell") {
    import spark.implicits._
    val t = "the quick brown fox jumps over the lazy dog again"
    val d = Seq((1L, t, "web"), (2L, t, "books"),
      (3L, "totally different content here with many words", "web"))
      .toDF("doc_id", "text", "source")
    val r = graft.pipeline.Dedup.crossSourceDuplication(d).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    assert(r == Map(("books", "web") -> 1L), s"$r")
  }

  test("sourceProfile: per-source masses, majority language, floor mean") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c", "en", "web", 5L), (2L, "d e", "en", "web", 3L),
      (3L, "f", "de", "web", 1L), (4L, "g h i j", "fr", "books", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = graft.pipeline.TextAnalysis.sourceProfile(d).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5), x.getString(6)))).toMap
    // web: 3 docs, 9 chars, 6 tokens, mean 2, 2 langs, majority en
    assert(r("web") == ((3L, 9L, 6L, 2L, 2L, "en")), s"$r")
    assert(r("books") == ((1L, 7L, 4L, 4L, 1L, "fr")), s"$r")
  }

  test("sourceSimilarity: identical content 10^6 ppm, disjoint content low") {
    import spark.implicits._
    val same = "alpha beta gamma delta epsilon zeta eta theta"
    val other = "one two three four five six seven eight nine ten"
    val d = Seq(
      (1L, same, "a"), (2L, same, "b"), (3L, other, "c"))
      .toDF("doc_id", "text", "source")
    val r = graft.pipeline.Dedup.sourceSimilarity(d).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getLong(3)).toMap
    assert(r(("a", "b")) == 1000000L, s"$r")
    assert(r(("a", "c")) < 1000000L && r(("b", "c")) < 1000000L, s"$r")
  }

  test("dedupInflation: twin docs surrender the duplicate's tokens") {
    import spark.implicits._
    // 1 and 2 are exact twins (near-dup cluster, min-id 1 kept);
    // 3 is unrelated — removable = doc 2's 8 tokens of 25 total
    val t = "the quick brown fox jumps over the lazy"
    val d = Seq((1L, t), (2L, t),
      (3L, "completely different content with no overlapping shingles at all"))
      .toDF("doc_id", "text")
    val r = graft.pipeline.Dedup.dedupInflation(d).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((3L, 25L, 1L, 8L)), s"${r.toSeq}")
    assert(r.getLong(4) == 1000000L * 8 / 25)
  }

  test("lshBucketStats: identical docs co-bucket in all 8 permutations") {
    val d = docs(1L -> "alpha beta gamma delta epsilon zeta",
      2L -> "alpha beta gamma delta epsilon zeta",
      3L -> "one two three four five six seven")
    val r = Dedup.lshBucketStats(d).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    // docs 1,2 share every minhash → 8 buckets of size 2 (1 pair
    // each); doc 3 sits alone in its 8
    assert(r(2L) == ((8L, 8L)), s"$r")
    assert(r(1L) == ((8L, 0L)))
  }

  test("substringDup: planted 80-char verbatim copy yields 2 shared windows") {
    val common = ("the quick brown fox jumps over the lazy dog and then " +
      "keeps running onward into the night").take(80)
    assert(common.length == 80)
    val d = docs(
      1L -> (common + " alpha alpha alpha"),
      2L -> (common + " omega omega omega"),
      3L -> ("totally unrelated text that is long enough to clear the" +
        " sixty-four character window threshold easily"))
    // windows at pos 1 (chars 1-64) and 17 (17-80) are identical for
    // docs 1/2; pos 33 covers chars 33-96 and differs (distinct tails)
    val r = Dedup.substringDup(d).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.toList == List((1L, 2L, 2L)), s"${r.toList}")
  }

  test("head dup: shared 16-token head groups, divergent tails still match") {
    val head = (1 to 16).map(i => s"w$i").mkString(" ")
    val d = docs(
      1L -> (head + " tail one continues here"),
      2L -> (head + " a completely different ending altogether"),
      3L -> ("other start " + head))
    val g = Dedup.headDupGroups(d).collect()
    assert(g.length == 1, s"expected one group: ${g.toList}")
    assert(g(0).getLong(1) == 2L && g(0).getLong(2) == 1L &&
      g(0).getLong(3) == 2L, s"${g(0)}")
  }

  test("split assign: exact partition, floor shares, growth-stable assignment") {
    def splitOf(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val h = md.take(2).map("%02x".format(_)).mkString
      if (h < "cccc") "train" else if (h < "e666") "valid" else "test"
    }
    val ids = (0L until 40L).toSeq
    val d = docs(ids.map(i => i -> "a b c"): _*)
    val out = Sampling.splitAssign(d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val expect = ids.groupBy(splitOf).view.mapValues(_.size.toLong).toMap
    assert(out.keySet == expect.keySet, s"$out vs $expect")
    for ((k, (nd, nt, ppm)) <- out) {
      assert(nd == expect(k), s"$k: $nd vs ${expect(k)}")
      assert(nt == nd * 3L)                       // "a b c" = 3 tokens
      assert(ppm == 1000000L * nd / 40L)          // floor share
    }
    // growth stability: every id keeps its split in the doubled corpus
    val ids2 = (0L until 80L).toSeq
    val out2 = Sampling.splitAssign(docs(ids2.map(i => i -> "a b c"): _*))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect2 = ids2.groupBy(splitOf).view.mapValues(_.size.toLong).toMap
    assert(out2 == expect2, s"$out2 vs $expect2")
  }

  test("cluster cap: a 6-member family keeps exactly 4 by md5 rank") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val fam = (0L until 6L).map(i => i -> (base + s" v$i"))
    val other = Seq(100L -> "totally unrelated content about databases and engines entirely")
    val d = docs((fam ++ other): _*)
    val r = Dedup.clusterCap(d, cap = 4).collect()
      .map(x => x.getLong(0) -> ((x.getLong(2), x.getLong(3), x.getBoolean(4))))
      .toMap
    assert(r.size == 6 && !r.contains(100L), s"cluster domain wrong: $r")
    assert(r.values.forall(_._1 == 6L))
    assert(r.values.count(_._3) == 4, s"cap not enforced: $r")
    // determinism: the kept set is the 4 smallest md5(doc_id) ranks
    def h(id: Long) = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expectKept = (0L until 6L).sortBy(id => (h(id), id)).take(4).toSet
    assert(r.filter(_._2._3).keySet == expectKept, s"$r vs $expectKept")
  }

}
