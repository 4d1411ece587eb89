package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus sampling and sequence-packing operators — the steps between
  * a curated document set and actual training batches.
  */
object Sampling {

  /** Deterministic stratified sampling: within each stratum (here the
    * language-ID prediction), take the first `perStratum` documents in
    * md5(doc_id) order — a reproducible uniform draw (the hash order
    * is a fixed random permutation) that any engine can replay, unlike
    * RNG-seeded sampling.
    *
    * Scale note: the per-stratum rank needs a per-stratum sort; with
    * few strata and huge ones, use the threshold form instead (keep
    * md5(doc_id) < cutoff — no window, fully parallel, approximate
    * quota). The exact-rank form is the oracle-gated one.
    */
  def stratifiedSample(docs: DataFrame, perStratum: Int = 50): DataFrame =
    TextAnalysis.langId(docs)
      .select(col("doc_id"), col("lang_pred").as("stratum"))
      .withColumn("h", md5(col("doc_id").cast("string")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("stratum").orderBy(col("h"), col("doc_id"))))
      .filter(col("rn") <= perStratum)
      .select(col("doc_id"), col("stratum"), col("rn"))
      .orderBy("stratum", "rn")

  /** Threshold-form stratified sample — the scale path the exact-rank
    * form's note promises: keep a document iff the first 4 hex digits
    * of md5(doc_id) sort below the cutoff for `frac`. No window, no
    * per-stratum sort — a pure filter, embarrassingly parallel at any
    * stratum count or size (the exact-rank form sorts each stratum in
    * ONE partition, which with 2 strata means the whole corpus sorts
    * on 2 cores). The price: the per-stratum quota is
    * binomial(|stratum|, frac) rather than exact. Hex strings compare
    * byte-lexicographically on every engine, so the draw is
    * deterministic and the oracle replays it verbatim.
    */
  def stratifiedSampleThreshold(docs: DataFrame, frac: Double = 0.25): DataFrame = {
    require(frac > 0 && frac <= 1.0, s"frac must be in (0, 1], got $frac")
    val cut = math.round(frac * 65536).toInt
    // symmetric to the ≥0x10000 branch below: a cutoff that rounds to
    // 0 would silently keep NOTHING — fail loudly instead
    require(cut >= 1,
      s"frac $frac is below the 4-hex-digit resolution (min ~1.5e-5)")
    val strata = TextAnalysis.langId(docs)
      .select(col("doc_id"), col("lang_pred").as("stratum"))
    // frac ≈ 1 rounds the cutoff to 0x10000, which as a STRING is 5
    // chars and compares lexicographically BELOW "2000".."ffff" — the
    // 4-hex-digit prefix test would silently keep ~1/16 of the corpus
    // on a keep-everything call, so it gets no filter at all.
    val withH = strata.withColumn("h", md5(col("doc_id").cast("string")))
    val kept = if (cut >= 0x10000) withH
      else withH.filter(substring(col("h"), 1, 4) < lit(f"$cut%04x"))
    kept.orderBy("stratum", "doc_id")
  }

  /** Exact-k deterministic uniform sample — the fixed-SIZE companion
    * to [[stratifiedSampleThreshold]]'s fixed-RATE hash cut: rank
    * every doc by md5(doc_id) and keep the k smallest. A hash rank is
    * a uniform random order, so this is sampling without replacement
    * with an exact output cardinality (the "give me exactly 10k eval
    * docs" primitive a rate cut can only approximate), deterministic
    * and engine-replayable. Scale shape: orderBy+limit compiles to
    * TakeOrderedAndProject — a per-partition top-k heap and one
    * k·partitions-row reduce, no global sort, no window, no shuffle
    * of the corpus. */
  def fixedKSample(docs: DataFrame, k: Int = 200): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    docs.select(col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
      .orderBy("h")
      .limit(k)
  }

  /** Weighted fixed-k sample (priority sampling, Ohlsson/Rosén
    * shape in exact integers): every doc draws a 48-bit uniform rank
    * from md5(doc_id) and its priority is ⌊rank / weight⌋ with
    * weight = token count — a doc with twice the tokens halves its
    * expected priority, so the k smallest priorities are a
    * length-biased sample without replacement (the "sample eval docs
    * proportional to length" primitive). 48 bits keep the rank
    * inside a BIGINT on both engines (the md5-prefix discipline);
    * floor-div is exact cross-engine; ties are (priority, doc_id)
    * total-ordered. Same TakeOrderedAndProject scale shape as
    * [[fixedKSample]]. */
  def weightedKSample(docs: DataFrame, k: Int = 200): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // weight = the CANONICAL token count (TextOps.tokens' alphabet),
    // computed map-side as a higher-order filter — no tokenize shuffle
    val w = greatest(
      size(filter(split(lower(col("text")), "[^a-z0-9]+"),
        t => t =!= "")), lit(1)).cast("long")
    docs.select(col("doc_id"),
        conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
          .cast("long").as("rank48"),
        w.as("weight"))
      .select(col("doc_id"), col("weight"),
        expr("rank48 div weight").as("priority"))
      .orderBy("priority", "doc_id")
      .limit(k)
  }

  /** Mixture-balancing sampler: downsample every source to the
    * SMALLEST source's token mass — the uniform-rebalance special case
    * of mixture realization (the general weights live in
    * TextAnalysis.mixtureWeights; this operator makes a concrete
    * per-source keep rate and executes it). rate_ppm =
    * ⌊10⁶·min_tokens/n_tokens⌋ in exact integer arithmetic; the draw
    * is the same 4-hex md5(doc_id) prefix cut as
    * [[stratifiedSampleThreshold]] (deterministic, engine-replayable,
    * no window). Per-source aggregates are checkpointed (≤|sources|
    * rows) so the min and the join both ride one corpus scan; the doc
    * filter itself is a broadcast join + pure filter — embarrassingly
    * parallel. Returns per source: n_docs, n_tokens, rate_ppm, n_kept.
    */
  /** D94 deterministic train/valid/test assignment + the split
    * manifest: every doc's split is decided by the first 4 hex chars
    * of md5(doc_id) — train below 0xCCCC (⌊0.80·65536⌋ exactly),
    * valid below 0xE666 (⌊0.90·65536⌋ exactly), else test. The
    * stratifiedSampleThreshold discipline end-to-end: no RNG, no
    * window, engine-replayable, fully map-parallel, and STABLE under
    * corpus growth — a doc's split never changes as neighbors arrive,
    * which is what makes incremental ingest safe next to D18/D60's
    * leakage screens. Output: per split, doc count, canonical token
    * mass, and the exact doc-share ppm (3 rows). */
  def splitAssign(docs: DataFrame): DataFrame = {
    val per = docs.select(
        size(expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
          .cast("long").as("n_tok"),
        substring(md5(col("doc_id").cast("string")), 1, 4).as("h"))
      .select(col("n_tok"),
        when(col("h") < "cccc", "train")
          .when(col("h") < "e666", "valid").otherwise("test").as("split"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .localCheckpoint(true) // ≤ 3 rows; the totals row below reuses it
    val tot = per.agg(sum(col("n_docs")).as("td"))
    per.crossJoin(broadcast(tot))
      .select(col("split"), col("n_docs"), col("n_tokens"),
        expr("(1000000 * n_docs) div td").as("share_ppm"))
      .orderBy("split")
  }

  def balanceSample(docs: DataFrame): DataFrame = {
    val per = docs.select(col("source"),
        size(expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
          .cast("long").as("n_tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .localCheckpoint(true)
    val minTok = per.agg(min(col("n_tokens")).as("min_tokens"))
    val rates = per.crossJoin(broadcast(minTok))
      .withColumn("rate_ppm", expr("(1000000 * min_tokens) div n_tokens"))
      // 4-hex-digit cut: ⌊rate·65536/10⁶⌋; rate = 10⁶ (the min source)
      // maps to 0x10000 = keep-everything (no string compare — the
      // stratifiedSampleThreshold 5-char-cutoff lesson)
      .withColumn("cut", expr("(rate_ppm * 65536) div 1000000"))
    val kept = docs.select(col("doc_id"), col("source"))
      .withColumn("h", substring(md5(col("doc_id").cast("string")), 1, 4))
      .join(broadcast(rates.select(col("source"), col("cut"))), Seq("source"))
      .filter(col("cut") >= 0x10000 ||
        col("h") < lpad(lower(hex(col("cut"))), 4, "0"))
      .groupBy("source").agg(count(lit(1)).as("n_kept"))
    rates.select(col("source"), col("n_docs"), col("n_tokens"), col("rate_ppm"))
      .join(kept, Seq("source"), "left")
      .withColumn("n_kept", coalesce(col("n_kept"), lit(0L)))
      .orderBy("source")
  }

  /** Sequence packing for training: documents are concatenated in
    * doc_id order within a SHARD (doc_id div `shardSize` — each shard
    * packs independently and in parallel, the way per-worker packing
    * actually runs) and split at fixed `budget`-token sequence
    * boundaries — exactly the pretraining convention where a document
    * straddling a boundary continues in the next sequence. Emits per
    * doc: its shard, the sequence its first token lands in, the offset
    * there, and how many sequences it spans.
    *
    * One window (shard-partitioned cumulative sum) over the token
    * counts — no global sort, no driver loop.
    */
  def packSequences(docs: DataFrame, budget: Int = 2048,
      shardSize: Int = 1000): DataFrame = {
    val t = TextAnalysis.tokenCounts(docs)
      .select(col("doc_id"), col("n_bpe_tokens").as("n_tokens"))
      .withColumn("shard", (col("doc_id") / shardSize).cast("long"))
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("start", col("cum") - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("shard"),
        (col("start") / budget).cast("long").as("seq_id"),
        (col("start") % budget).as("seq_offset"),
        when(col("n_tokens") === 0, lit(1L)).otherwise(
          ((col("cum") - 1) / budget).cast("long") - (col("start") / budget).cast("long") + 1L)
          .as("n_seqs"))
      .orderBy("doc_id")
  }

  /** Overlapping-chunk splitting (the RAG/long-context convention,
    * complement of [[packSequences]]' concat-and-split): each document
    * yields ⌈(n−overlap)/(size−overlap)⌉ chunks of ≤ `size` tokens
    * whose starts advance by stride = size − overlap, so consecutive
    * chunks share `overlap` tokens of context. Pure per-row integer
    * arithmetic + one `sequence`/`explode` — map-only, no shuffle, no
    * window; at 100 TB this parallelizes per input split with zero
    * coordination. Empty docs yield no chunks. Returns
    * (doc_id, chunk_idx, start_tok, n_tok).
    */
  def chunkDocs(docs: DataFrame, size: Int = 64, overlap: Int = 16): DataFrame = {
    require(overlap < size, "overlap must be smaller than chunk size")
    val stride = size - overlap
    TextAnalysis.tokenCounts(docs)
      .select(col("doc_id"), col("n_bpe_tokens").as("n"))
      .filter(col("n") > 0)
      // last chunk index: ⌈max(0, n − size)/stride⌉ via TRUE integer
      // ceil-div (`div`, never `/` — double quotients round)
      .withColumn("last",
        greatest(lit(0L), expr(s"(n - $size + ${stride - 1}) div $stride")))
      .select(col("doc_id"), col("n"),
        explode(sequence(lit(0L), col("last"))).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * stride).as("start_tok"),
        (least(col("chunk_idx") * stride + size, col("n"))
          - col("chunk_idx") * stride).as("n_tok"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Training-shard layout planning: deterministic md5-hash assignment
    * of documents to `nShards` output shards (shard =
    * keyHash(doc_id) % n — the only assignment needing zero global
    * state or coordination at 100 TB; any worker can place any doc
    * independently), with the per-shard doc count, token mass (the
    * text_tokens BPE-ish regex contract), and exact-ppm token share
    * a shard writer checks for balance before committing to the
    * layout. Map-only until the nShards-row aggregate — scan-speed;
    * 10⁶·n_tokens rides DECIMAL(38,0) (wraps a long past ~9·10¹²
    * tokens per shard). */
  def shardPlan(docs: DataFrame, nShards: Int = 64): DataFrame = {
    val perDoc = docs.select(
      (graft.functions.Sketches.keyHash(col("doc_id")) % nShards).as("shard"),
      size(expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
        .cast("long").as("toks"))
    // checkpointed: the total re-aggregates these 64 rows, not the
    // corpus scan (Catalyst does not reuse exchanges across the
    // broadcast boundary — the q11 lesson)
    val shards = perDoc.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"))
      .localCheckpoint(true)
    shards.crossJoin(broadcast(shards.agg(sum("n_tokens").as("total"))))
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * n_tokens) div total AS BIGINT)")
          .as("share_ppm"))
      .orderBy("shard")
  }
}
