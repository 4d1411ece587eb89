package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic streaming sketches — HyperLogLog distinct counting
  * (Flajolet et al. 2007) and Count-Min frequency estimation (Cormode
  * & Muthukrishnan 2005) — built so the DuckDB oracle replays them
  * bit-exactly (the reason Spark's own `approx_count_distinct` HLL++
  * can't be the gated surface: its binary registers aren't
  * SQL-replayable).
  *
  * Everything is integer Column arithmetic in the [[TextOps]]
  * cross-engine discipline: the 60-bit key hash is an md5-hex-prefix
  * parse (see [[keyHash]] for why algebraic mixers are rejected, and
  * note DuckDB BIGINT overflow THROWS rather than wrapping, so Java
  * wrap-around mixers like splitmix64 were never on the table),
  * register powers are `shiftleft`, and the HLL alpha correction is
  * the exact rational 71827/100000 applied in an overflow-safe
  * order. The small-range (linear-counting) branch needs m·ln(m/V) —
  * a float — so it ships as a 256-row integer lookup table computed
  * ONCE in Scala and embedded verbatim in both engines' plans.
  *
  * Scale shape: both sketches are one narrow map-side-combinable
  * groupBy over the data (HLL: (group, bucket) max-rho; CMS: (row,
  * col) counts) producing a few-hundred-cell summary that broadcasts
  * — the whole point of sketching 100 TB: the shuffle carries
  * registers, not rows. Sketch frames from disjoint shards union +
  * re-aggregate with the same max/sum, so they merge associatively.
  */
object Sketches {

  /** 60-bit deterministic key hash: the first 15 hex chars of
    * md5(key as string) — the same reproducible-uniform-draw
    * primitive the samplers use (md5 is identical lowercase hex in
    * both engines). Chained affine-mod-prime rounds are NOT good
    * enough here: they collapse to one affine map of the key, so
    * arithmetic-progression key sets keep their lattice structure
    * and bias the HLL rho distribution ~70% high; md5 has no such
    * structure. Spark parses the hex with `conv`; DuckDB (no conv)
    * gets builder-generated per-nibble arithmetic — both are exact
    * hex parses of the same 15 chars, so the values cannot differ. */
  def keyHash(k: Column): Column =
    conv(substring(md5(k.cast("string")), 1, 15), 16, 10).cast("long")

  private def hexNibbleSql(h: String, i: Int): String =
    s"CAST(ascii(substr($h, $i, 1)) - 48 - " +
      s"(CASE WHEN ascii(substr($h, $i, 1)) >= 97 THEN 39 ELSE 0 END) AS BIGINT)"

  /** Exact hex→long parse of `len` chars of `h` from 1-based `start`
    * as a DuckDB expression (len ≤ 15 keeps it under 2⁶⁰). */
  def hexToLongSql(h: String, start: Int, len: Int): String =
    (0 until len).map { i =>
      val p = (1L << (4 * (len - 1 - i)))
      s"${hexNibbleSql(h, start + i)} * $p"
    }.mkString("(", " + ", ")")

  /** DuckDB twin of [[keyHash]] — `k` must be the raw key expression;
    * the md5 is applied here. */
  def keyHashSql(k: String): String =
    hexToLongSql(s"md5(CAST($k AS VARCHAR))", 1, 15)

  /** HLL geometry: m = 2⁸ registers, rho capped at 32 so the register
    * power sum stays ≤ m·2³² and alpha·m²·2³²/S never overflows. */
  val HllM = 256
  val RhoCap = 32
  /** alpha_256 = 0.7213/(1+1.079/256) as an exact rational. */
  val AlphaNum = 71827L
  val AlphaDen = 100000L

  /** Linear-counting lookup: V zero registers → round(m·ln(m/V)).
    * Computed once here; both engines consume the same integers. */
  val LinearCountTable: IndexedSeq[(Int, Long)] =
    (1 to HllM).map(v => v -> math.round(HllM * math.log(HllM.toDouble / v)))

  /** HyperLogLog distinct-count estimate of `key` per `group`.
    *
    * Register build: bucket = hash % m, rho = LSB position of
    * hash÷m (`bit_count((w & -w) − 1) + 1`, capped), one
    * (group, bucket) max — map-side combinable, 256 cells per group.
    * The estimate then runs entirely on the register frame: S =
    * Σ 2^(cap−M) over a dense bucket spine (absent buckets count as
    * M = 0), raw = ⌊alpha·m²·2^cap/S⌋ in overflow-safe order, and
    * the V>0 ∧ raw<5m/2 small-range regime switches to the
    * [[LinearCountTable]]. Returns (group, zero_regs, est_distinct).
    */
  def hllDistinct(df: DataFrame, key: String, group: String): DataFrame =
    registerEstimate(hllRegisters(df, key, group), Seq(group))

  /** Dense per-group register frame (group, bucket, m_rho) — the
    * only row-scaled pass of any HLL derivative; |groups|·256 rows
    * out, map-side-combinable max agg in. */
  def hllRegisters(df: DataFrame, key: String, group: String): DataFrame = {
    val spark = df.sparkSession
    val withRho = df
      .withColumn("h", keyHash(col(key)))
      .select(col(group), (col("h") % HllM).as("bucket"),
        expr(s"h div $HllM").as("w"))
      .withColumn("rho",
        when(col("w") === 0, lit(RhoCap))
          .otherwise(least(bit_count(expr("w & -w") - 1) + 1, lit(RhoCap))))
    // the register maxes are the ONLY corpus-sized pass; the dense
    // spine's group list comes from the aggregated frame (≤ 256 rows
    // per group — every group has ≥ 1 bucket row), not a second
    // corpus-wide distinct scan
    val maxes = withRho.groupBy(col(group), col("bucket"))
      .agg(max(col("rho")).as("m_rho"))
      .localCheckpoint(true)
    val spine = maxes.select(col(group)).distinct()
      .crossJoin(spark.range(HllM).select(col("id").cast("long").as("bucket")))
    spine.join(maxes, Seq(group, "bucket"), "left")
      .select(col(group), col("bucket"),
        coalesce(col("m_rho"), lit(0)).as("m_rho"))
  }

  /** The estimate arithmetic over a dense register frame keyed by
    * `groupCols` — shared VERBATIM by [[hllDistinct]] and the
    * set-operation path in [[hllOverlap]] so the two cannot drift. */
  def registerEstimate(regsFull: DataFrame, groupCols: Seq[String]): DataFrame = {
    val spark = regsFull.sparkSession
    import spark.implicits._
    val g = groupCols.map(col)
    val agg = regsFull.groupBy(g: _*)
      .agg(sum(expr(s"CAST(1 AS BIGINT) << ($RhoCap - m_rho)")).as("s"),
        sum(when(col("m_rho") === 0, 1L).otherwise(0L)).as("zero_regs"))
      .withColumn("raw",
        expr(s"($AlphaNum * (($HllM * $HllM * (CAST(1 AS BIGINT) << $RhoCap)) div s)) div $AlphaDen"))
    val lc = LinearCountTable.toDF("v", "lc_est")
    agg.join(broadcast(lc), col("zero_regs") === col("v"), "left")
      .select((g :+ col("zero_regs") :+
        when(col("zero_regs") > 0 && col("raw") < lit(5L * HllM / 2),
          col("lc_est")).otherwise(col("raw")).as("est_distinct")): _*)
  }

  /** Pairwise set-operation estimates between the per-group distinct
    * `key` sets, via HLL register algebra: the union of two sets'
    * registers is the element-wise max (exact — the defining HLL
    * merge), the intersection rides inclusion-exclusion
    * est(A)+est(B)−est(A∪B), clamped at 0 where estimator noise goes
    * negative. On events: which event types share their user
    * population, without ever shuffling a (type, user) pair list.
    *
    * Scale shape: after the one register-build pass the whole
    * computation lives on the |groups|·256-row frame — the pair join,
    * both estimates, everything. |groups|²/2 pairs of 256 registers
    * is flat in the data size. Returns one row per unordered pair
    * (type_a < type_b). */
  def hllOverlap(df: DataFrame, key: String, group: String): DataFrame = {
    val regs = hllRegisters(df, key, group).localCheckpoint(true)
    val single = registerEstimate(regs, Seq(group))
      .select(col(group), col("est_distinct"))
    val merged = regs.select(col(group).as("ga"), col("bucket"), col("m_rho").as("ma"))
      .join(regs.select(col(group).as("gb"), col("bucket").as("bb"),
        col("m_rho").as("mb")),
        col("bucket") === col("bb") && col("ga") < col("gb"))
      .select(col("ga"), col("gb"), col("bucket"),
        greatest(col("ma"), col("mb")).as("m_rho"))
    registerEstimate(merged, Seq("ga", "gb"))
      .select(col("ga"), col("gb"), col("est_distinct").as("est_union"))
      .join(broadcast(single.select(col(group).as("ga"), col("est_distinct").as("est_a"))), "ga")
      .join(broadcast(single.select(col(group).as("gb"), col("est_distinct").as("est_b"))), "gb")
      .select(col("ga").as("type_a"), col("gb").as("type_b"),
        col("est_a"), col("est_b"), col("est_union"),
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0L))
          .as("est_intersect"))
      .orderBy("type_a", "type_b")
  }

  /** Misra–Gries-gated EXACT heavy hitters (Misra & Gries 1982):
    * every `key` whose frequency is ≥ n/k, with its exact count and
    * floor-ppm share. Two passes over the data, but the shuffle only
    * ever carries candidate keys:
    *
    *  1. candidate generation — a k-counter Misra–Gries summary per
    *     partition (mapPartitions: genuinely imperative per-partition
    *     state, one of the library's three intended escape-hatch
    *     sites). Pigeonhole: a key with global count ≥ n/k has
    *     partition count ≥ n_p/k somewhere, and MG(k) keeps any key
    *     with partition count > n_p/(k+1) — so the union of
    *     per-partition survivors is a SUPERSET of the true heavy
    *     hitters regardless of how rows landed in partitions.
    *  2. exact verify — broadcast-semi-join the ≤ partitions·k
    *     candidates against the scan, count exactly, keep cnt·k ≥ n.
    *
    * The output is exact counts filtered by an exact threshold, so
    * it is DETERMINISTIC even though the intermediate candidate set
    * depends on partitioning — the same cheap-gate-then-exact shape
    * as the Bloom decontaminator (D39). 10⁶·cnt rides DECIMAL(38,0)
    * (wraps a long once a single key passes ~9·10¹² rows). */
  def heavyHitters(df: DataFrame, key: String, k: Int = 125): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val candidates = df.select(col(key).cast("long").as("k")).as[Long]
      .mapPartitions { it =>
        val counters = scala.collection.mutable.LongMap.empty[Long]
        it.foreach { x =>
          if (counters.contains(x)) counters(x) += 1
          else if (counters.size < k) counters(x) = 1L
          else {
            val dead = scala.collection.mutable.ArrayBuffer.empty[Long]
            counters.foreachEntry { (kk, v) =>
              if (v == 1L) dead += kk else counters(kk) = v - 1L
            }
            dead.foreach(counters.remove)
          }
        }
        counters.keysIterator
      }.toDF("k").distinct()
    val n = df.agg(count(lit(1)).as("n"))
    df.select(col(key).cast("long").as("k"))
      .join(broadcast(candidates), Seq("k"), "left_semi")
      .groupBy("k").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(n))
      .filter(col("cnt") * k >= col("n"))
      .select(col("k").as(key), col("cnt"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * cnt) div n AS BIGINT)")
          .as("share_ppm"))
      .orderBy(col("cnt").desc, col(key))
  }

  /** Plain-Scala twin of [[keyHash]] for the STREAMING register path
    * (mapGroupsWithState runs JVM code, not Columns): md5 of the
    * key's decimal string, first 15 hex chars as a long — Spark's
    * md5() is the hex of MD5 over UTF-8 bytes, so the values are
    * identical by construction. */
  def keyHashScala(k: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(k.toString.getBytes("UTF-8"))
    val hex = d.map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Fold one hashed key into the register array in place. */
  def updateRegisters(regs: Array[Int], h: Long): Unit = {
    val bucket = (h % HllM).toInt
    val w = h / HllM
    val rho =
      if (w == 0) RhoCap
      else math.min(java.lang.Long.numberOfTrailingZeros(w) + 1, RhoCap)
    if (rho > regs(bucket)) regs(bucket) = rho
  }

  /** The estimate step over a register array — the same integer
    * formula (and the same [[LinearCountTable]]) the SQL path runs,
    * so a streaming state snapshot and the batch aggregate can be
    * parity-asserted value-for-value. Returns (zero_regs, est). */
  def estimateFromRegisters(regs: Array[Int]): (Long, Long) = {
    val s = regs.map(m => 1L << (RhoCap - m)).sum
    val zero = regs.count(_ == 0).toLong
    val raw = (AlphaNum * ((HllM.toLong * HllM * (1L << RhoCap)) / s)) / AlphaDen
    val est =
      if (zero > 0 && raw < 5L * HllM / 2) LinearCountTable(zero.toInt - 1)._2
      else raw
    (zero, est)
  }

  /** Count-Min geometry: d = 3 hash rows × w = 64 columns. Row i's
    * hash is an independent 8-hex-char window of the key's md5. */
  val CmsD = 3
  val CmsW = 64

  def cmsCol(k: Column, i: Int): Column =
    conv(substring(md5(k.cast("string")), 1 + 8 * i, 8), 16, 10)
      .cast("long") % CmsW

  def cmsColSql(k: String, i: Int): String =
    s"(${hexToLongSql(s"md5(CAST($k AS VARCHAR))", 1 + 8 * i, 8)} % $CmsW)"

  /** Plain-Scala twin of [[cmsCol]] for the streaming register path
    * (the [[keyHashScala]] discipline): identical md5-window column
    * index by construction. */
  def cmsColScala(k: Long, i: Int): Int = cmsColsScala(k)(i)

  /** All CmsD column indices for one key from a SINGLE digest+hex —
    * the streaming fold calls this once per event instead of
    * re-hashing per sketch row. */
  def cmsColsScala(k: Long): Array[Int] = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(k.toString.getBytes("UTF-8"))
    val hex = d.map(b => f"${b & 0xff}%02x").mkString
    Array.tabulate(CmsD) { i =>
      (java.lang.Long.parseLong(hex.substring(8 * i, 8 * i + 8), 16) % CmsW).toInt
    }
  }

  /** The raw (row, column, count) sketch cells of [[countMin]] — the
    * mergeable representation (cells are additive across any data
    * partition), shared by the batch probe and the streaming twin's
    * parity check. */
  def cmsRows(df: DataFrame, key: String): DataFrame =
    (0 until CmsD).map { i =>
      df.groupBy(cmsCol(col(key), i).as("c")).agg(count(lit(1)).as("n"))
        .select(lit(i).as("r"), col("c"), col("n"))
    }.reduce(_ unionByName _)

  /** Count-Min sketch of `key` occurrence counts: d×w = 192 counter
    * cells (three map-side-combinable groupBys over hashed columns),
    * then the estimate for each distinct key = min over rows of its
    * cell — always ≥ the true count, over only by hash collisions
    * (≤ 2n/w with probability 1−2⁻³). The sketch frame broadcasts to
    * the key probe — at scale the probe side is the only row-scaled
    * pass. Returns (key, est_count).
    */
  def countMin(df: DataFrame, key: String): DataFrame = {
    val sketch = cmsRows(df, key)
    val keys = df.select(col(key)).distinct()
    val probed = (0 until CmsD).foldLeft(keys) { (acc, i) =>
      val s = sketch.filter(col("r") === i)
        .select(col("c").as(s"_c$i"), col("n").as(s"_n$i"))
      acc.join(broadcast(s), cmsCol(col(key), i) === col(s"_c$i"))
        .drop(s"_c$i")
    }
    probed.select(col(key),
      least((0 until CmsD).map(i => col(s"_n$i")): _*).as("est_count"))
  }

  /** CMS calibration audit — the estimator-error discipline (D76)
    * applied to [[countMin]]: per key the non-negative overcount
    * est − true (CMS never undercounts), histogrammed in integer
    * decade buckets. The "can I trust sketch counts at this width"
    * read before replacing exact aggregation with the sketch at
    * scale. Both sides are exact integers, so the bucketing cannot
    * drift cross-engine; the join is key-aligned with the exact agg
    * (same shuffle key), output is ≤ 4 rows. */
  def countMinError(df: DataFrame, key: String): DataFrame = {
    val est = countMin(df, key)
    val exact = df.groupBy(col(key)).agg(count(lit(1)).as("n_true"))
    est.join(exact, key)
      .withColumn("over", col("est_count") - col("n_true"))
      .withColumn("bucket",
        when(col("over") === 0, lit("0_exact"))
          .when(col("over") <= 9, lit("1_under10"))
          .when(col("over") <= 99, lit("2_under100"))
          .otherwise(lit("3_over100")))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_keys"), sum(col("over")).as("total_overcount"))
      .orderBy("bucket")
  }
  /** One space-saving update (Metwally et al. 2005) over the
    * (key → count / key → err) summary held as parallel maps: a
    * present key increments; with room left the key inserts at
    * (1, 0); at capacity the (count asc, key desc)-minimal entry m is
    * evicted and the newcomer adopts (m.count + 1, m.count) — the
    * classic bound true_count ∈ [count − err, count]. Eviction is
    * TOTAL-ordered, so a replayed sequence folds identically. Pure
    * state mutation shared verbatim by the streaming fold
    * (EventStreams.heavyStreaming) and the sequential unit test. */
  def ssUpdate(counts: scala.collection.mutable.LongMap[Long],
      errs: scala.collection.mutable.LongMap[Long],
      key: Long, capacity: Int): Unit = {
    if (counts.contains(key)) counts(key) += 1L
    else if (counts.size < capacity) { counts(key) = 1L; errs(key) = 0L }
    else {
      var mk = Long.MinValue; var mc = Long.MaxValue
      counts.foreachEntry { (k, c) =>
        if (c < mc || (c == mc && k > mk)) { mc = c; mk = k }
      }
      counts.remove(mk); errs.remove(mk)
      counts(key) = mc + 1L; errs(key) = mc
    }
  }
}
