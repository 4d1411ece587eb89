package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TemporalOps

/** As-of join semantics on a hand-checked timeline. */
class TemporalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)

  test("asof join picks latest right row at or before left time") {
    import spark.implicits._
    val left = Seq((1L, 10L), (1L, 25L), (2L, 5L))
      .toDF("k", "lt")
    val right = Seq((1L, 5L, 100.0), (1L, 10L, 200.0), (1L, 20L, 300.0),
      (2L, 9L, 400.0)).toDF("k", "rt", "v")
    val out = TemporalOps.asofJoin(left, right, "k", "lt", "rt", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
    assert(out == Set(
      (1L, 10L, Some(200.0)),  // equal time → right visible
      (1L, 25L, Some(300.0)),  // latest before 25 is 20
      (2L, 5L, None)))         // nothing at or before 5
  }

  test("userTenure: day floors and per-day density, single-event guard") {
    import spark.implicits._
    def t(ms: Long) = new java.sql.Timestamp(ms)
    val d0 = 1700000000000L
    // user 1: 3 events across 2.5 days → floor tenure 2, density
    // 10⁶·3/(2+1) = 10⁶; user 2: one event → 0 days, 10⁶·1/1
    val ev = Seq((1L, t(d0)), (1L, t(d0 + 86400000L)),
      (1L, t(d0 + 216000000L)), (2L, t(d0))).toDF("user_id", "ts")
    val r = TemporalOps.userTenure(ev).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(4), x.getLong(5))))
      .toMap
    assert(r == Map(1L -> ((3L, 2L, 1000000L)), 2L -> ((1L, 0L, 1000000L))),
      s"$r")
  }

  test("integer z-score anomalies: spike flagged, constant series silent") {
    import spark.implicits._
    // user 1: three 1.00s and one 100.00 — the spike's z ≈ 1.73·(spread)
    // over these cents: n=4, qx=10000, S=10300, Sq=100030000:
    // dev = 4·10000−10300 = 29700; dev² ≈ 8.8e8; 4·(n·Sq−S²) ≈ 1.18e9?
    // compute: n·Sq = 400120000, S² = 106090000, varN2 = 294030000,
    // 4·varN2 = 1176120000 > 882090000 → the spike is NOT flagged at
    // z>2 for n=4 (max z in a 4-sample is √3 ≈ 1.73) — use n=10.
    val ev = ((1 to 9).map(i => (1L, i.toLong, 1.0)) :+ ((1L, 10L, 100.0))) ++
      Seq((2L, 11L, 5.0), (2L, 12L, 5.0), (2L, 13L, 5.0))
    val out = graft.queries.TemporalOps.anomalies(
        ev.toDF("user_id", "event_id", "value"))
      .collect().map(r => (r.getLong(1), r.getBoolean(3))).toMap
    assert(out(10L))                               // the spike
    assert((1L to 9L).forall(i => !out(i)))        // the baseline
    assert(!out(11L) && !out(12L) && !out(13L))    // zero variance
  }

  test("cusum: level shift located at the |cs| peak, flat series scores zero") {
    import spark.implicits._
    def t(i: Int) = new java.sql.Timestamp(i * 1000L)
    // user 1: [1,1,1,5,5,5] — shift after the 3rd observation.
    // cents x=[100,100,100,500,500,500], n=6, S=1800,
    // cs = 6·cumsum − rn·1800 = [-1200,-2400,-3600,-2400,-1200,0]:
    // |cs| peaks 3600 at rn=3, up-drift max = 0−(−3600) = 3600,
    // down-drift max = −1200−(−3600)… running max −1200 vs cs −3600
    // at rn=3 → 2400.
    val ev = Seq(1.0, 1.0, 1.0, 5.0, 5.0, 5.0).zipWithIndex.map {
      case (v, i) => (1L, i.toLong, t(i), v)
    } ++ Seq((2L, 10L, t(10), 7.0), (2L, 11L, t(11), 7.0))
    val out = TemporalOps.cusum(
        ev.toDF("user_id", "event_id", "ts", "value"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == ((6L, 3600L, 2400L, 3L)))
    // constant series: every cs is 0, changepoint degenerates to rank 1
    assert(out(2L) == ((2L, 0L, 0L, 1L)))
  }

  test("conversion funnel requires causal stage order") {
    import spark.implicits._
    // u1: full ordered funnel; u2: purchase but never clicked;
    // u3: purchase BEFORE its click — must not count as converted.
    val ev = Seq(
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"),
      (2L, 1L, "view"), (2L, 2L, "purchase"),
      (3L, 1L, "purchase"), (3L, 2L, "view"), (3L, 3L, "click"))
      .toDF("user_id", "ts", "event_type")
    val r = TemporalOps.conversionFunnel(ev).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 2L, 1L)),
      s"stage counts wrong: $r")
    assert(r.getLong(3) == 666666L && r.getLong(4) == 500000L,
      s"ppm ratios wrong: $r")
  }

  test("retention cohorts: offsets relative to each user's first-active day") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    val day = 86400000L
    // u1 active days 0,1,2; u2 days 0,2 (two events on day 0 — still
    // one active-day); u3 day 1 only
    val ev = Seq((1L, 0L), (1L, 1L), (1L, 2L), (2L, 0L), (2L, 0L), (2L, 2L),
      (3L, 1L))
      .zipWithIndex.map { case ((u, d), i) => (i.toLong, u, d * day + 3600000L) }
      .toDF("event_id", "user_id", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
    val out = TemporalOps.retentionCohorts(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out == Map(
      (0L, 0L) -> (2L, 2L, 1000000L),  // u1+u2 on their day 0
      (0L, 1L) -> (1L, 2L, 500000L),   // only u1 back next day
      (0L, 2L) -> (2L, 2L, 1000000L),  // both back on day 2
      (1L, 0L) -> (1L, 1L, 1000000L))) // u3's own cohort
  }

  test("disorder histogram: in-order events are silent, late arrivals land their bucket") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    // arrival order = event_id; user 1's 3rd event is 500 ms behind
    // the running max, user 2's 2nd is 2 minutes behind
    val ev = Seq(
      (1L, 1L, 1000L), (1L, 2L, 2000L), (1L, 3L, 1500L),
      (2L, 4L, 10000000L), (2L, 5L, 10000000L - 120000L),
      (3L, 6L, 50L), (3L, 7L, 60L))
      .toDF("user_id", "event_id", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
    val out = TemporalOps.disorder(ev)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(
      "a_in_order" -> (5L, 0L),
      "b_lt_1m" -> (1L, 500L),
      "c_lt_10m" -> (1L, 120000L)))
  }

  test("ewma: dyadic weights favor the newest value, partial windows renormalize") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    // values 1.00, 3.00, 5.00 → cents 100, 300, 500; weights 128/64/32
    // row1: 100 (only itself); row2: ⌊(300·128+100·64)/192⌋ = 233;
    // row3: ⌊(500·128+300·64+100·32)/224⌋ = 385
    val ev = Seq((1L, 1L, 1000L, 1.0), (1L, 2L, 2000L, 3.0), (1L, 3L, 3000L, 5.0))
      .toDF("user_id", "event_id", "ms", "value")
      .withColumn("ts", timestamp_millis(col("ms")))
    val out = queries.TemporalOps.ewma(ev)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 100L, 2L -> 233L, 3L -> 385L))
  }

  test("holt: forecast tracks a linear ramp exactly, warm-up rows pass through") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    // perfect ramp 1.00, 2.00, ..., 8.00 (cents 100..800): Holt with
    // α=β=½ locks onto level=x, trend=100 — hand-rolled at row 6:
    // l0=100, b0=100; each step l'=(x+l+b)/2 keeps l=x, b'=100; so
    // forecast = x+100 from row 6 on. Rows 1-5 are warm-up: (x, 0, x).
    // ewma on the same ramp UNDER-forecasts (no trend term) — the
    // property that motivates the operator.
    val ev = (1 to 8).map(i => (1L, i.toLong, i * 1000L, i.toDouble))
      .toDF("user_id", "event_id", "ms", "value")
      .withColumn("ts", timestamp_millis(col("ms")))
    val out = queries.TemporalOps.holt(ev)
      .collect().map(r => r.getLong(1) -> (r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(out(5L) == (500L, 0L, 500L))       // warm-up passthrough
    assert(out(6L) == (600L, 100L, 700L))     // locked on the ramp
    assert(out(7L) == (700L, 100L, 800L))
    assert(out(8L) == (800L, 100L, 900L))
    val ew = queries.TemporalOps.ewma(ev)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(ew(8L) < 800L)                     // ewma lags the ramp
  }

  test("holt: negative trend stays exact through truncating division") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    // descending ramp 8.00 → 1.00: trend locks at −100; forecasts
    // continue downward. Exercises the div-truncation contract on
    // negatives (a floor-division engine would drift here).
    val ev = (1 to 8).map(i => (1L, i.toLong, i * 1000L, (9 - i).toDouble))
      .toDF("user_id", "event_id", "ms", "value")
      .withColumn("ts", timestamp_millis(col("ms")))
    val out = queries.TemporalOps.holt(ev)
      .collect().map(r => r.getLong(1) -> (r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(out(6L) == (300L, -100L, 200L))
    assert(out(8L) == (100L, -100L, 0L))
  }

  test("interarrival: rank-selected median and p90, gaps from the time order") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    // user 1 at ms 0,100,300,600,1000 → gaps 100,200,300,400 (n=4):
    // med = 2nd smallest = 200, p90 = ⌈3.6⌉=4th = 400
    val ev = Seq((1L, 1L, 0L), (1L, 2L, 100L), (1L, 3L, 300L),
      (1L, 4L, 600L), (1L, 5L, 1000L))
      .toDF("user_id", "event_id", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
    val r = queries.TemporalOps.interArrival(ev).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ==
      ((4L, 100L, 400L, 200L, 400L)))
    // single gap: every statistic is that gap
    val one = Seq((2L, 1L, 0L), (2L, 2L, 77L))
      .toDF("user_id", "event_id", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
    val r1 = queries.TemporalOps.interArrival(one).collect()(0)
    assert((r1.getLong(1), r1.getLong(4), r1.getLong(5)) == ((1L, 77L, 77L)))
  }

  test("quantile sketch: bin upper bounds at the ceil(p*n) crossing") {
    import spark.implicits._
    // cents 50, 150, 250, 350 → bins 0..3, n = 4: p50 crosses at
    // cum=2 (bin 1 → 200), p90 at cum=4 (bin 3 → 400)
    val ev = Seq(0.50, 1.50, 2.50, 3.50).map(("x", _))
      .toDF("event_type", "value")
    val r = queries.TemporalOps.quantileSketch(ev).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((4L, 200L, 400L, 400L)))
  }

  test("type entropy: uniform two-type user gets ln 2, single-type gets 0") {
    import spark.implicits._
    val ev = Seq((1L, "a"), (1L, "a"), (1L, "b"), (1L, "b"),
      (2L, "a"), (2L, "a"), (2L, "a"))
      .toDF("user_id", "event_type")
    val r = queries.TemporalOps.typeEntropy(ev)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    assert(r(1L) == ((4L, 0.6931)), s"uniform: ${r(1L)}")
    assert(r(2L) == ((3L, 0.0)), s"single-type: ${r(2L)}")
  }

  test("last-touch attribution: strictly-prior click wins, none before first purchase") {
    import spark.implicits._
    import org.apache.spark.sql.functions.timestamp_millis
    // user 1: purchase@100 (no prior click → -1), click@200, click@300,
    // purchase@400 (attributed to click 3, gap 100); user 2: click@50
    // and purchase@50 with click id < purchase id → simultaneous click
    // sorts first and attributes, gap 0.
    val ev = Seq(
      (1L, 1L, "purchase", 100L), (2L, 1L, "click", 200L),
      (3L, 1L, "click", 300L), (4L, 1L, "purchase", 400L),
      (5L, 2L, "click", 50L), (6L, 2L, "purchase", 50L))
      .toDF("event_id", "user_id", "event_type", "ms")
      .withColumn("ts", timestamp_millis($"ms")).drop("ms")
    val r = queries.TemporalOps.lastTouch(ev)
      .collect().map(x => x.getLong(0) -> ((x.getLong(2), x.getLong(3)))).toMap
    assert(r == Map(1L -> ((-1L, -1L)), 4L -> ((3L, 100L)), 6L -> ((5L, 0L))))
  }

  test("burst windows: only buckets above 2x the occupied-bucket mean flag") {
    import spark.implicits._
    import org.apache.spark.sql.functions.timestamp_millis
    // type x: buckets 0,1,2 with counts 1,1,7 → mean 3, burst = bucket 2
    // (ratio 7/3 → 2333333 ppm); type y: uniform 2,2 → none.
    val ms = Seq.fill(1)(0L) ++ Seq.fill(1)(3600000L) ++ Seq.fill(7)(7200000L)
    val ev = (ms.map(("x", _)) ++ Seq(("y", 0L), ("y", 0L), ("y", 3600000L), ("y", 3600000L)))
      .toDF("event_type", "ms")
      .withColumn("ts", timestamp_millis($"ms")).drop("ms")
    val r = queries.TemporalOps.burstWindows(ev).collect()
    assert(r.length == 1)
    assert((r(0).getString(0), r(0).getLong(1), r(0).getLong(2), r(0).getLong(3)) ==
      (("x", 7200000L, 7L, 2333333L)))
  }

  test("session stats: gap break splits sessions, durations floor-averaged") {
    import spark.implicits._
    import org.apache.spark.sql.functions.timestamp_millis
    // user 1: events at 0, 10min, 51min → sessions {0,10min} (dur
    // 600000) and {51min} (dur 0) → avg = 300000; user 2: one event.
    val ev = Seq((1L, 0L), (1L, 600000L), (1L, 3060000L), (2L, 0L))
      .toDF("user_id", "ms")
      .withColumn("ts", timestamp_millis($"ms")).drop("ms")
    val r = queries.TemporalOps.sessionStats(ev).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4)))).toMap
    assert(r(1L) == ((2L, 3L, 2L, 300000L)))
    assert(r(2L) == ((1L, 1L, 1L, 0L)))
  }

  test("transition matrix: consecutive pairs per user, ppm row-normalized, ties by event_id") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    // u1: view→click→view; u2: click→purchase;
    // u3: two events at the SAME ts — order must fall back to event_id
    // (signup id 10 before view id 11), so the pair is signup→view.
    val ev = Seq(
      (1L, 1L, 1000L, "view"), (1L, 2L, 2000L, "click"), (1L, 3L, 3000L, "view"),
      (2L, 4L, 1000L, "click"), (2L, 5L, 2000L, "purchase"),
      (3L, 10L, 5000L, "signup"), (3L, 11L, 5000L, "view"))
      .toDF("user_id", "event_id", "ms", "event_type")
      .withColumn("ts", timestamp_millis(col("ms")))
    val out = queries.TemporalOps.transitions(ev)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(out == Map(
      ("view", "click") -> (1L, 1000000L),
      ("click", "view") -> (1L, 500000L),      // from click: 1 of 2
      ("click", "purchase") -> (1L, 500000L),
      ("signup", "view") -> (1L, 1000000L)))
  }

  test("type pivot: static conditional-aggregate columns, one row per user") {
    import spark.implicits._
    val ev = Seq(
      (1L, "click"), (1L, "click"), (1L, "view"),
      (2L, "error"))
      .toDF("user_id", "event_type")
    val out = graft.streaming.EventStreams.typePivot(ev).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(out == Map(
      1L -> (2L, 0L, 0L, 0L, 1L, 3L),
      2L -> (0L, 1L, 0L, 0L, 0L, 1L)))
  }

  test("cdc compaction: last write wins by (ts, event_id), ties break on id") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    val ev = Seq(
      (1L, "x", 1L, 100000L, 1.0),
      (1L, "x", 2L, 200000L, 2.0),
      (1L, "x", 3L, 200000L, 3.0), // same ts as e2 → higher id wins
      (1L, "y", 4L, 50000L, 9.5),
      (2L, "x", 5L, 10000L, 7.25))
      .toDF("user_id", "event_type", "event_id", "ms", "value")
      .withColumn("ts", timestamp_millis(col("ms")))
    val out = graft.streaming.EventStreams.latestState(ev)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out == Map(
      (1L, "x") -> (3L, 3L, 300L),
      (1L, "y") -> (1L, 4L, 950L),
      (2L, "x") -> (1L, 5L, 725L)))
  }

  test("madOutliers: rank-selected median/MAD, spike beyond 3·MAD flagged") {
    import spark.implicits._
    // user 1: [1,1,1,1,100] → med=100c, every baseline dev 0 → MAD 0,
    //   the 9900c spike is the lone outlier (d > 3·0).
    // user 2: [1,2,3,4,5,100] cents [100..500,10000] → med = 3rd
    //   smallest = 300; devs [200,100,0,100,200,9700] → MAD = 3rd
    //   smallest = 100; only 9700 > 300 → one outlier.
    val ev = (Seq.tabulate(4)(i => (1L, i.toLong + 1, 1.0)) :+ ((1L, 5L, 100.0))) ++
      ((1 to 5).map(i => (2L, 10L + i, i.toDouble)) :+ ((2L, 16L, 100.0)))
    val out = TemporalOps.madOutliers(ev.toDF("user_id", "event_id", "value"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) == ((5L, 100L, 0L, 1L)))
    assert(out(2L) == ((6L, 300L, 100L, 1L)))
  }

  test("seasonalProfile: per-hour mean and absolute residual sum") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    def at(h: Int, m: Int) = (h * 3600L + m * 60L) * 1000L
    val ev = Seq(
      ("a", 1L, at(0, 5), 1.0),   // hour 0: 100c, 300c → mean 200,
      ("a", 2L, at(0, 50), 3.0),  //   sae = 100 + 100
      ("a", 3L, at(1, 10), 5.0),  // hour 1: single point, sae 0
      ("b", 4L, at(0, 0), 2.0),   // day 2, still hour-of-day 0
      ("b", 5L, at(24, 30), 4.0)) // 24h later → hour 0 again
      .toDF("event_type", "event_id", "ms", "value")
      .withColumn("ts", timestamp_millis(col("ms")))
    val out = TemporalOps.seasonalProfile(ev).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(("a", 0L)) == ((2L, 200L, 200L)))
    assert(out(("a", 1L)) == ((1L, 500L, 0L)))
    // both b events fold into the same hour-of-day slot
    assert(out(("b", 0L)) == ((2L, 300L, 200L)))
    assert(out.size == 3)
  }
  test("ohlc bars: open/close by (ts, event_id) order, high/low exact cents") {
    import spark.implicits._
    def t(i: Int) = new java.sql.Timestamp(i * 60000L) // minute i
    val ev = Seq(
      (1L, t(0), 7L, "a", 3.0),
      (2L, t(1), 7L, "a", 9.0),
      (3L, t(2), 7L, "a", 1.0),
      (4L, t(60), 8L, "a", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = TemporalOps.ohlcBars(ev).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    // hour 0: 3.00 then 9.00 then 1.00 -> open 300, high 900, low 100, close 100
    assert(out(("a", 0L)) == ((300L, 900L, 100L, 100L, 3L)))
    assert(out(("a", 1L)) == ((500L, 500L, 500L, 500L, 1L)))
    assert(out.size == 2)
  }

  test("session overlap: a session spanning three hours counts in each") {
    import spark.implicits._
    def t(ms: Long) = new java.sql.Timestamp(ms)
    val H = 3600000L
    // user 1: events every 20 min from 0:10 to 2:50 -> ONE session
    // (gaps < 30 min) spanning hours 0, 1, 2
    val u1 = (0 to 8).map(i => (i.toLong, t(600000L + i * 1200000L), 1L, "x", 0.0))
    // user 2: a single event in hour 1
    val u2 = Seq((100L, t(H + 5000L), 2L, "x", 0.0))
    val ev = (u1 ++ u2).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = TemporalOps.sessionOverlap(ev).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 1L, 1L -> 2L, 2L -> 1L))
  }

  test("twap: interval weights, last observation dropped, 0-gap sentinel") {
    import spark.implicits._
    def t(ms: Long) = new java.sql.Timestamp(ms)
    // user 1: 1.00 held for 3000 ms, then 5.00 for 1000 ms, last drops
    // -> (100*3000 + 500*1000) / 4000 = 200
    val u1 = Seq((1L, t(0L), 1L, "x", 1.0), (2L, t(3000L), 1L, "x", 5.0),
      (3L, t(4000L), 1L, "x", 9.0))
    // user 2: two co-timestamped events -> one 0-ms interval -> -1
    val u2 = Seq((4L, t(100L), 2L, "x", 2.0), (5L, t(100L), 2L, "x", 3.0))
    val ev = (u1 ++ u2).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = TemporalOps.twap(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((2L, 200L)))
    assert(out(2L) == ((1L, -1L)))
  }

  test("acf: densified hourly series, hand-computed lag correlations") {
    import spark.implicits._
    def t(h: Int, m: Int) = new java.sql.Timestamp((h * 3600L + m * 60L) * 1000L)
    // hourly counts [2, 0, 2] — hour 1 has NO events and must appear
    // as a zero via densification, not be skipped
    val ev = Seq(
      (1L, t(0, 5), 1L, "x", 0.0), (2L, t(0, 40), 1L, "x", 0.0),
      (3L, t(2, 10), 1L, "x", 0.0), (4L, t(2, 50), 1L, "x", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = TemporalOps.acf(ev, maxLag = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // n=3, S=4, cx = 3x−4 = [2, −4, 2]; den = 24
    // lag1: 2·(−4) + (−4)·2 = −16 → −0.6667 → −666667 (floor +0.5)
    // lag2: 2·2 = 4 → 0.1667 → 166667
    assert(out(1L) == ((2L, -666667L)))
    assert(out(2L) == ((1L, 166667L)))
  }

  test("markovStationary: 2-state chain converges to the hand fixpoint") {
    import spark.implicits._
    def t(ms: Long) = new java.sql.Timestamp(ms)
    // user 1 sequence A B B A B B → counts A→B:2, B→B:2, B→A:1
    val seq1 = Seq("A", "B", "B", "A", "B", "B")
    val ev = seq1.zipWithIndex.map { case (ty, i) =>
      (1L, (i + 1).toLong, t(1700000000000L + i * 1000L), ty)
    }.toDF("user_id", "event_id", "ts", "event_type")
    // replay the documented floor recursion independently
    var pa = 500000L; var pb = 500000L
    for (_ <- 1 to 8) {
      val na = pb * 1 / 3
      val nb = pa * 2 / 2 + pb * 2 / 3
      pa = na; pb = nb
    }
    val r = TemporalOps.markovStationary(ev, rounds = 8).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("A" -> pa, "B" -> pb), s"$r vs ($pa, $pb)")
    // the chain should have settled near (1/4, 3/4)
    assert(math.abs(pa - 250000L) < 30000 && math.abs(pb - 750000L) < 30000)
  }

  test("markovStationary: sink type keeps ONE row carrying held + received mass") {
    import spark.implicits._
    def t(ms: Long) = new java.sql.Timestamp(ms)
    // A → B and B is terminal: B has inflow but no outgoing steps, so
    // it is both a stepped target and a dangling (mass-holding) type —
    // the round must merge those into one row (held + received), not
    // union two rows per round
    val ev = Seq((1L, 1L, t(0L), "A"), (1L, 2L, t(1000L), "B"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val rows = TemporalOps.markovStationary(ev, rounds = 8).collect()
    assert(rows.length == 2, s"expected one row per type, got ${rows.toList}")
    val m = rows.map(x => x.getString(0) -> x.getLong(1)).toMap
    // round 1: B = held 500000 + received 500000·1/1; A drains to 0
    assert(m == Map("A" -> 0L, "B" -> 1000000L), s"$m")
  }

  test("benford: digits from exact cents, frozen expectation literals") {
    import spark.implicits._
    // cents: 1, 25, 100, 190, 2500 → digits 1, 2, 1, 1, 2
    val ev = Seq(0.01, 0.25, 1.0, 1.9, 25.0).toDF("value")
    val r = TemporalOps.benford(ev).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3))).toList
    assert(r.map(x => (x._1, x._2)) == List((1L, 3L), (2L, 2L)))
    assert(r.head._3 == 600000L)                       // 3/5 floor ppm
    assert(r.head._4 == TemporalOps.BenfordPpm.head)   // 301029
    assert(TemporalOps.BenfordPpm.head == 301029L &&
      TemporalOps.BenfordPpm.last == 45757L)
  }

  test("growthAccounting: the new/retained/resurrected/churned ledger balances") {
    import spark.implicits._
    def t(wk: Long) = new java.sql.Timestamp((wk * 7 - 3) * 86400000L + 1000L)
    // user 1: weeks 1,2,4 (new, retained, resurrected; churned in 3)
    // user 2: weeks 2,3   (new in 2, retained in 3, churned in 4)
    val ev = Seq((1L, t(1)), (1L, t(2)), (1L, t(4)), (2L, t(2)), (2L, t(3)))
      .toDF("user_id", "ts")
    val r = TemporalOps.growthAccounting(ev).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5)))).toMap
    assert(r(1L) == ((1L, 1L, 0L, 0L, 0L)), s"$r")      // u1 new
    assert(r(2L) == ((2L, 1L, 1L, 0L, 0L)))             // u2 new, u1 retained
    assert(r(3L) == ((1L, 0L, 1L, 0L, 1L)))             // u2 retained, u1 churned
    assert(r(4L) == ((1L, 0L, 0L, 1L, 1L)))             // u1 resurrected, u2 churned
  }

  test("hourAnomalies: a hot hour tops the seasonal-ratio watchlist") {
    import spark.implicits._
    def t(hr: Long, i: Long) = new java.sql.Timestamp(hr * 3600000L + i)
    // hour 0 and hour 168 share the (dow, hod) cell; 6 vs 2 events →
    // cell mean 4 → ratios 1.5e6 and 0.5e6
    val ev = ((1L to 6L).map(i => t(0, i)) ++ (1L to 2L).map(i => t(168, i)))
      .toDF("ts")
    val r = TemporalOps.hourAnomalies(ev).collect()
      .map(x => (x.getLong(0), x.getLong(3), x.getLong(4), x.getLong(5)))
    assert(r.head == ((0L, 6L, 4L, 1500000L)), s"${r.toList}")
    assert(r.last == ((168L, 2L, 4L, 500000L)))
  }

  test("cohortLtv: purchase cents per (cohort, offset), running cumulative") {
    import spark.implicits._
    def t(wk: Long) = new java.sql.Timestamp((wk * 7 - 3) * 86400000L + 1000L)
    val ev = Seq(
      (1L, t(1), "purchase", 1.00), (1L, t(2), "purchase", 2.00),
      (1L, t(2), "view", 99.0), // non-purchase never counts
      (2L, t(1), "signup", 0.0), (2L, t(2), "purchase", 5.00))
      .toDF("user_id", "ts", "event_type", "value")
    val r = TemporalOps.cohortLtv(ev).collect()
      .map(x => (x.getLong(0), x.getLong(1)) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r((1L, 0L)) == ((2L, 100L, 100L)), s"$r")   // both users wk1
    assert(r((1L, 1L)) == ((2L, 700L, 800L)))          // 200 + 500 cum
  }

  test("calendarHeat: integer dow/hour (0=Monday), shares sum ≤ 10⁶") {
    import spark.implicits._
    def t(ms: Long) = new java.sql.Timestamp(ms)
    // 1970-01-01 was a Thursday → dow (0+3)%7 = 3; 00:30 UTC → hour 0
    val ev = Seq((t(1800000L), 1.0), (t(1800000L), 2.0),
      (t(90000000L), 4.0)).toDF("ts", "value") // +25h → Friday (4), hour 1
    val r = TemporalOps.calendarHeat(ev).collect()
      .map(x => (x.getLong(0), x.getLong(1)) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r((3L, 0L)) == ((2L, 300L, 666666L)), s"$r")
    assert(r((4L, 1L)) == ((1L, 400L, 333333L)))
  }

  test("lag features: sentinels, trailing-3 floor mean, slice filter") {
    import spark.implicits._
    def t(ms: Long) = new java.sql.Timestamp(ms)
    // user 3 (3 % 25 = 3, in slice): values double each event
    val u3 = Seq((1L, t(0L), 3L, "x", 1.0), (2L, t(1000L), 3L, "x", 2.0),
      (3L, t(2000L), 3L, "x", 4.0), (4L, t(3000L), 3L, "x", 8.0),
      (5L, t(4000L), 3L, "x", 16.0))
    // user 4 is outside the 1-in-25 slice and must not appear
    val u4 = Seq((6L, t(0L), 4L, "x", 9.0))
    val ev = (u3 ++ u4).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = TemporalOps.lagFeatures(ev).collect()
      .map(r => r.getLong(1) ->
        ((r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(out.size == 5, s"slice filter leaked: $out")
    assert(out(1L) == ((-1L, -1L, -1L)))          // no history
    assert(out(2L) == ((100L, -1L, 100L)))        // 100/1
    assert(out(3L) == ((200L, 100L, 150L)))       // (100+200)/2
    assert(out(4L) == ((400L, 200L, 233L)))       // floor(700/3)
    assert(out(5L) == ((800L, 400L, 466L)))       // floor(1400/3)
  }

}
