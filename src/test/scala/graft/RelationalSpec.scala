package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, timestamp_millis}
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Relational

/** Unit semantics for relational operators not fully pinned by their
  * oracle gates — currently the RFM histogram-quartile scoring.
  */
class RelationalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)

  test("customerRfm: histogram quartiles score 1..4, ties stay with the crossing bin") {
    import spark.implicits._
    // four customers with strictly increasing recency/frequency/spend:
    // one order each day 1..4 for recency; 1..4 orders for frequency;
    // $10/$20/$30/$40 totals. Quartile cuts land on bins 1,2,3 →
    // scores are exactly 1,2,3,4 in every dimension.
    val rows = for {
      c <- 1L to 4L
      k <- 1L to c
    } yield (c * 100 + k, c, c * 86400000L, c * 10.0)
    val orders = rows
      .toDF("o_orderkey", "o_custkey", "ms", "o_totalprice")
      .withColumn("o_orderdate", timestamp_millis(col("ms"))).drop("ms")
    val r = Relational.customerRfm(orders)
      .collect()
      .map(x => x.getLong(0) -> ((x.getAs[Long]("r_score"),
        x.getAs[Long]("f_score"), x.getAs[Long]("m_score"),
        x.getAs[Long]("rfm")))).toMap
    assert(r(1L) == ((1L, 1L, 1L, 111L)))
    assert(r(2L) == ((2L, 2L, 2L, 222L)))
    assert(r(3L) == ((3L, 3L, 3L, 333L)))
    assert(r(4L) == ((4L, 4L, 4L, 444L)))
    // monetary is lifetime cents: customer 4 placed 4 × $40 orders
    val m = Relational.customerRfm(orders).collect()
      .map(x => x.getLong(0) -> x.getAs[Long]("m_cents")).toMap
    assert(m(4L) == 16000L)
  }

  test("revenueConcentration: one whale crosses the 80% cut alone") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    // whale: $900 of $1000 total → the top bin alone crosses 4/5;
    // 9 minnows at $11.11... wait — $900 + 9×$11.11 ≈ $1000
    val orders = ((1L, 900.0) +: (2L to 10L).map(c => (c, 11.0)))
      .zipWithIndex.map { case ((c, p), i) => (i.toLong, c, 0L, p) }
      .toDF("o_orderkey", "o_custkey", "ms", "o_totalprice")
      .withColumn("o_orderdate", timestamp_millis(col("ms"))).drop("ms")
    val r = Relational.revenueConcentration(orders, num = 4, den = 5)
      .collect()(0)
    // 90000 cents of 99900 total = 90.1% ≥ 80% — the whale alone
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == ((1L, 10L, 90000L, 99900L, 100000L)))
  }

  test("monthlyYoy: growth joins the prior-year month, -1 where none exists") {
    import spark.implicits._
    import org.apache.spark.sql.functions.to_timestamp
    val orders = Seq(
      (1L, "1995-03-10", 100.0), (2L, "1995-03-20", 100.0),
      (3L, "1996-03-05", 300.0), (4L, "1996-07-01", 50.0))
      .toDF("o_orderkey", "d", "o_totalprice")
      .withColumn("o_orderdate", to_timestamp($"d")).drop("d")
    val r = Relational.monthlyYoy(orders).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4)))).toMap
    assert(r(199503L) == ((2L, 20000L, -1L, -1L)))
    // 1996-03 vs 1995-03: 30000/20000 → 1.5x = 1_500_000 ppm
    assert(r(199603L) == ((1L, 30000L, 20000L, 1500000L)))
    assert(r(199607L) == ((1L, 5000L, -1L, -1L)))
  }

  test("basketLift: co-ordered pair lifts, hub parts capped out") {
    import spark.implicits._
    // 4 orders; parts 1,2 always together (n_ab=2 of 2 each → lift
    // = 2·4/(2·2) = 2.0 → 2_000_000 ppm); part 99 in ALL orders with
    // hubCap=3 < 4 → excluded entirely.
    val li = Seq(
      (1L, 1L), (1L, 2L), (1L, 99L),
      (2L, 1L), (2L, 2L), (2L, 99L),
      (3L, 3L), (3L, 99L), (4L, 3L), (4L, 99L))
      .toDF("l_orderkey", "l_partkey")
    val r = Relational.basketLift(li, hubCap = 3, minPairs = 2).collect()
      .map(x => (x.getLong(0), x.getLong(1)) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5)))).toMap
    assert(r == Map((1L, 2L) -> ((2L, 2L, 2L, 2000000L))))
  }

  test("customerRfm: identical customers all land in the bottom quartile bin") {
    import spark.implicits._
    val orders = (1L to 8L).map(c => (c, c, 86400000L, 25.0))
      .toDF("o_orderkey", "o_custkey", "ms", "o_totalprice")
      .withColumn("o_orderdate", timestamp_millis(col("ms"))).drop("ms")
    val r = Relational.customerRfm(orders).collect()
      .map(x => x.getAs[Long]("rfm")).toSet
    // every metric histogram is one bin → every cut is that bin →
    // nobody is strictly above any cut → uniform score 111
    assert(r == Set(111L))
  }

  test("skyline: frontier kept, dominated dropped, exact duplicates both survive") {
    import spark.implicits._
    // (partkey, size, price): minimize price, maximize size.
    //  4: (2, $1)  cheapest → frontier.   2: (5, $3) → frontier.
    //  1 & 5: (10, $5) exact duplicates → BOTH frontier (neither strict).
    //  3: (10, $7) dominated by 1 (same size, strictly cheaper).
    val part = Seq((1L, 10, 5.0), (2L, 5, 3.0), (3L, 10, 7.0),
      (4L, 2, 1.0), (5L, 10, 5.0))
      .toDF("p_partkey", "p_size", "p_retailprice")
    // bucketCents=100 → one bucket per price point, so the prefix-max
    // certificate phase actually prunes (part 3 dies in phase 1)
    val out = Relational.skyline(part, bucketCents = 100L)
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L, 4L, 5L))
    // one giant bucket → no phase-1 pruning, phase 2 alone must agree
    val out1 = Relational.skyline(part, bucketCents = 1000000L)
      .collect().map(_.getLong(0)).toSet
    assert(out1 == Set(1L, 2L, 4L, 5L))
  }

  test("tableProfile: null/distinct/min/max per column off one scan") {
    import spark.implicits._
    val li = Seq(
      (1L, 10L, 100L, 1, Some(5.0), 10.0, 0.05, 86400000L),
      (1L, 11L, 100L, 2, None, 20.0, 0.10, 172800000L),
      (2L, 10L, 101L, 1, Some(7.0), 30.0, 0.05, 172800000L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "ms")
      .withColumn("l_shipdate", timestamp_millis(col("ms"))).drop("ms")
    val p = Relational.tableProfile(li).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(p("l_orderkey") == ((0L, 2L, 1L, 2L)))
    assert(p("l_quantity") == ((1L, 2L, 5L, 7L)))    // the None is a null
    assert(p("l_extendedprice") == ((0L, 3L, 1000L, 3000L))) // cents
    assert(p("l_shipdate") == ((0L, 2L, 1L, 2L)))    // epoch days
    assert(p.size == 8)
  }
  test("gini: equal revenues score 0, a whale pushes toward 1") {
    import spark.implicits._
    val eq = Seq((1L, 1L, 10.0), (2L, 2L, 10.0), (3L, 3L, 10.0), (4L, 4L, 10.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val g0 = Relational.giniRevenue(eq).collect().head
    assert((g0.getLong(0), g0.getLong(1), g0.getLong(2)) == ((4L, 4000L, 0L)))
    // cents x = [1, 1, 1, 10000]: n=4, Sx=10003, S(i*x)=1+2+3+40000=40006
    // G_ppm = (2*40006 - 5*10003) * 1e6 // (4*10003) = 29997000000 // 40012
    val wh = Seq((1L, 1L, 0.01), (2L, 2L, 0.01), (3L, 3L, 0.01), (4L, 4L, 100.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val g1 = Relational.giniRevenue(wh).collect().head
    assert(g1.getLong(2) == 29997000000L / 40012L)
  }

  test("measureCorrelation: perfect linear → 10⁶ ppm, inverse → −10⁶") {
    import spark.implicits._
    // price = 100·quantity (r=+1); discount = −quantity + 10 (r=−1)
    val li = (1 to 8).map(i =>
      (i.toLong, (10 - i) / 100.0, i.toDouble))
      .toDF("l_quantity", "l_discount", "l_extendedprice")
    val r = Relational.measureCorrelation(li).collect()
      .map(x => x.getString(0) -> x.getLong(2)).toMap
    assert(r("quantity_price") == 1000000L, s"$r")
    assert(r("quantity_discount") == -1000000L)
    assert(r("discount_price") == -1000000L)
  }

  test("tableChecksum: order-invariant, content-sensitive") {
    import spark.implicits._
    def frame(rows: Seq[(Long, Long, String, Double, Long, String)]) =
      rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "_ms", "o_orderpriority")
        .withColumn("o_orderdate", timestamp_millis(col("_ms")))
        .drop("_ms")
    val rows = Seq(
      (1L, 10L, "O", 123.45, 1700000000000L, "1-URGENT"),
      (2L, 20L, "F", 67.89, 1700086400000L, "3-MEDIUM"),
      (3L, 30L, "P", 0.01, 1700172800000L, "5-LOW"))
    val a = Relational.tableChecksum(frame(rows)).collect().head
    val b = Relational.tableChecksum(frame(rows.reverse)).collect().head
    assert(a.getLong(0) == 3L && a.getLong(1) == b.getLong(1))
    // a one-cent edit flips the checksum
    val edited = rows.updated(0, rows.head.copy(_4 = 123.46))
    val c = Relational.tableChecksum(frame(edited)).collect().head
    assert(c.getLong(1) != a.getLong(1))
  }

}
