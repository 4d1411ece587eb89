package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational / aggregation core: the bench headliners.
  *
  * All operators are declarative DataFrame plans so Catalyst handles
  * predicate pushdown, column pruning and partial aggregation; dims
  * are explicitly broadcast so the fact-table scan never shuffles for
  * a star join. Double aggregates are rounded (2–4 dp) for stable
  * cross-engine comparison.
  */
object Relational {

  /** TPC-H Q1-shaped pricing summary: single shuffle on the two
    * low-cardinality group keys, map-side partial agg does the heavy
    * lifting; scan reads only the 7 needed columns.
    */
  def pricingSummary(lineitem: DataFrame, cutoff: String = "1998-09-02"): DataFrame = {
    // every money measure aggregates as an EXACT integer-unit sum
    // (cents × discount/tax percent points, DECIMAL(38,0)-widened)
    // and is rounded once at the end — aggregation order can no
    // longer move a cent at any scale (the u100 contract)
    val ep = u100(col("l_extendedprice"))
    val dc = lit(100L) - u100(col("l_discount"))
    val tx = lit(100L) + u100(col("l_tax"))
    lineitem
      .filter(col("l_shipdate") <= to_timestamp(lit(cutoff)))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sumU(qtyLong(col("l_quantity"))).as("qty_u"),
        sumU(ep).as("base_u"),
        sumU(ep * dc).as("discprice_u"),
        sumU(ep * dc * tx).as("charge_u"),
        sumU(u100(col("l_discount"))).as("disc_u"),
        count(lit(1)).as("count_order"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("qty_u").cast("double").as("sum_qty"),
        money2(col("base_u"), 1L).as("sum_base_price"),
        money2(col("discprice_u"), 100L).as("sum_disc_price"),
        money2(col("charge_u"), 10000L).as("sum_charge"),
        avg4(col("qty_u"), 1L, col("count_order")).as("avg_qty"),
        avg4(col("base_u"), 100L, col("count_order")).as("avg_price"),
        avg4(col("disc_u"), 100L, col("count_order")).as("avg_disc"),
        col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** TPC-H Q3-shaped top-k revenue: selective dim (filtered customer)
    * broadcast to the orders join; only the surviving orders shuffle
    * against lineitem. Revenue rounded before the ordering so the
    * top-k cutoff is deterministic across engines.
    *
    * Only the filtered CUSTOMER dim carries a broadcast hint. The
    * date filter on orders keeps a constant *fraction* of a fact
    * table, so hinting it broadcast would force a multi-GB driver
    * collect at 100× scale; the orders⋈lineitem join is left to
    * shuffle (AQE still auto-broadcasts when the filtered side is
    * genuinely small). PlanAuditSpec pins this.
    */
  def topUnshippedOrders(
      customer: DataFrame,
      orders: DataFrame,
      lineitem: DataFrame,
      segment: String,
      date: String,
      k: Int = 10): DataFrame = {
    val c = customer.filter(col("c_mktsegment") === segment).select("c_custkey")
    val o = orders
      .filter(col("o_orderdate") < to_timestamp(lit(date)))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val l = lineitem
      .filter(col("l_shipdate") > to_timestamp(lit(date)))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    l.join(o.join(broadcast(c), o("o_custkey") === c("c_custkey")),
        l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"))
      .agg(money2(sumU(u100(col("l_extendedprice")) *
        (lit(100L) - u100(col("l_discount")))), 100L).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(k)
  }

  /** TPC-H Q5-shaped star join: every dim broadcast, the single
    * shuffle is the final 25-key aggregation.
    */
  def revenueByNation(
      lineitem: DataFrame,
      supplier: DataFrame,
      nation: DataFrame,
      region: DataFrame,
      regionName: String): DataFrame = {
    val dims = supplier
      .join(broadcast(nation), supplier("s_nationkey") === nation("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === regionName)),
        nation("n_regionkey") === region("r_regionkey"))
      .select(col("s_suppkey"), col("n_name"))
    lineitem
      .select("l_suppkey", "l_extendedprice", "l_discount")
      .join(broadcast(dims), col("l_suppkey") === col("s_suppkey"))
      .groupBy("n_name")
      .agg(money2(sumU(u100(col("l_extendedprice")) *
        (lit(100L) - u100(col("l_discount")))), 100L).as("revenue"))
      .orderBy("n_name")
  }

  /** TPC-H Q6-shaped forecast revenue: pure selective scan →
    * single-row agg; every predicate reaches the parquet reader, no
    * shuffle at all (partial agg + final over 1 exchange of 1 row). */
  def forecastRevenue(lineitem: DataFrame, year: String = "1997",
      discLo: Double = 0.04, discHi: Double = 0.08, qtyMax: Double = 30.0): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= to_timestamp(lit(s"$year-01-01")) &&
        col("l_shipdate") < to_timestamp(lit(s"${year.toInt + 1}-01-01")) &&
        col("l_discount").between(discLo, discHi) &&
        col("l_quantity") < qtyMax)
      .agg(money2(sumU(u100(col("l_extendedprice")) * u100(col("l_discount"))),
        100L).as("revenue"),
        count(lit(1)).as("n_rows"))

  /** TPC-H Q4-shaped priority check: orders in a window having at
    * least one RETURNED lineitem, counted by priority. The EXISTS is
    * a LEFT SEMI join — the probe (orders) streams, the filtered
    * build side never duplicates matches, so a 100-lineitem order
    * costs one probe hit, not 100 joined rows. The l_returnflag
    * filter pushes to the lineitem scan. (The canonical Q4 predicate
    * is commitdate < receiptdate; this corpus carries neither column,
    * so the returned-flag stands in — same plan shape.) */
  def orderPriorityReturns(orders: DataFrame, lineitem: DataFrame,
      lo: String = "1997-01-01", hi: String = "1997-04-01"): DataFrame =
    orders
      .filter(col("o_orderdate") >= to_timestamp(lit(lo)) &&
        col("o_orderdate") < to_timestamp(lit(hi)))
      .join(lineitem.filter(col("l_returnflag") === "R").select("l_orderkey"),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  /** TPC-H Q18-shaped large-order customers: groupBy-HAVING on the
    * fact table first (map-side partial agg shrinks it), then join
    * the survivors to dims — never the other way around. */
  def largeOrders(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
      minQty: Double = 210.0): DataFrame = {
    val big = lineitem.groupBy("l_orderkey")
      .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
      .filter(col("total_qty") >= minQty)
    big
      .join(orders, big("l_orderkey") === orders("o_orderkey"))
      .join(broadcast(customer.select("c_custkey", "c_name")),
        orders("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        round(col("o_totalprice"), 2).as("o_totalprice"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Window functions: first-5-shipments running quantity per
    * supplier. Partition key = supplier (uniform), ordering fully
    * deterministic via the (date, orderkey, linenumber) tiebreak.
    */
  def supplierRunningShipments(lineitem: DataFrame, k: Int = 5): DataFrame = {
    val w = Window
      .partitionBy("l_suppkey")
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    lineitem
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_shipdate"))
      .withColumn("rn", row_number().over(w))
      .withColumn("run_qty",
        round(sum(col("l_quantity")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
      .filter(col("rn") <= k)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("rn"), col("run_qty"))
      .orderBy("l_suppkey", "rn")
  }

  private def rnd(c: org.apache.spark.sql.Column, s: Int): org.apache.spark.sql.Column =
    graft.functions.Rounding.rnd(c, s)

  /** TPC-H Q10-shaped returned-item report: which customers returned
    * the most revenue in a quarter. Plan shape: lineitem is
    * pre-filtered to returns, orders to the date window, and the two
    * FACT tables shuffle-join on orderkey (neither side is hinted —
    * both keep a constant fraction of a fact table, the q3 lesson);
    * customer joins the aggregated per-customer revenue (1 row per
    * customer, post-agg — the small side AFTER reduction), and only
    * nation (25 rows) is broadcast.
    */
  def returnedItemReport(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, nation: DataFrame,
      lo: String = "1997-01-01", hi: String = "1997-04-01",
      k: Int = 20): DataFrame = {
    val o = orders
      .filter(col("o_orderdate") >= to_timestamp(lit(lo)) &&
        col("o_orderdate") < to_timestamp(lit(hi)))
      .select("o_orderkey", "o_custkey")
    val l = lineitem.filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val rev = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(money2(sumU(u100(col("l_extendedprice")) *
        (lit(100L) - u100(col("l_discount")))), 100L).as("revenue"))
    rev
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        round(col("c_acctbal"), 2).as("c_acctbal"), col("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(k)
  }

  /** TPC-H Q14-shaped promo-revenue share: what fraction of a month's
    * revenue came from PROMO parts. Part is a true dim — broadcast;
    * the month filter pushes to the lineitem scan; one single-row agg.
    * The share is a ratio of two rounded sums, floor-form rounded so
    * the division replays bit-identically.
    */
  def promoRevenueShare(lineitem: DataFrame, part: DataFrame,
      lo: String = "1997-09-01", hi: String = "1997-10-01"): DataFrame = {
    val l = lineitem
      .filter(col("l_shipdate") >= to_timestamp(lit(lo)) &&
        col("l_shipdate") < to_timestamp(lit(hi)))
      .select("l_partkey", "l_extendedprice", "l_discount")
    val revU = u100(col("l_extendedprice")) * (lit(100L) - u100(col("l_discount")))
    l.join(broadcast(part.select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sumU(when(col("p_type") === "PROMO", revU).otherwise(lit(0L)))
          .as("promo_u"),
        sumU(revU).as("total_u"))
      .select(money2(col("promo_u"), 100L).as("promo_revenue"),
        money2(col("total_u"), 100L).as("total_revenue"))
      .select(col("promo_revenue"), col("total_revenue"),
        rnd(lit(100.0) * col("promo_revenue") / col("total_revenue"), 4)
          .as("promo_pct"))
  }

  /** TPC-H Q19-shaped disjunctive revenue: three (brand, size-range,
    * qty-range) alternatives OR-ed together. Catalyst cannot push a
    * cross-table OR through the join, so each side is pre-filtered
    * with the union of ITS OWN conjuncts (sound: every disjunct
    * constrains both sides) and the full disjunction applies
    * post-join — the scan reads the ~3-brand fraction of part and the
    * qty envelope of lineitem instead of everything. Part after its
    * pre-filter is a small dim → broadcast.
    */
  def discountedBrandRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val alts = Seq(("Brand#12", 1, 5, 1.0, 11.0), ("Brand#23", 1, 10, 10.0, 20.0),
      ("Brand#34", 1, 15, 20.0, 30.0))
    val pSide = alts.map { case (b, sLo, sHi, _, _) =>
      col("p_brand") === b && col("p_size").between(sLo, sHi)
    }.reduce(_ || _)
    val lSide = alts.map { case (_, _, _, qLo, qHi) =>
      col("l_quantity").between(qLo, qHi)
    }.reduce(_ || _)
    val full = alts.map { case (b, sLo, sHi, qLo, qHi) =>
      col("p_brand") === b && col("p_size").between(sLo, sHi) &&
        col("l_quantity").between(qLo, qHi)
    }.reduce(_ || _)
    lineitem.select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .filter(lSide)
      .join(broadcast(part.select("p_partkey", "p_brand", "p_size").filter(pSide)),
        col("l_partkey") === col("p_partkey"))
      .filter(full)
      .agg(money2(sumU(u100(col("l_extendedprice")) *
        (lit(100L) - u100(col("l_discount")))), 100L).as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  /** TPC-H Q7-shaped volume shipping: revenue between two nations by
    * year, in both directions. Supplier and nation are broadcast dims
    * on the lineitem side; customer (a real table, not hinted) joins
    * orders on the shuffle; the nation-pair filter applies where both
    * sides are known. Ship year derives from l_shipdate.
    */
  def volumeShipping(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, supplier: DataFrame, nation: DataFrame,
      nationA: String = "NATION_1", nationB: String = "NATION_2"): DataFrame = {
    val pairNations = nation.filter(col("n_name").isin(nationA, nationB))
    val sup = supplier
      .join(broadcast(pairNations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = customer
      .join(broadcast(pairNations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    lineitem
      .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(money2(sumU(u100(col("l_extendedprice")) *
        (lit(100L) - u100(col("l_discount")))), 100L).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q2-shaped min-cost supplier: for every part, the supplier
    * with the cheapest observed unit price (argmin). Two-level
    * aggregation BEFORE any dim join — the second level is a single
    * min(struct(unit_cost, suppkey)) argmin whose struct ordering
    * doubles as the deterministic (cost asc, suppkey asc) tiebreak;
    * part/supplier join the already-part-keyed result (≤ |part| rows),
    * so neither dim needs a broadcast hint (AQE takes it when small).
    * unit_cost is a floor-form-rounded MIN of per-row divisions — no
    * summation anywhere, so the value is bit-identical cross-engine.
    */
  def minCostSupplier(lineitem: DataFrame, part: DataFrame,
      supplier: DataFrame): DataFrame = {
    val unit = lineitem
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(rnd(min(col("l_extendedprice") / col("l_quantity")), 2).as("unit_cost"))
    val best = unit.groupBy(col("l_partkey"))
      .agg(min(struct(col("unit_cost"), col("l_suppkey"))).as("m"))
      .select(col("l_partkey"), col("m.unit_cost").as("unit_cost"),
        col("m.l_suppkey").as("best_suppkey"))
    best
      .join(part.select("p_partkey", "p_name"), col("l_partkey") === col("p_partkey"))
      .join(supplier.select("s_suppkey", "s_name"),
        col("best_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_name"), col("s_name"), col("unit_cost"))
      .orderBy("p_partkey")
  }

  /** Floor-form integer cents: ⌊x·100+0.5⌋ as long. Sums of longs are
    * order-independent, so any comparison/ratio built on cents replays
    * bit-identically in the oracle (the q22 contract, shared here by
    * q8/q9/q11/q15/q17/q20). */
  private def centsOf(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(c * 100 + lit(0.5)).cast("long")

  /** Exact hundredths of a ≤2dp column (cents of a price, percent
    * points of a discount/tax) — per-row exact, so money products stay
    * integral and their SUM (widened through DECIMAL(38,0), the 100 TB
    * overflow guard) cannot be perturbed by aggregation order. The
    * round(sum(double)) form this family replaced drifted one cent on
    * an organic-data rounding half-boundary (r8). */
  private def u100(c: Column): Column = floor(c * 100 + lit(0.5)).cast("long")

  /** Integral mapping for quantity-like doubles, mirrored by the
    * oracle's CAST(x AS BIGINT): DuckDB rounds to nearest while Spark
    * cast("long") truncates toward zero, so a naive cast diverges
    * cross-engine the moment a value is non-integral. floor(x+0.5)
    * ≡ round-half-away for the non-negative domain these columns
    * carry (the u100 contract applied at unit scale). */
  private[queries] def qtyLong(c: Column): Column =
    floor(c + lit(0.5)).cast("long")
  private def sumU(perRow: Column): Column = sum(perRow.cast("decimal(38,0)"))

  /** Integral floor-div of a nonnegative DECIMAL(38,0) by `d` via the
    * exact-multiple identity (x − x mod d)/d — decimal division only
    * ever divides an exact multiple, so its result-scale rounding can
    * never touch the quotient. */
  private def divU(x: Column, d: Column): Column =
    ((x - pmod(x, d)) / d).cast("decimal(38,0)")

  /** round-half-up(units/10^(2+k), 2) → dollars as double, where
    * unitsPerCent = 10^k: the engine-order-proof end-rounding that
    * reproduces round(sum(...), 2) exactly away from ties and
    * deterministically on them. */
  private def money2(u: Column, unitsPerCent: Long): Column =
    divU(u + lit(unitsPerCent / 2).cast("decimal(38,0)"),
      lit(unitsPerCent).cast("decimal(38,0)")).cast("double") / 100.0

  /** floor-form 4dp of sumInt/(scale·n) — the exact-ratio average:
    * floor(a/b + 0.5) = (2a + b) div (2b). */
  private def avg4(sumInt: Column, scale: Long, n: Column): Column = {
    val num = sumInt.cast("decimal(38,0)") * lit(20000L) +
      (n * lit(scale)).cast("decimal(38,0)")
    val den = (n * lit(2L * scale)).cast("decimal(38,0)")
    divU(num, den).cast("double") / 10000.0
  }

  /** TPC-H Q8-shaped national market share: of the revenue shipped to
    * customers in `regionName`, what fraction came from suppliers in
    * `targetNation`, by order year. Plan shape: supplier⋈nation is a
    * broadcast dim on the lineitem side; lineitem⋈orders is the one
    * fact-fact shuffle; the region membership test is a LEFT SEMI join
    * against the region's customer keys (a constant fraction of
    * customer — never hinted broadcast, the q3 lesson). The share is a
    * floor-form 4dp ratio of two exact long cent sums.
    */
  def nationMarketShare(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, supplier: DataFrame, nation: DataFrame,
      region: DataFrame, regionName: String = "ASIA",
      targetNation: String = "NATION_3"): DataFrame = {
    val regionNations = nation
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val custInRegion = customer
      .join(broadcast(regionNations), col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val supN = supplier
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val revCents = centsOf(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
    lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
      .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(custInRegion, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(when(col("supp_nation") === targetNation, revCents)
          .otherwise(lit(0L))).as("nation_cents"),
        sum(revCents).as("total_cents"))
      .select(col("o_year"), col("nation_cents"), col("total_cents"),
        rnd(col("nation_cents").cast("double") / col("total_cents"), 4)
          .as("mkt_share"))
      .orderBy("o_year")
  }

  /** TPC-H Q9-shaped product-type profit: per (supplier nation, ship
    * year), revenue minus a retail-derived cost for parts matching a
    * name pattern. partsupp does not exist in this corpus, so cost is
    * p_retailprice·qty/10 (same join shape: part is the selective
    * broadcast dim, supplier⋈nation the second). Profit is EXACT long
    * cents: each row contributes ⌊rev·100+.5⌋ − ⌊cost·100+.5⌋, so the
    * sum has no float summation-order surface at all.
    */
  def productTypeProfit(lineitem: DataFrame, part: DataFrame,
      supplier: DataFrame, nation: DataFrame,
      namePattern: String = "%gear%"): DataFrame = {
    val p = part.filter(col("p_name").like(namePattern))
      .select("p_partkey", "p_retailprice")
    val supN = supplier
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    val profit = centsOf(col("l_extendedprice") * (lit(1.0) - col("l_discount"))) -
      floor(col("p_retailprice") * col("l_quantity") * 10 + lit(0.5)).cast("long")
    lineitem
      .select("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
        "l_discount", "l_shipdate")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("nation"), year(col("l_shipdate")).as("o_year"))
      .agg(sum(profit).as("profit_cents"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q11-shaped important parts: parts whose inventory value
    * (from one nation's suppliers) exceeds a fixed fraction of the
    * global total. Plan shape: the per-part aggregation runs FIRST
    * (map-side partials shrink the fact scan to ≤|part| rows), the
    * global total derives from the CHECKPOINTED aggregate (≤|part|
    * rows — Catalyst does not reuse the exchange across the broadcast
    * boundary, so without the checkpoint the scalar re-scans the whole
    * fact table), and the HAVING is the exact integer inequality
    * value·10000 > total — no double threshold to drift at the boundary.
    */
  def importantParts(lineitem: DataFrame, supplier: DataFrame,
      nation: DataFrame, nationName: String = "NATION_5",
      fracBp: Int = 10): DataFrame = {
    // fracBp = basis points (1/10000); default 10bp = 0.1%.
    val supIn = supplier
      .join(broadcast(nation.filter(col("n_name") === nationName)),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val value = lineitem.select("l_partkey", "l_suppkey", "l_extendedprice")
      .join(broadcast(supIn), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey").as("partkey"))
      .agg(sum(centsOf(col("l_extendedprice"))).as("value_cents"))
      .localCheckpoint()
    val total = value.agg(sum(col("value_cents")).as("total_cents"))
    value.crossJoin(broadcast(total))
      .filter(col("value_cents") * 10000 > col("total_cents") * fracBp)
      .select("partkey", "value_cents")
      .orderBy(col("value_cents").desc, col("partkey"))
  }

  /** TPC-H Q12-shaped late-shipment priority count: lines shipped more
    * than `lateDays` after the order date, split urgent/other per line
    * status. The corpus has no l_shipmode/l_commitdate, so linestatus
    * stands in for the mode grouping and ship-vs-order lag for
    * receipt-vs-commit — identical plan shape: one orderkey shuffle
    * join between the two fact tables, conditional aggregation on top.
    * The lateness test is timestamp arithmetic (exact in both engines).
    */
  def lateShipmentPriority(orders: DataFrame, lineitem: DataFrame,
      lateDays: Int = 60): DataFrame =
    lineitem.select("l_orderkey", "l_linestatus", "l_shipdate")
      .join(orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >
        col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("low_line_count"))
      .orderBy("l_linestatus")

  /** TPC-H Q13-shaped customer order-count distribution: how many
    * customers placed exactly N qualifying orders. The orders fact
    * aggregates to one row per customer FIRST; customer then LEFT
    * joins the reduced frame (missing → 0), and the second, tiny
    * aggregation builds the histogram. Never an outer join against the
    * raw fact table.
    */
  def customerOrderDistribution(customer: DataFrame, orders: DataFrame,
      excludePriority: String = "1-URGENT"): DataFrame = {
    val perCust = orders.filter(col("o_orderpriority") =!= excludePriority)
      .groupBy("o_custkey").agg(count(lit(1)).as("n"))
    customer.select("c_custkey")
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("n"), lit(0L)).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q15-shaped top supplier: supplier(s) with the maximum
    * quarter revenue. Per-supplier revenue aggregates in exact long
    * cents; the max is a 1-row broadcast cross join over the
    * CHECKPOINTED per-supplier aggregate (≤|supplier| rows — without
    * the checkpoint the scalar branch re-scans the fact table, see
    * importantParts); equality on longs is exact, so ties surface
    * every maximal supplier as the spec demands.
    */
  def topSupplier(lineitem: DataFrame, supplier: DataFrame,
      lo: String = "1997-01-01", hi: String = "1997-04-01"): DataFrame = {
    val rev = lineitem
      .filter(col("l_shipdate") >= to_timestamp(lit(lo)) &&
        col("l_shipdate") < to_timestamp(lit(hi)))
      .groupBy(col("l_suppkey"))
      .agg(sum(centsOf(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("total_cents"))
      .localCheckpoint()
    val mx = rev.agg(max(col("total_cents")).as("max_cents"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_cents") === col("max_cents"))
      .join(broadcast(supplier.select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_cents"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q16-shaped supplier count by part attributes: distinct
    * suppliers per (brand, type, size) over the observed (part,
    * supplier) pairs, excluding one brand, one type, off-list sizes,
    * and negative-balance suppliers (the "complaints" stand-in). The
    * pair set distincts on (partkey, suppkey) BEFORE the dim join; the
    * supplier exclusion is a broadcast LEFT ANTI (6 keys); part is a
    * broadcast dim. countDistinct rides the already-distinct pairs.
    */
  def supplierCountByPart(lineitem: DataFrame, part: DataFrame,
      supplier: DataFrame, excludeBrand: String = "Brand#4",
      excludeType: String = "PROMO",
      sizes: Seq[Int] = Seq(1, 4, 9, 14, 19, 24, 29, 34)): DataFrame = {
    val pairs = lineitem.select("l_partkey", "l_suppkey").distinct()
    val p = part
      .filter(col("p_brand") =!= excludeBrand && col("p_type") =!= excludeType &&
        col("p_size").isin(sizes.map(Integer.valueOf): _*))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val badSupp = supplier.filter(col("s_acctbal") < 0).select("s_suppkey")
    pairs
      .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** TPC-H Q17-shaped small-quantity revenue: revenue lost if orders
    * below 20% of a part's average quantity were dropped, for one
    * brand. The per-part average NEVER materializes as a double:
    * quantities are exact cents (corpus quantities are integers), and
    * "qty < 0.2·avg" is the integer cross-multiplication
    * 5·qty_cents·n < sum_cents — zero drift surface. Two passes over
    * the brand's lineitem slice (canonical shape); the per-part
    * aggregate is small and AQE broadcasts it to the second pass.
    */
  def smallQuantityRevenue(lineitem: DataFrame, part: DataFrame,
      brand: String = "Brand#23"): DataFrame = {
    val pkeys = part.filter(col("p_brand") === brand).select("p_partkey")
    val li = lineitem.select("l_partkey", "l_quantity", "l_extendedprice")
      .join(broadcast(pkeys), col("l_partkey") === col("p_partkey"), "left_semi")
    val perPart = li.groupBy(col("l_partkey").as("pk"))
      .agg(sum(centsOf(col("l_quantity"))).as("sum_qty_cents"),
        count(lit(1)).as("n_lines"))
    li.join(perPart, col("l_partkey") === col("pk"))
      .filter(centsOf(col("l_quantity")) * 5 * col("n_lines") <
        col("sum_qty_cents"))
      .agg(
        coalesce(sum(centsOf(col("l_extendedprice"))), lit(0L)).as("rev_cents"),
        count(lit(1)).as("n_rows"))
      // true integer floor division (see salesProspects): a double
      // quotient cast to long can disagree with the oracle's `//`
      .select(expr("rev_cents div 7").as("avg_yearly_cents"), col("n_rows"))
  }

  /** TPC-H Q20-shaped promotion-part suppliers: suppliers who shipped
    * more than `shareNum/shareDen` of some matching part's total
    * volume. Two aggregations over the filtered slice — per (supplier,
    * part), then per part BY RE-AGGREGATING the first (long sums are
    * associative, and it saves a second fact scan); the two join on
    * partkey (the per-part side is ≤|part| rows, AQE broadcasts it);
    * the share test is the exact integer cross-multiplication
    * den·supp > num·total; the survivor keys SEMI-join supplier. No
    * correlated subquery anywhere.
    */
  def promotionPartSuppliers(lineitem: DataFrame, part: DataFrame,
      supplier: DataFrame, namePattern: String = "%bolt%",
      shareNum: Int = 3, shareDen: Int = 10): DataFrame = {
    val pkeys = part.filter(col("p_name").like(namePattern)).select("p_partkey")
    val li = lineitem.select("l_partkey", "l_suppkey", "l_quantity")
      .join(broadcast(pkeys), col("l_partkey") === col("p_partkey"), "left_semi")
    val bySupp = li.groupBy("l_partkey", "l_suppkey")
      .agg(sum(centsOf(col("l_quantity"))).as("supp_cents"))
      .localCheckpoint()
    val byPart = bySupp.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("supp_cents")).as("total_cents"))
    val qualifying = bySupp.join(byPart, col("l_partkey") === col("pk"))
      .filter(col("supp_cents") * shareDen > col("total_cents") * shareNum)
      .select("l_suppkey").distinct()
    supplier.join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
      .orderBy("s_suppkey")
  }

  /** TPC-H Q21-shaped waiting-supplier count: suppliers from one
    * nation who were the ONLY supplier with returned lines on a
    * multi-supplier finished order. The base is the distinct (order,
    * supplier) pair frame — built once, reused for both the EXISTS
    * (another supplier participated: semi join with a ≠ condition) and
    * the NOT EXISTS (no other supplier returned: anti join). Both
    * probes key the shuffle on orderkey; the nation membership and the
    * finished-order filters are broadcast semi joins.
    */
  def waitingSuppliers(lineitem: DataFrame, orders: DataFrame,
      supplier: DataFrame, nation: DataFrame,
      nationName: String = "NATION_2"): DataFrame = {
    val allPairs = lineitem.select(col("l_orderkey").as("ok"),
      col("l_suppkey").as("sk")).distinct()
    val rPairs = lineitem.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk")).distinct()
    val supIn = supplier
      .join(broadcast(nation.filter(col("n_name") === nationName)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val fOrders = orders.filter(col("o_orderstatus") === "F").select("o_orderkey")
    val base = rPairs
      .join(broadcast(supIn), col("sk") === col("s_suppkey"), "left_semi")
      .join(fOrders, col("ok") === col("o_orderkey"), "left_semi")
    val others = allPairs.select(col("ok").as("ok2"), col("sk").as("sk2"))
    val rOthers = rPairs.select(col("ok").as("ok3"), col("sk").as("sk3"))
    base
      .join(others, col("ok") === col("ok2") && col("sk") =!= col("sk2"),
        "left_semi")
      .join(rOthers, col("ok") === col("ok3") && col("sk") =!= col("sk3"),
        "left_anti")
      .groupBy(col("sk").as("s_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(supplier.select(col("s_suppkey").as("sk4"), col("s_name"))),
        col("s_suppkey") === col("sk4"))
      .select("s_suppkey", "s_name", "numwait")
      .orderBy(col("numwait").desc, col("s_suppkey"))
  }

  /** TPC-H Q22-shaped sales prospects: customers with above-average
    * balances and no orders since `lapsedSince` (the canonical "never
    * ordered" is vacuous on this corpus — orders cover every custkey —
    * so the lapsed-window form keeps the identical plan shape with a
    * non-empty answer). The global average is computed in EXACT
    * integer cents (⌊bal·100+0.5⌋ floor-form, summed as longs,
    * floor-divided) so the cutoff cannot drift cross-engine; the
    * average is a 1-row broadcast cross join; the no-recent-orders
    * test is a LEFT ANTI join (never a distinct of the fact table).
    */
  def salesProspects(customer: DataFrame, orders: DataFrame,
      lapsedSince: String = "2000-01-01"): DataFrame = {
    val cents = customer.select(col("c_custkey"), col("c_nationkey"),
      floor(col("c_acctbal") * 100 + lit(0.5)).cast("long").as("bal_cents"))
    val avgCents = cents.filter(col("bal_cents") > 0)
      .agg(sum(col("bal_cents")).cast("long").as("s"), count(lit(1)).as("n"))
      // true integer floor division — a double quotient cast to long
      // can disagree with the oracle's `//` when the quotient sits
      // within an ulp of an integer
      .select(expr("s div n").as("avg_cents"))
    cents
      .crossJoin(broadcast(avgCents))
      .filter(col("bal_cents") > col("avg_cents"))
      .join(orders
          .filter(col("o_orderdate") >= to_timestamp(lit(lapsedSince)))
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_prospects"), sum(col("bal_cents")).as("total_cents"))
      .orderBy("c_nationkey")
  }

  /** ROLLUP grouping-sets pricing cube: revenue and row counts at
    * (returnflag, linestatus), per-flag subtotals, and the grand total
    * in ONE pass — Catalyst expands the grouping sets inside a single
    * partially-aggregated shuffle (Expand + one exchange), never a
    * three-way self-union that re-scans the fact table per level.
    * Subtotal rows surface as 'ALL' via coalesce (both source columns
    * are non-null, so the sentinel is unambiguous), and the measure is
    * the exact-cents contract, so every level replays bit-identically
    * in the oracle's GROUP BY ROLLUP.
    */
  def pricingRollup(lineitem: DataFrame): DataFrame =
    pricingSets(lineitem.rollup(col("l_returnflag"), col("l_linestatus")))

  /** Full CUBE over (returnflag, linestatus): the rollup's grouping
    * sets plus the (·, linestatus) marginals — same single
    * Expand+exchange plan shape, same exact-cents measure and 'ALL'
    * sentinels (one shared core so the two cannot drift); the extra
    * set rides the one shuffle for free. */
  def pricingCube(lineitem: DataFrame): DataFrame =
    pricingSets(lineitem.cube(col("l_returnflag"), col("l_linestatus")))

  private def pricingSets(
      grouped: org.apache.spark.sql.RelationalGroupedDataset): DataFrame =
    grouped
      .agg(
        sum(centsOf(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("rev_cents"),
        count(lit(1)).as("n_rows"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("rev_cents"), col("n_rows"))
      .orderBy("returnflag", "linestatus")

  /** Revenue concentration (the Pareto profile): how many top
    * customers carry ≥ `num/den` of lifetime revenue. The global
    * sort this classically needs is replaced by the mergeable
    * histogram ([[customerRfm]]'s move, DESCENDING): bin customers
    * by revenue ($10 bins), cumulate bin totals from the top, and
    * report the first crossing of cum·den ≥ total·num — customers
    * and revenue at the crossing are exact longs, the headcount
    * fraction is exact ppm. Within-bin resolution (±$10 of revenue
    * at the cut) is the honest cost of never sorting the corpus.
    * One orders scan → customer agg → bin agg; the cumulative
    * window runs over the bin histogram only.
    */
  def revenueConcentration(orders: DataFrame, num: Int = 4, den: Int = 5,
      binCents: Long = 1000L): DataFrame = {
    val bins = orders
      .groupBy(col("o_custkey"))
      .agg(sum(centsOf(col("o_totalprice"))).as("cents"))
      .select(expr(s"cents div $binCents").as("bin"), col("cents"))
      .groupBy("bin")
      .agg(count(lit(1)).as("nc"), sum(col("cents")).as("rev"))
    val cum = bins
      .withColumn("cum_rev", sum(col("rev")).over(
        Window.orderBy(col("bin").desc)))
      .withColumn("cum_nc", sum(col("nc")).over(
        Window.orderBy(col("bin").desc)))
      .withColumn("total_rev", sum(col("rev")).over(
        Window.orderBy(col("bin").desc).rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("total_nc", sum(col("nc")).over(
        Window.orderBy(col("bin").desc).rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
    cum.filter(col("cum_rev") * den >= col("total_rev") * num)
      .orderBy(col("bin").desc)
      .limit(1)
      .select(col("cum_nc").as("n_top"), col("total_nc").as("n_customers"),
        col("cum_rev").as("top_rev_cents"), col("total_rev").as("rev_cents"),
        expr("(1000000 * cum_nc) div total_nc").as("top_frac_ppm"))
  }

  /** Gini coefficient of the per-customer revenue distribution — the
    * inequality scalar next to [[revenueConcentration]]'s whale count:
    * G = (2·Σ i·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) over revenues xᵢ sorted
    * ascending with 1-based rank i, emitted as floor-ppm. Ranks are
    * (cents, custkey)-tie-broken so the rank assignment (and thus the
    * exact Σ i·xᵢ) is deterministic; the products ride DECIMAL(38,0)/
    * HUGEINT (i·x overflows a long once ~10⁹ customers meet large
    * cents — the HITS widening lesson). The global rank window runs
    * over the per-customer AGGREGATE (customer-dim-sized, ≪ the
    * orders fact); at extreme customer counts the binned
    * [[revenueConcentration]] histogram form is the mergeable
    * fallback, per its docstring.
    */
  def giniRevenue(orders: DataFrame): DataFrame = {
    val per = orders.groupBy(col("o_custkey"))
      .agg(sum(centsOf(col("o_totalprice"))).as("x"))
    per
      .withColumn("i",
        row_number().over(Window.orderBy(col("x"), col("o_custkey"))))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(x AS DECIMAL(38,0))")).as("sx"),
        sum(expr("CAST(i AS DECIMAL(38,0)) * x")).as("six"))
      .select(
        expr("CAST(n AS BIGINT) AS n_customers"),
        expr("CAST(sx AS BIGINT) AS total_cents"),
        expr("CAST((CAST(2 AS DECIMAL(38,0)) * six - (n + 1) * sx) * 1000000" +
          " div (CAST(n AS DECIMAL(38,0)) * sx) AS BIGINT) AS gini_ppm"))
  }

  /** Monthly seasonality with year-over-year growth: one orders scan
    * → (year·100+month) integer-keyed agg (exact cents), then YoY as
    * a self equi-join on ym−100 — an integer-key join, NEVER a
    * 12-step global-order lag window (which would single-partition
    * the month sequence; the month frame is small today but the
    * pattern must hold when the group key widens to (region, month)).
    * Growth is exact ppm of rev/prev_rev; months with no prior-year
    * twin report -1 (NULL-free gate columns).
    */
  def monthlyYoy(orders: DataFrame): DataFrame = {
    val m = orders
      .select(expr("cast(year(o_orderdate) * 100 + month(o_orderdate) as bigint)")
          .as("ym"),
        centsOf(col("o_totalprice")).as("cents"))
      .groupBy("ym")
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("rev_cents"))
      .localCheckpoint(true)
    m.join(m.select((col("ym") + 100).as("ym"),
        col("rev_cents").as("prev_rev_cents")), Seq("ym"), "left")
      .select(col("ym"), col("n_orders"), col("rev_cents"),
        coalesce(col("prev_rev_cents"), lit(-1L)).as("prev_rev_cents"),
        // widen through DECIMAL(38,0) (the HITS lesson): the long
        // product 10⁶·rev_cents wraps past ~$92B/month (≈ sf100) —
        // Spark would wrap silently while the oracle throws
        coalesce(expr(
          "CAST((CAST(1000000 AS DECIMAL(38,0)) * rev_cents)" +
            " div prev_rev_cents AS BIGINT)"), lit(-1L))
          .as("yoy_ppm"))
      .orderBy("ym")
  }

  /** Market-basket lift: part pairs co-occurring in the same order,
    * scored by lift = P(a,b)/(P(a)·P(b)) as the exact integer ppm
    * ⌊10⁶·n_ab·N / (n_a·n_b)⌋ — every count a long, one integer
    * division, no float anywhere. The [[graft.graph.Ranking]] co-
    * occurrence discipline applies: parts in more than `hubCap`
    * orders are dropped BEFORE the pair join (a part in every basket
    * contributes C(n,2) candidate pairs and zero signal), bounding
    * the self-join at hubCap·|parts| rows; `minPairs` then cuts the
    * long noise tail. N (distinct orders) is a 1-row broadcast
    * crossJoin. Scale: the pair join keys on the order, so baskets
    * co-partition; nothing global but the 1-row count.
    */
  def basketLift(lineitem: DataFrame, hubCap: Int = 30,
      minPairs: Int = 2): DataFrame = {
    val sp = lineitem
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("part"))
      .distinct()
      .localCheckpoint(true)
    val n = sp.select(countDistinct(col("okey")).as("n_orders"))
    val keep = sp.groupBy("part").agg(count(lit(1)).as("n_part"))
      .filter(col("n_part") <= hubCap)
    val k = sp.join(keep, Seq("part"))
    val pairs = k.as("x").join(k.as("y"),
        col("x.okey") === col("y.okey") && col("x.part") < col("y.part"))
      .groupBy(col("x.part").as("part_a"), col("y.part").as("part_b"))
      .agg(count(lit(1)).as("n_ab"),
        max(col("x.n_part")).as("n_a"), max(col("y.n_part")).as("n_b"))
      .filter(col("n_ab") >= minPairs)
    pairs.crossJoin(broadcast(n))
      .select(col("part_a"), col("part_b"), col("n_a"), col("n_b"), col("n_ab"),
        expr("(1000000 * n_ab * n_orders) div (n_a * n_b)").as("lift_ppm"))
      .orderBy("part_a", "part_b")
  }

  /** RFM customer segmentation (recency / frequency / monetary
    * quartiles) — the classic customer-value cube, built WITHOUT a
    * global-order window: a global `ntile(4)` sorts every customer in
    * ONE partition (the D14 lesson), so the quartile cuts come from
    * the mergeable histogram instead (the [[TemporalOps.quantileSketch]]
    * move): per metric, a (bin → count) frame whose cardinality is the
    * bin count, cumulative-crossed at 1/4, 2/4, 3/4 with the integer
    * inequality cum·4 ≥ n·p. A customer's score per metric is
    * 1 + #{cuts strictly below its bin} (1 = bottom quartile, 4 = top)
    * — comparing BINS, never values-to-bounds, so the tie side is
    * unambiguous and both engines replay it exactly. Metrics: last
    * order epoch-day, order count, lifetime cents (all exact longs).
    * Plan: one orders scan → per-customer agg (checkpointed — three
    * histograms + the final scoring read it), three bin-count aggs
    * whose windows run over histogram frames (≤ thousands of rows),
    * one broadcast 1-row cuts frame joined back. Scale: every shuffle
    * is customer- or bin-keyed; nothing global.
    */
  def customerRfm(orders: DataFrame, mBinCents: Long = 1000L): DataFrame = {
    val m = orders
      .groupBy(col("o_custkey").as("custkey"))
      .agg(
        max(expr("unix_millis(cast(o_orderdate as timestamp)) div 86400000"))
          .as("r_day"),
        count(lit(1)).as("n_orders"),
        sum(centsOf(col("o_totalprice"))).as("m_cents"))
      .withColumn("m_bin", expr(s"m_cents div $mBinCents"))
      .localCheckpoint(true)
    def cutsOf(bin: Column, pfx: String): DataFrame = {
      val h = m.groupBy(bin.as("bin")).agg(count(lit(1)).as("c"))
      val cum = h
        .withColumn("cum", sum(col("c")).over(Window.orderBy("bin")))
        .withColumn("n", sum(col("c")).over(
          Window.orderBy("bin").rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
      cum.agg(
        min(when(col("cum") * 4 >= col("n") * 1, col("bin"))).as(s"${pfx}1"),
        min(when(col("cum") * 4 >= col("n") * 2, col("bin"))).as(s"${pfx}2"),
        min(when(col("cum") * 4 >= col("n") * 3, col("bin"))).as(s"${pfx}3"))
    }
    val cuts = cutsOf(col("r_day"), "r").crossJoin(cutsOf(col("n_orders"), "f"))
      .crossJoin(cutsOf(col("m_bin"), "m"))
    def score(bin: Column, pfx: String): Column =
      (lit(1L) + (bin > col(s"${pfx}1")).cast("long")
        + (bin > col(s"${pfx}2")).cast("long")
        + (bin > col(s"${pfx}3")).cast("long")).as(s"${pfx}_score")
    m.crossJoin(broadcast(cuts))
      .select(col("custkey"), col("r_day"), col("n_orders"), col("m_cents"),
        score(col("r_day"), "r"), score(col("n_orders"), "f"),
        score(col("m_bin"), "m"))
      .withColumn("rfm",
        col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
      .orderBy("custkey")
  }

  /** Skyline (Pareto-frontier) over parts: every part for which no
    * other part is both cheaper-or-equal AND larger-or-equal with at
    * least one strict — minimize retail price, maximize size. The
    * naive plan is an O(n²) dominance self-join; this one is the
    * classic distributed two-phase prune:
    *
    *  1. Bucket price into fixed-width cents bands; per-bucket max
    *     size is a ≤-#buckets-row frame whose PREFIX max over
    *     strictly-lower buckets (lower bucket ⇒ strictly lower cents,
    *     since `div` is monotone) is a certificate of dominance —
    *     any part at or below that prefix max is dominated by some
    *     cheaper part. The certificate frame is tiny → broadcast;
    *     survivors are ~the frontier's neighborhood, not the corpus.
    *  2. Exact dominance test on the survivors only, via two RANGE
    *     windows over price cents: dominated ⟺ max size over
    *     strictly-cheaper rows ≥ size, OR max size over
    *     cheaper-or-equal rows > size (the second catches equal-price
    *     strictly-larger; exact duplicates stay mutually undominated,
    *     per the standard skyline definition). The global-order
    *     window runs over the PRUNED set — thousands of rows at any
    *     corpus scale, so the single-partition sort is safe.
    */
  def skyline(part: DataFrame, bucketCents: Long = 100000L): DataFrame = {
    val p = part.select(col("p_partkey"), col("p_size").cast("long").as("size"),
        centsOf(col("p_retailprice")).as("price_cents"))
      .withColumn("bucket", expr(s"price_cents div $bucketCents"))
    val certs = p.groupBy("bucket").agg(max(col("size")).as("bmax"))
      .withColumn("lower_max",
        max(col("bmax")).over(Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("bucket"), coalesce(col("lower_max"), lit(-1L)).as("lower_max"))
    val survivors = p.join(broadcast(certs), "bucket")
      .filter(col("size") > col("lower_max"))
    val below = Window.orderBy("price_cents")
      .rangeBetween(Window.unboundedPreceding, -1)
    val atOrBelow = Window.orderBy("price_cents")
      .rangeBetween(Window.unboundedPreceding, 0)
    survivors
      .withColumn("m_lt", max(col("size")).over(below))
      .withColumn("m_le", max(col("size")).over(atOrBelow))
      .filter((col("m_lt").isNull || col("m_lt") < col("size")) &&
        !(col("m_le") > col("size")))
      .select(col("p_partkey"), col("price_cents"), col("size"))
      .orderBy("price_cents", "p_partkey")
  }

  /** Data-quality profile of the lineitem fact: per numeric column,
    * row/null/distinct counts and integer min/max (money in cents,
    * dates in epoch days) — the ingest-validation sweep a pipeline
    * runs before training jobs trust a drop. One agg SUBTREE per
    * column (a multi-distinct agg would plan an Expand that pushes
    * 9× the scan through one hash aggregate): each subtree scans ONE
    * parquet column — columnar pruning makes 8 one-column scans ≈
    * one 8-column scan — and the partial-distinct stages run in
    * parallel within the same job DAG (measured ~2× at sf0.1 vs the
    * Expand form). The per-column unpivot happens on the crossJoined
    * 1-row aggregates via `stack`.
    */
  def tableProfile(lineitem: DataFrame): DataFrame = {
    val cols: Seq[(String, Column)] = Seq(
      "l_orderkey" -> col("l_orderkey"),
      "l_partkey" -> col("l_partkey"),
      "l_suppkey" -> col("l_suppkey"),
      "l_linenumber" -> col("l_linenumber").cast("long"),
      "l_quantity" -> qtyLong(col("l_quantity")),
      "l_extendedprice" -> centsOf(col("l_extendedprice")),
      "l_discount" -> centsOf(col("l_discount")),
      "l_shipdate" -> expr("unix_millis(cast(l_shipdate as timestamp)) div 86400000"))
    // one agg SUBTREE per column, crossJoined: 8 DISTINCT aggregates
    // in a single agg would plan an Expand (9× the scan through one
    // hash aggregate); separate subtrees each scan ONE parquet column
    // (columnar pruning makes 8 one-column scans ≈ one 8-column scan)
    // and run their partial-distinct stages in parallel within the
    // same job DAG (measured ~2× at sf0.1)
    val subs = cols.map { case (n, c) =>
      lineitem.agg(count(c).as(s"cnt_$n"), countDistinct(c).as(s"nd_$n"),
        min(c).as(s"min_$n"), max(c).as(s"max_$n"))
    } :+ lineitem.agg(count(lit(1)).as("n_rows"))
    val one = subs.reduce(_ crossJoin _)
    val stacked = cols.map { case (n, _) =>
      s"'$n', n_rows - cnt_$n, nd_$n, min_$n, max_$n"
    }.mkString(", ")
    one.select(expr(
        s"stack(${cols.size}, $stacked) as " +
          "(column_name, n_null, n_distinct, min_val, max_val)"))
      .select(col("column_name"), col("n_null").cast("long").as("n_null"),
        col("n_distinct"), col("min_val").cast("long").as("min_val"),
        col("max_val").cast("long").as("max_val"))
      .orderBy("column_name")
  }

  /** Pearson correlation matrix over the lineitem measures — the
    * "what drives what" screen (quantity vs discount vs revenue) run
    * before trusting any per-dimension aggregate as a driver metric.
    * All five moment sums (n, Σx, Σy, Σx², Σy², Σxy) accumulate as
    * EXACT DECIMAL(38,0) integers over cents/centi-units in ONE
    * map-combinable scan; only the final r = (nΣxy−ΣxΣy)/√(...)
    * crosses into doubles (deterministic IEEE conversion of exact
    * sums, the shared floor-ppm round). Three pairs = one 1-row agg
    * with 12 columns, stacked. */
  def measureCorrelation(lineitem: DataFrame): DataFrame = {
    val base = lineitem.select(
      qtyLong(col("l_quantity")).as("q"),
      centsOf(col("l_discount")).as("d"),
      centsOf(col("l_extendedprice")).as("p"))
    def mom(x: String, y: String, tag: String) = Seq(
      sum(col(x).cast("decimal(38,0)")).as(s"sx_$tag"),
      sum(col(y).cast("decimal(38,0)")).as(s"sy_$tag"),
      sum((col(x).cast("decimal(38,0)") * col(x))).as(s"sxx_$tag"),
      sum((col(y).cast("decimal(38,0)") * col(y))).as(s"syy_$tag"),
      sum((col(x).cast("decimal(38,0)") * col(y))).as(s"sxy_$tag"))
    val aggs = count(lit(1)).as("n") +:
      (mom("q", "d", "qd") ++ mom("q", "p", "qp") ++ mom("d", "p", "dp"))
    val one = base.agg(aggs.head, aggs.tail: _*).localCheckpoint(true)
    def corr(tag: String) = expr(
      s"""CAST(CASE WHEN (CAST(n AS DOUBLE) * sxx_$tag - CAST(sx_$tag AS DOUBLE) * sx_$tag) *
           (CAST(n AS DOUBLE) * syy_$tag - CAST(sy_$tag AS DOUBLE) * sy_$tag) <= 0 THEN 0
         ELSE floor((CAST(n AS DOUBLE) * sxy_$tag - CAST(sx_$tag AS DOUBLE) * sy_$tag)
           / sqrt((CAST(n AS DOUBLE) * sxx_$tag - CAST(sx_$tag AS DOUBLE) * sx_$tag)
                * (CAST(n AS DOUBLE) * syy_$tag - CAST(sy_$tag AS DOUBLE) * sy_$tag))
           * 1000000 + 0.5) END AS BIGINT)""")
    one.select(col("n"), corr("qd").as("c_qd"), corr("qp").as("c_qp"),
        corr("dp").as("c_dp"))
      .select(expr("""stack(3, 'quantity_discount', c_qd,
          'quantity_price', c_qp, 'discount_price', c_dp)
          as (pair, corr_ppm)"""), col("n"))
      .select(col("pair"), col("n"), col("corr_ppm"))
      .orderBy("pair")
  }

  /** Order-independent table content checksum — the migration/replica
    * validation primitive (exactly what certifies a 100 TB copy:
    * row counts can match while contents drifted). Each row folds to
    * a canonical '|'-joined string of INTEGER-OR-TEXT fields only
    * (money as exact cents, timestamps as epoch ms — float/calendar
    * formatting can never leak in), hashes through md5, and the top
    * 48 bits sum commutatively so partitions combine map-side in any
    * order; the sum rides DECIMAL(38,0) and is folded mod 2⁶¹−1 so
    * the emitted BIGINT can't wrap at any row count. One scan, one
    * 1-row agg — trivially parallel, no shuffle beyond the final
    * combine. */
  def tableChecksum(orders: DataFrame): DataFrame =
    orders
      .select(concat_ws("|",
        col("o_orderkey").cast("string"), col("o_custkey").cast("string"),
        col("o_orderstatus"),
        centsOf(col("o_totalprice")).cast("string"),
        unix_millis(col("o_orderdate").cast("timestamp")).cast("string"),
        col("o_orderpriority")).as("row_str"))
      .select(expr("CAST(conv(substr(md5(row_str), 1, 12), 16, 10) AS DECIMAL(38,0))")
        .as("h"))
      .agg(count(lit(1)).as("n_rows"),
        expr("CAST(sum(h) % CAST(2305843009213693951 AS DECIMAL(38,0)) AS BIGINT)")
          .as("checksum61"))
}
