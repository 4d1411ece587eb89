package graft.queries

import org.apache.spark.sql.DataFrame
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
  def pricingSummary(lineitem: DataFrame, cutoff: String = "1998-09-02"): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= to_timestamp(lit(cutoff)))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
            (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

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
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
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
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
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
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
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
}
