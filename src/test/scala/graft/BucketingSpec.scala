package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Bucketing

/** The co-located-join contract: bucketed+sorted tables join with no
  * exchange and no sort — the write-once/join-free-forever layout
  * (SURVEY §2 E64).
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)

  test("bucketed tables join without exchange or sort; values correct") {
    import spark.implicits._
    val left = (1L to 1000L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (500L to 1500L).map(i => (i, i * 2)).toDF("k", "rv")
    Bucketing.saveBucketed(left, "bkt_left_spec", "k", 4)
    Bucketing.saveBucketed(right, "bkt_right_spec", "k", 4)
    // force the sort-merge path: a broadcast join would hide the
    // bucket co-location this spec exists to prove
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = Bucketing.bucketedJoin(spark, "bkt_left_spec", "bkt_right_spec", "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"not a merge join:\n$plan")
      // THE bucketing contract: no exchange on either side. (A
      // bucket-local Sort remains — Spark >= 3 derives no ordering
      // from bucket files — and is linear and shuffle-free.)
      assert(!plan.contains("Exchange"),
        s"bucket co-location lost — plan still shuffles:\n$plan")
      assert(plan.contains("SelectedBucketsCount"),
        s"scan is not bucket-aware:\n$plan")
      val rows = j.count()
      assert(rows == 501L, s"join lost rows: $rows")
      val spot = j.filter($"k" === 700L).collect()
      assert(spot.length == 1 && spot(0).getString(1) == "l700" &&
        spot(0).getLong(2) == 1400L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      spark.sql("DROP TABLE IF EXISTS bkt_left_spec")
      spark.sql("DROP TABLE IF EXISTS bkt_right_spec")
    }
  }

  test("bucket-local aggregation on the bucket key skips the exchange") {
    import spark.implicits._
    val t = (1L to 2000L).map(i => (i % 97, i)).toDF("k", "v")
    Bucketing.saveBucketed(t, "bkt_agg_spec", "k", 4)
    try {
      val agg = spark.table("bkt_agg_spec").groupBy("k").count()
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"groupBy on the bucket key must be bucket-local:\n$plan")
      assert(agg.count() == 97L)
    } finally spark.sql("DROP TABLE IF EXISTS bkt_agg_spec")
  }
}
