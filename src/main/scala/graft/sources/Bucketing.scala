package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed parquet storage — the co-located-join primitive: two
  * tables bucketed (and sorted) on the same key with the same bucket
  * count join WITHOUT a shuffle exchange or a sort, because every
  * bucket i of one table can only match bucket i of the other and
  * both arrive pre-sorted. At 100 TB this converts the dominant cost
  * of a fact-fact join (two full-table exchanges) into a pure
  * scan-side merge — the bucket layout is paid ONCE at write time
  * and amortized over every subsequent join, aggregation
  * (bucket-local partial groupBy on the key), and point lookup
  * (bucket pruning) against the table.
  *
  * Spark's bucketing rides the session catalog (`saveAsTable`), so
  * tables land under spark.sql.warehouse.dir; `bucketedJoin` is the
  * read path that proves the contract (BucketingSpec pins the
  * exchange-free, sort-free plan).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted parquet table. `buckets` should
    * be sized so one bucket of the LARGER table fits an executor's
    * memory at the target scale (the shuffle-partition sizing rule
    * applied at write time). */
  def saveBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Inner-join two same-key same-count bucketed tables on their
    * bucket key. With both sides bucketed and sorted the physical
    * plan is a SortMergeJoin with NEITHER an Exchange NOR a Sort on
    * either side — the property BucketingSpec asserts. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
