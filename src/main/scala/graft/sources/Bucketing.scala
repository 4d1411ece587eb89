package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed parquet storage — the co-located-join primitive: two
  * tables bucketed on the same key with the same bucket count join
  * WITHOUT a shuffle exchange, because every bucket i of one table
  * can only match bucket i of the other. At 100 TB this converts the
  * dominant cost of a fact-fact join (two full-table exchanges) into
  * a scan-side merge — the bucket layout is paid ONCE at write time
  * and amortized over every subsequent join, aggregation
  * (bucket-local partial groupBy on the key), and point lookup
  * (bucket pruning) against the table.
  *
  * The join plan keeps a per-bucket SORT on each side: Spark ≥ 3
  * does not derive output ordering from bucket files (a bucket can
  * span files, each sorted only internally), so SortMergeJoin
  * re-sorts bucket-locally — a linear, in-memory, shuffle-free pass,
  * NOT the O(table) exchange bucketing exists to kill. BucketingSpec
  * pins exactly that contract: SortMergeJoin present, Exchange
  * absent.
  *
  * Spark's bucketing rides the session catalog (`saveAsTable`), so
  * tables land under spark.sql.warehouse.dir.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted parquet table. `buckets` should
    * be sized so one bucket of the LARGER table fits an executor's
    * memory at the target scale (the shuffle-partition sizing rule
    * applied at write time). */
  def saveBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    // pre-partition on the bucket key (bucket hash ≡ repartition
    // hash): each writer task owns whole buckets → one file per
    // bucket per job, not writers×buckets small files
    df.repartition(buckets, df(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Inner-join two same-key same-count bucketed tables on their
    * bucket key. With both sides bucketed the physical plan is a
    * SortMergeJoin with NO Exchange on either side (the bucket-local
    * re-sort remains — see the object doc). */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
