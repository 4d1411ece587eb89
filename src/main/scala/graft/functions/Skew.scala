package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for joins whose key distribution is
  * heavy-tailed (hot shingles, hot call-graph nodes, celebrity
  * users). AQE's skew-join handles sort-merge cases adaptively; this
  * explicit salting is for when the skewed side must hash-join or
  * the skew is known up front — the classic pre-AQE technique, still
  * the right tool when one key is orders of magnitude hot.
  */
object Skew {

  /** Inner-join `big ⋈ small` on `key`, salting the big side into
    * `factor` subkeys and replicating the small side `factor`× —
    * result is identical to `big.join(small, key)` but the shuffle
    * spreads each hot key over `factor` reducers.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      factor: Int = 16): DataFrame = {
    val salted = big.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(factor)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
