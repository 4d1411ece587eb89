package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.floor

/** THE cross-engine decimal rounding: ⌊x·10ˢ+0.5⌋/10ˢ as single IEEE
  * ops, replayed verbatim by the DuckDB oracles. Engine-native `round`
  * is NOT cross-engine safe — Spark rounds the double's shortest
  * decimal string (HALF_UP on the decimal) while DuckDB rounds the
  * binary value half-away-from-zero; on an exact half boundary they
  * disagree by one last-place decimal. Sums of many terms essentially
  * never land on a boundary (the `round(sum(...))` aggregates across
  * the query surface are safe in practice and four rounds of gates
  * back that up), but RATIOS of small integers and single divides do —
  * every derived ratio/score in the library routes through here.
  */
object Rounding {
  def rnd(c: Column, s: Int): Column = {
    val f = math.pow(10, s.toDouble)
    floor(c * f + 0.5) / f
  }
}
