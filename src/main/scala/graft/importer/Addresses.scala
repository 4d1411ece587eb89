package graft.importer

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Address parsing/normalization as native Catalyst expressions —
  * the set-oriented twin of the reference's per-string helpers
  * (utils/uid.rs:8-46 `parse_address` / `normalize_address`): `0x`
  * prefix → hex; any hex letter → hex; all digits → decimal; other
  * hex-ish → hex; else null. No UDFs, fully codegen'd, so address
  * resolution over billions of call rows stays in whole-stage codegen.
  */
object Addresses {

  /** Parse an address string to a long (null when unparseable). */
  def parseAddress(c: Column): Column = {
    val t = lower(trim(c))
    val noPrefix = regexp_replace(t, "^0x", "")
    when(t.rlike("^0x[0-9a-f]+$"), conv(noPrefix, 16, 10).cast("long"))
      .when(t.rlike("^[0-9a-f]*[a-f][0-9a-f]*$"), conv(t, 16, 10).cast("long"))
      .when(t.rlike("^[0-9]+$"), t.cast("long"))
      .otherwise(lit(null).cast("long"))
  }

  /** Canonical `0x…` lowercase form, e.g. "0X00001000" → "0x1000". */
  def normalizeAddress(c: Column): Column = {
    val parsed = parseAddress(c)
    when(parsed.isNotNull, concat(lit("0x"), lower(hex(parsed))))
      .otherwise(lit(null).cast("string"))
  }

  /** Format a numeric address as canonical hex. */
  def formatAddress(c: Column): Column = concat(lit("0x"), lower(hex(c)))

  /** Normalize a literal address string (query-parameter form). */
  def normalizeAddressLit(s: String): Column = normalizeAddress(lit(s))
}
