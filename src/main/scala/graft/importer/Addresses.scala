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

  /** Hex string (any length; only the last 16 digits are significant,
    * i.e. value mod 2⁶⁴) → the signed-long BIT PATTERN of the u64.
    * Parsing the two 32-bit halves separately sidesteps the
    * `conv(...).cast('long')` overflow that nulls every address ≥ 2⁶³
    * (kernel/high-half addresses like 0xffffffff81000000) — the
    * reference parses the full u64 range (utils/uid.rs parse_address).
    */
  private def hexToLong(h: Column): Column = {
    val t16 = lpad(when(length(h) > 16, substring(h, -16, 16)).otherwise(h), 16, "0")
    val hi = conv(substring(t16, 1, 8), 16, 10).cast("long")
    val lo = conv(substring(t16, 9, 8), 16, 10).cast("long")
    shiftleft(hi, 32) + lo // low 32 bits of hi<<32 are zero → + ≡ bitwise or
  }

  /** Parse an address string to the u64 bit pattern in a long (null
    * when unparseable). Decimal input is converted through hex so the
    * full unsigned range survives. */
  def parseAddress(c: Column): Column = {
    val t = lower(trim(c))
    val noPrefix = regexp_replace(t, "^0x", "")
    when(t.rlike("^0x[0-9a-f]+$"), hexToLong(noPrefix))
      .when(t.rlike("^[0-9a-f]*[a-f][0-9a-f]*$"), hexToLong(t))
      .when(t.rlike("^[0-9]+$"), hexToLong(lower(conv(t, 10, 16))))
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
