package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2 D12).
  *
  * Media assets ride through the pipeline as opaque `binary` columns
  * plus typed metadata; the decode / feature-extract step runs
  * batched inside `mapPartitions` (the Scala analogue of a
  * `mapInPandas` batch UDF): one partition = one decoder instance =
  * amortized setup, no per-row JNI churn, and the per-partition
  * iterator is consumed lazily so memory stays one row's payload deep.
  *
  * The DECODER IS REAL: it sniffs container magic bytes and parses
  * actual headers — PNG IHDR width/height (big-endian, offset 16/20),
  * JPEG SOF0 dimensions (marker scan), WAV fmt-chunk channels/sample
  * rate (little-endian) — no codec libraries needed, exactly how a
  * production ingest probes media before shipping bytes to a GPU
  * decode stage. Payload synthesis (this container has no real media
  * files) builds genuine container bytes — PNG with CRC'd chunks,
  * JPEG SOI/SOF0/EOI, canonical 44-byte WAV header + PCM data — whose
  * header fields derive deterministically from doc_id so the DuckDB
  * oracle can replay the expected metadata arithmetically while Spark
  * round-trips it through real bytes.
  */
object Multimodal {

  /** Decoded media metadata (the "feature extraction" output).
    * Images carry -1 sample_rate/channels; audio carries -1 w/h. */
  case class MediaMeta(doc_id: Long, format: String, width: Long, height: Long,
      sample_rate: Long, channels: Long, byte_len: Long)

  case class RawMedia(doc_id: Long, payload: Array[Byte])

  // ---- payload synthesis (deterministic per doc_id) ---------------------

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be16(v: Long): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def pngChunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val crc = new java.util.zip.CRC32()
    val tagB = tag.getBytes("US-ASCII")
    crc.update(tagB); crc.update(data)
    be32(data.length.toLong) ++ tagB ++ data ++ be32(crc.getValue)
  }

  /** 45-byte PNG: signature + IHDR(w, h, 8-bit RGB) + IEND. */
  private def pngBytes(w: Long, h: Long): Array[Byte] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdr = be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0)
    sig ++ pngChunk("IHDR", ihdr) ++ pngChunk("IEND", Array.empty)
  }

  /** 23-byte JPEG: SOI + SOF0(precision 8, h, w, 3 components) + EOI. */
  private def jpegBytes(w: Long, h: Long): Array[Byte] = {
    val sof0 = Array(0xff, 0xc0).map(_.toByte) ++ be16(17) ++ Array[Byte](8) ++
      be16(h) ++ be16(w) ++ Array[Byte](3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1)
    Array(0xff, 0xd8).map(_.toByte) ++ sof0 ++ Array(0xff, 0xd9).map(_.toByte)
  }

  /** Canonical 44-byte WAV header + zeroed 16-bit PCM frames. */
  private def wavBytes(sampleRate: Long, channels: Long, nSamples: Long): Array[Byte] = {
    val dataLen = nSamples * channels * 2
    "RIFF".getBytes("US-ASCII") ++ le32(36 + dataLen) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(sampleRate) ++ le32(sampleRate * channels * 2) ++
      le16(channels * 2) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le32(dataLen) ++
      Array.fill(dataLen.toInt)(0: Byte)
  }

  /** Synthesized payload for a doc id: format and header fields are
    * pure functions of the id (replayed by the oracle), bytes are a
    * real container. */
  def synthesizePayload(docId: Long): Array[Byte] = (docId % 3) match {
    case 0 => pngBytes(docId % 509 + 16, (docId * 7) % 509 + 16)
    case 1 => jpegBytes(docId % 509 + 16, (docId * 7) % 509 + 16)
    case _ => wavBytes(8000L * (docId % 5 + 1), docId % 2 + 1, docId % 1000 + 1)
  }

  /** 14-byte GIF87a: signature + LE16 logical-screen w/h + screen
    * descriptor + trailer. */
  private def gifBytes(w: Long, h: Long): Array[Byte] =
    "GIF87a".getBytes("US-ASCII") ++ le16(w) ++ le16(h) ++
      Array[Byte](0x00, 0x00, 0x00, 0x3b.toByte)

  /** 54-byte BMP: BITMAPFILEHEADER + BITMAPINFOHEADER (24bpp, no
    * pixel array — header-only asset, the decode probe's concern). */
  private def bmpBytes(w: Long, h: Long): Array[Byte] =
    "BM".getBytes("US-ASCII") ++ le32(54) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
      le32(0) ++ le32(0) ++ le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0)

  /** The LEGACY-format synthesis class (GIF87a / BMP / PNG) — a
    * second corpus slice exercising the decoder's little-endian
    * image paths; header fields again pure functions of the id. */
  def synthesizeLegacyPayload(docId: Long): Array[Byte] = (docId % 3) match {
    case 0 => gifBytes(docId % 509 + 16, (docId * 11) % 509 + 16)
    case 1 => bmpBytes(docId % 509 + 16, (docId * 11) % 509 + 16)
    case _ => pngBytes(docId % 509 + 16, (docId * 11) % 509 + 16)
  }

  // ---- the decoder (reads ONLY the bytes) -------------------------------

  private def u8(b: Array[Byte], i: Int): Long = b(i) & 0xffL
  private def rdBe32(b: Array[Byte], i: Int): Long =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def rdBe16(b: Array[Byte], i: Int): Long = (u8(b, i) << 8) | u8(b, i + 1)
  private def rdLe32(b: Array[Byte], i: Int): Long =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
  private def rdLe16(b: Array[Byte], i: Int): Long = u8(b, i) | (u8(b, i + 1) << 8)

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toLong)

  /** Magic-byte sniff + header parse. Unknown/corrupt payloads come
    * back as format "unknown" with -1 fields rather than throwing —
    * a 100 TB ingest must quarantine, not crash. */
  def decode(m: RawMedia): MediaMeta = {
    val b = m.payload
    val len = b.length.toLong
    def img(fmt: String, w: Long, h: Long) =
      MediaMeta(m.doc_id, fmt, w, h, -1L, -1L, len)
    if (b.length >= 24 && PngSig.indices.forall(i => u8(b, i) == PngSig(i)))
      img("png", rdBe32(b, 16), rdBe32(b, 20))
    else if (b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8) {
      // marker scan for SOF0..SOF3 (baseline/progressive dimensions).
      // Spec-legal quirks handled: 0xFF fill bytes before a marker
      // (ISO 10918 B.1.1.2), standalone markers with no length field
      // (TEM, RSTn, SOI), and a SOF segment ending flush at the
      // payload end.
      var i = 2
      var out: MediaMeta = MediaMeta(m.doc_id, "unknown", -1L, -1L, -1L, -1L, len)
      var done = false
      while (!done && i + 1 < b.length) {
        if (u8(b, i) != 0xff) { done = true }
        else {
          val marker = u8(b, i + 1)
          if (marker == 0xff) i += 1 // fill byte
          else if (marker >= 0xc0 && marker <= 0xc3) {
            if (i + 8 < b.length)
              out = img("jpeg", rdBe16(b, i + 7), rdBe16(b, i + 5))
            done = true
          } else if (marker == 0xd9) done = true // EOI
          else if (marker == 0x01 || marker == 0xd8 ||
              (marker >= 0xd0 && marker <= 0xd7)) i += 2 // standalone
          else if (i + 3 < b.length) i += 2 + rdBe16(b, i + 2).toInt
          else done = true
        }
      }
      out
    } else if (b.length >= 44 &&
        new String(b.slice(0, 4), "US-ASCII") == "RIFF" &&
        new String(b.slice(8, 12), "US-ASCII") == "WAVE")
      MediaMeta(m.doc_id, "wav", -1L, -1L, rdLe32(b, 24), rdLe16(b, 22), len)
    else if (b.length >= 10 && (
        new String(b.slice(0, 6), "US-ASCII") == "GIF87a" ||
        new String(b.slice(0, 6), "US-ASCII") == "GIF89a"))
      img("gif", rdLe16(b, 6), rdLe16(b, 8))
    else if (b.length >= 26 && u8(b, 0) == 'B'.toLong && u8(b, 1) == 'M'.toLong)
      img("bmp", rdLe32(b, 18), rdLe32(b, 22))
    else MediaMeta(m.doc_id, "unknown", -1L, -1L, -1L, -1L, len)
  }

  /** Attach the synthesized binary payload column — the ingest shape
    * of a multimodal table (in production this is the raw media bytes
    * column read from the lake). */
  def withPayload(spark: SparkSession, docs: DataFrame): Dataset[RawMedia] = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long").as("doc_id")).as[Long]
      .mapPartitions(_.map(id => RawMedia(id, synthesizePayload(id))))
  }

  /** Batched decode over partitions: the per-partition iterator is
    * consumed lazily, so memory stays one batch deep regardless of
    * partition size. */
  def decodeMeta(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    withPayload(spark, docs).mapPartitions { it =>
      // one decoder instance per partition would be initialized here
      it.map(decode)
    }
  }

  /** Driver-contract query: decoded metadata, ordered. */
  def mediaMeta(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeMeta(spark, docs).toDF().orderBy("doc_id")

  /** Decoded metadata over the LEGACY-format corpus slice
    * ([[synthesizeLegacyPayload]]): exercises the GIF87a and BMP
    * little-endian header paths end-to-end through real container
    * bytes, same plan shape as [[mediaMeta]]. */
  def mediaMetaLegacy(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long").as("doc_id")).as[Long]
      .mapPartitions(_.map(id => decode(RawMedia(id, synthesizeLegacyPayload(id)))))
      .toDF().orderBy("doc_id")
  }

  /** Per-format corpus profile over the DECODED headers (the ingest
    * dashboard a multimodal pipeline watches): counts, byte volume,
    * and integer-floor mean dimensions/rates. Absent fields are the
    * decoder's −1 sentinel uniformly across a format, so their means
    * stay exactly −1 — no NULL arithmetic, no conditional schema.
    * One narrow |formats|-row aggregation after the mapPartitions
    * decode; at scale this is the same single pass the decode itself
    * costs. */
  def mediaStats(spark: SparkSession, docs: DataFrame): DataFrame = {
    decodeMeta(spark, docs).toDF()
      .groupBy("format")
      .agg(count(lit(1)).as("n"),
        sum(col("byte_len")).as("total_bytes"),
        sum(col("width")).as("_sw"), sum(col("height")).as("_sh"),
        sum(col("sample_rate")).as("_sr"), sum(col("channels")).as("_sc"))
      .select(col("format"), col("n"), col("total_bytes"),
        expr("_sw div n").as("avg_width"), expr("_sh div n").as("avg_height"),
        expr("_sr div n").as("avg_rate"), expr("_sc div n").as("avg_channels"))
      .orderBy("format")
  }

  /** Rank-selected payload-size percentiles per format — the
    * storage-planning profile of a multimodal ingest (row-group
    * sizing, CDN cache tiers). Median = the ⌊(n+1)/2⌋-th and p90 =
    * the ⌈9n/10⌉-th smallest byte_len, ties broken by doc_id (the
    * events_mad selection discipline: never interpolation, so the
    * engines' percentile contracts never meet). One decode pass +
    * one per-format window over the meta frame. */
  def sizeProfile(spark: SparkSession, docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("format").orderBy(col("byte_len"), col("doc_id"))
    decodeMeta(spark, docs).toDF()
      .select(col("format"), col("doc_id"), col("byte_len"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("format")))
      .groupBy("format")
      .agg(max("n").cast("long").as("n"),
        min("byte_len").as("min_bytes"), max("byte_len").as("max_bytes"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("byte_len")))
          .as("med_bytes"),
        max(when(col("rn") === expr("(9 * n + 9) div 10"), col("byte_len")))
          .as("p90_bytes"))
      .orderBy("format")
  }

  /** BYTE-LEVEL exact dedup over the binary payload column — the
    * asset-dedup step a multimodal ingest runs before any decode
    * (identical files are the dominant duplicate class in crawled
    * media). Spark groups on md5 of the REAL container bytes (one
    * shuffle on a uniform 128-bit key, the [[graft.pipeline.Dedup]]
    * D1 shape); the digest itself never reaches the output, so the
    * DuckDB oracle can replay the grouping from the arithmetic
    * equivalence classes the payload synthesis guarantees (two
    * payloads are byte-equal iff (format, header params) match).
    * Returns (canonical_id, n_copies, byte_len) per distinct payload.
    */
  /** Image aspect-ratio histogram over the decoded headers: bucket =
    * ⌊100·width/height⌋ (integer aspect percent), images only —
    * the resize/crop planning profile a vision-training pipeline
    * reads before choosing target shapes. One narrow agg after the
    * decode pass; audio rows (−1 dims) are excluded by the
    * width/height guard. */
  def aspectProfile(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeMeta(spark, docs).toDF()
      .filter(col("width") > 0 && col("height") > 0)
      .select(expr("(100 * width) div height").as("aspect_pct"), col("width"))
      .groupBy("aspect_pct")
      .agg(count(lit(1)).as("n_images"),
        min(col("width")).as("min_w"), max(col("width")).as("max_w"))
      .orderBy("aspect_pct")

  def payloadDedup(spark: SparkSession, docs: DataFrame): DataFrame =
    withPayload(spark, docs).toDF()
      .groupBy(md5(col("payload")).as("_h"))
      .agg(min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("n_copies"),
        min(length(col("payload"))).cast("long").as("byte_len"))
      .select(col("canonical_id"), col("n_copies"), col("byte_len"))
      .orderBy("canonical_id")

  /** Byte-shingle NEAR-dup over binary payloads: candidate pairs from
    * shared 8-byte shingles (1-byte stride over the hex encoding),
    * verified by exact shingle-set Jaccard — the binary analogue of
    * the n-gram text path (Dedup D4b), for catching re-encoded or
    * header-patched copies of the same asset. Shingles with corpus
    * df > `dfCap` never propose pairs (every PNG shares the
    * signature shingle — the frequent-token cut keeps boilerplate
    * from quadratic blowup, exactly the containment-join defense).
    * Not SQL-replayable (the oracle cannot construct CRC-bearing
    * container bytes), so this operator is spec-gated instead.
    */
  def payloadNearDup(spark: SparkSession, docs: DataFrame,
      minJaccardPpm: Long = 300000L, dfCap: Int = 200): DataFrame = {
    val hx = withPayload(spark, docs).toDF()
      .select(col("doc_id"), hex(col("payload")).as("hx"))
    val sh = hx
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, greatest(length(hx) - 15, 1), 2)," +
          " i -> substring(hx, i, 16))")).as("sh"))
      .distinct()
      .localCheckpoint(true)
    val rare = sh.join(
      sh.groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df") <= dfCap).select("sh"),
      Seq("sh"), "left_semi")
    val cand = rare.as("x").join(rare.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val arrs = sh.groupBy("doc_id")
      .agg(sort_array(collect_list(col("sh"))).as("arr"),
        count(lit(1)).as("n_sh"))
    cand
      .join(arrs.select(col("doc_id").as("doc_a"), col("arr").as("arr_a"),
        col("n_sh").as("na")), "doc_a")
      .join(arrs.select(col("doc_id").as("doc_b"), col("arr").as("arr_b"),
        col("n_sh").as("nb")), "doc_b")
      .withColumn("inter",
        size(array_intersect(col("arr_a"), col("arr_b"))).cast("long"))
      .withColumn("jaccard_ppm", expr(
        "(1000000 * inter) div (na + nb - inter)"))
      .filter(col("jaccard_ppm") >= minJaccardPpm)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("jaccard_ppm"))
      .orderBy("doc_a", "doc_b")
  }
}
