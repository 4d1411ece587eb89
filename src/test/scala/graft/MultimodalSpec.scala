package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Multimodal
import graft.pipeline.Multimodal.RawMedia

/** The multimodal decoder is a REAL header parser: these tests build
  * container bytes and check the decoder recovers the header fields
  * from the bytes alone (and quarantines garbage instead of throwing).
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)

  test("PNG IHDR round-trip: width/height parsed from big-endian header") {
    val m = Multimodal.decode(RawMedia(3L, Multimodal.synthesizePayload(3L)))
    assert(m.format == "png")
    assert(m.width == 3L % 509 + 16 && m.height == (3L * 7) % 509 + 16)
    assert(m.sample_rate == -1L && m.channels == -1L)
    assert(m.byte_len == 45L)
  }

  test("JPEG SOF0 marker scan recovers dimensions") {
    val m = Multimodal.decode(RawMedia(7L, Multimodal.synthesizePayload(7L)))
    assert(m.format == "jpeg")
    assert(m.width == 7L % 509 + 16 && m.height == (7L * 7) % 509 + 16)
    assert(m.byte_len == 23L)
  }

  test("WAV fmt chunk: little-endian sample rate and channels") {
    val id = 5L // 5 % 3 == 2 -> wav
    val m = Multimodal.decode(RawMedia(id, Multimodal.synthesizePayload(id)))
    assert(m.format == "wav")
    assert(m.sample_rate == 8000L * (id % 5 + 1))
    assert(m.channels == id % 2 + 1)
    assert(m.width == -1L && m.height == -1L)
    assert(m.byte_len == 44L + (id % 1000 + 1) * (id % 2 + 1) * 2)
  }

  test("JPEG with fill bytes, standalone markers, and SOF at payload end still decodes") {
    def be16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val sof0 = Array(0xff, 0xc0).map(_.toByte) ++ be16(17) ++ Array[Byte](8) ++
      be16(99) ++ be16(42) ++ Array[Byte](3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1)
    // SOI + fill bytes + APP0 segment + RST0 standalone + fills + SOF0, no EOI
    val app0 = Array(0xff, 0xe0).map(_.toByte) ++ be16(4) ++ Array[Byte](1, 2)
    val payload = Array(0xff, 0xd8).map(_.toByte) ++
      Array(0xff.toByte) ++ // fill before APP0 (ISO 10918 B.1.1.2)
      app0 ++
      Array(0xff, 0xd0).map(_.toByte) ++ // standalone RST0, no length
      Array(0xff.toByte, 0xff.toByte) ++ // two fills
      sof0 // ends flush at the payload end
    val m = Multimodal.decode(RawMedia(0L, payload))
    assert(m.format == "jpeg" && m.width == 42L && m.height == 99L)
  }

  test("garbage bytes quarantine as 'unknown', never throw") {
    val cases = Seq(
      Array.empty[Byte],
      Array[Byte](1, 2, 3),
      "RIFFxxxxJUNK".getBytes("US-ASCII"),                  // RIFF but not WAVE
      Array(0xff, 0xd8, 0x00).map(_.toByte),               // truncated JPEG
      Array.fill(64)(0x89.toByte))                          // PNG-ish first byte only
    cases.zipWithIndex.foreach { case (b, i) =>
      val m = Multimodal.decode(RawMedia(i.toLong, b))
      assert(m.format == "unknown" && m.width == -1L, s"case $i")
      assert(m.byte_len == b.length.toLong)
    }
  }

  test("distributed decode over the documents table matches per-row decode") {
    import spark.implicits._
    val docs = (0L until 50L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val dist = Multimodal.mediaMeta(spark, docs).as[Multimodal.MediaMeta].collect()
    val local = (0L until 50L).map(i =>
      Multimodal.decode(RawMedia(i, Multimodal.synthesizePayload(i))))
    assert(dist.toSeq == local)
    // all three container formats exercised
    assert(dist.map(_.format).toSet == Set("png", "jpeg", "wav"))
  }

  test("mediaStats: per-format profile, absent fields stay exactly -1") {
    import spark.implicits._
    val docs = (0L until 30L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val r = Multimodal.mediaStats(spark, docs).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(3), x.getLong(5)))).toMap
    assert(r.keySet == Set("png", "jpeg", "wav"))
    assert(r.values.map(_._1).sum == 30L)
    assert(r("wav")._2 == -1L, "wav has no width")
    assert(r("png")._3 == -1L && r("jpeg")._3 == -1L, "images have no rate")
    assert(r("png")._2 > 0L && r("jpeg")._2 > 0L)
  }

  test("sizeProfile: rank-selected percentiles, fixed-size formats degenerate") {
    import spark.implicits._
    // ids 0..5: png {0,3} both 45 B; jpeg {1,4} both 23 B;
    // wav {2,5} = 44+(id%1000+1)(id%2+1)·2 → 50 and 68 B.
    // n=2 each: med rank (2+1) div 2 = 1 (smallest), p90 rank
    // (9·2+9) div 10 = 2 (largest).
    val docs = (0L until 6L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val r = Multimodal.sizeProfile(spark, docs).collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5))))
      .toMap
    assert(r("png") == ((2L, 45L, 45L, 45L, 45L)), s"$r")
    assert(r("jpeg") == ((2L, 23L, 23L, 23L, 23L)), s"$r")
    assert(r("wav") == ((2L, 50L, 68L, 50L, 68L)), s"$r")
  }

  test("payload dedup: byte-identical payloads collapse, distinct ones don't") {
    import spark.implicits._
    // ids 0 and 1527 build byte-identical PNGs (1527 = lcm(3, 509):
    // same format branch, same w = id%509+16, same h); id 3 is a
    // different PNG; id 2 is a WAV
    val docs = Seq(0L, 1527L, 3L, 2L).map(i => (i, "t")).toDF("doc_id", "text")
    assert(java.util.Arrays.equals(
      Multimodal.synthesizePayload(0L), Multimodal.synthesizePayload(1527L)))
    val out = Multimodal.payloadDedup(spark, docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // wav id 2: nSamples = 2%1000+1 = 3, channels = 2%2+1 = 1 →
    // 44 + 3·1·2 = 50 bytes
    assert(out == Map(0L -> ((2L, 45L)), 3L -> ((1L, 45L)),
      2L -> ((1L, 50L))))
  }

  test("payload near-dup: identical bytes score 1e6 ppm, shared header boilerplate less") {
    import spark.implicits._
    val docs = Seq(0L, 1527L, 3L, 2L).map(i => (i, "t")).toDF("doc_id", "text")
    val pairs = Multimodal.payloadNearDup(spark, docs, minJaccardPpm = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    // byte-identical pair: full Jaccard
    assert(pairs((0L, 1527L)) == 1000000L)
    // two different PNGs: share signature/IEND shingles but not the
    // dimension/CRC region — strictly between 0 and 1e6
    val cross = pairs((0L, 3L))
    assert(cross > 0L && cross < 1000000L)
    // png vs wav share no 8-byte shingle: no candidate pair at all
    assert(!pairs.contains((0L, 2L)) && !pairs.contains((2L, 3L)))
  }
  test("aspect profile buckets decoded image dims, audio excluded") {
    import spark.implicits._
    // doc 0: png 16x16 -> 100; doc 1: jpeg 17x23 -> 73; doc 2: wav (out)
    // doc 3: png 19x37 -> 51
    val d = Seq(0L, 1L, 2L, 3L).toDF("doc_id")
    val r = Multimodal.aspectProfile(spark, d).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
      .toMap
    assert(r(100L) == ((1L, 16L, 16L)))
    assert(r(73L) == ((1L, 17L, 17L)))
    assert(r(51L) == ((1L, 19L, 19L)))
    assert(r.size == 3)
  }

  test("GIF87a and BMP little-endian headers round-trip through real bytes") {
    val gif = Multimodal.decode(RawMedia(0L, Multimodal.synthesizeLegacyPayload(0L)))
    assert(gif.format == "gif" && gif.width == 16L && gif.height == 16L)
    assert(gif.byte_len == 14L && gif.sample_rate == -1L)
    val bmp = Multimodal.decode(RawMedia(1L, Multimodal.synthesizeLegacyPayload(1L)))
    assert(bmp.format == "bmp" && bmp.width == 17L && bmp.height == 27L)
    assert(bmp.byte_len == 54L)
    val png = Multimodal.decode(RawMedia(2L, Multimodal.synthesizeLegacyPayload(2L)))
    assert(png.format == "png" && png.width == 18L && png.height == 38L)
    // a large dimension exercises multi-byte little-endian decode
    val big = Multimodal.decode(RawMedia(497L, Multimodal.synthesizeLegacyPayload(497L)))
    assert(big.format == "bmp" || big.format == "gif" || big.format == "png")
    assert(big.width == 497L % 509 + 16 && big.height == (497L * 11) % 509 + 16)
  }

}
