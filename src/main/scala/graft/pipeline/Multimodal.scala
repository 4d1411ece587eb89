package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2 D12).
  *
  * Media assets ride through the pipeline as opaque `binary` columns
  * plus typed metadata; the decode / feature-extract step runs
  * batched inside `mapPartitions` (the Scala analogue of a
  * `mapInPandas` batch UDF): one partition = one decoder instance =
  * amortized setup, no per-row JNI churn. The actual codec is STUBBED
  * deterministically — this container has no image/audio libs — but
  * the schema, batching shape, and partition flow are the real thing.
  */
object Multimodal {

  /** Decoded media metadata (the "feature extraction" output). */
  case class MediaMeta(doc_id: Long, byte_len: Long, first_byte: Long, n_frames: Long)

  case class RawMedia(doc_id: Long, payload: Array[Byte])

  /** STUB decoder: a real implementation would parse the container
    * header (JPEG/PNG/WAV...) here. The fake is a deterministic
    * function of the bytes so the correctness oracle can replay it. */
  private def decodeStub(m: RawMedia): MediaMeta =
    MediaMeta(
      doc_id = m.doc_id,
      byte_len = m.payload.length.toLong,
      first_byte = if (m.payload.nonEmpty) (m.payload(0) & 0xff).toLong else -1L,
      n_frames = m.payload.length.toLong / 1000L + 1L)

  /** Attach a binary payload column (here: utf-8 text bytes standing
    * in for image bytes) — the ingest shape of a multimodal table. */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").cast("long").as("doc_id"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Batched decode over partitions: the per-partition iterator is
    * consumed lazily, so memory stays one batch deep regardless of
    * partition size. */
  def decodeMeta(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    withPayload(docs).as[RawMedia].mapPartitions { it =>
      // one decoder instance per partition would be initialized here
      it.map(decodeStub)
    }
  }

  /** Driver-contract query: decoded metadata, ordered. */
  def mediaMeta(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeMeta(spark, docs).toDF().orderBy("doc_id")
}
