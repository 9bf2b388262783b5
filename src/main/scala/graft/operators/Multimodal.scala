package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal column plumbing (SURVEY.md §2G): media payloads ride as
  * opaque `binary` columns with typed metadata beside them; they stay
  * undecoded through shuffles, and decoding happens batched per
  * partition so a real decoder (image/audio lib) amortizes its init
  * per-batch — the JVM analogue of `mapInPandas` with Arrow batches.
  *
  * The decode itself is STUBBED (this container has no media libs): a
  * clearly-marked deterministic fake derives "features" from payload
  * bytes. Everything around it — schema, batching, partition layout,
  * null-safety — is real and tested (MultimodalSpec).
  */
object Multimodal {

  case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, kind: String, byte_len: Int,
                           checksum: Long, width: Int, height: Int)

  /** A media table derived from documents: the text bytes stand in for an
    * encoded payload; kind cycles deterministically. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"))

  /** mm_metadata: typed metadata extracted without decoding — payload
    * length, leading magic bytes, crc — pure column expressions, the
    * payload never leaves the executor. Rows-only at the driver (binary
    * semantics aren't DuckDB-comparable); MultimodalSpec is authority. */
  def mmMetadata(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).select(
      col("doc_id"), col("kind"),
      octet_length(col("payload")).as("byte_len"),
      hex(substring(col("payload"), 1, 4)).as("magic_hex"),
      crc32(col("payload")).as("checksum"))
      .orderBy(col("doc_id"))

  /** STUB decoder — deterministic fake standing in for an image/audio
    * decode (???: no media libs in this environment). Derives pseudo
    * dimensions from payload bytes; a real implementation would return
    * decoded frames/spectrograms. Signature takes a whole batch so the
    * per-batch init cost of a real codec is amortized. */
  def stubDecodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { r =>
      val crc = new java.util.zip.CRC32
      crc.update(r.payload)
      val c = crc.getValue
      MediaFeatures(r.doc_id, r.kind, r.payload.length, c,
        width = (c % 1920).toInt + 1, height = ((c >> 16) % 1080).toInt + 1)
    }

  /** Batched decode over partitions: groups each partition's rows into
    * fixed-size batches and runs the (stubbed) decoder once per batch.
    * Batch size bounds executor memory regardless of partition size. */
  def decodeFeatures(media: Dataset[MediaRow], batchSize: Int = 32): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(b => stubDecodeBatch(b.toSeq))
    }
  }

  /** mm_features: the batched stub-decode as a registered query
    * (rows-only: binary + stub semantics; MultimodalSpec is authority). */
  def mmFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decodeFeatures(mediaTable(spark, dir).as[MediaRow]).toDF()
      .orderBy(col("doc_id"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_metadata" -> (mmMetadata _),
    "mm_features" -> (mmFeatures _))
}
