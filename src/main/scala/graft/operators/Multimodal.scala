package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
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
    * length, leading magic bytes, content hash — pure column
    * expressions, the payload never leaves the executor. Fully oracled
    * (r7 — was rows-only under crc32, which DuckDB lacks): the checksum
    * is md5 of the payload bytes (identical hex both engines, the
    * mm_dedup contract) and the magic is the first 4 bytes as uppercase
    * hex, which DuckDB reproduces as a prefix of the full-blob hex. */
  def mmMetadata(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).select(
      col("doc_id"), col("kind"),
      octet_length(col("payload")).as("byte_len"),
      hex(substring(col("payload"), 1, 4)).as("magic_hex"),
      md5(col("payload")).as("checksum_md5"))
      .orderBy(col("doc_id"))

  val mmMetadataSql: String =
    """SELECT doc_id,
      |       ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
      |       strlen(text) AS byte_len,
      |       substring(hex(encode(text)), 1, 8) AS magic_hex,
      |       md5(text) AS checksum_md5
      |FROM documents ORDER BY doc_id""".stripMargin

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

  /** mm_dedup: exact payload dedup by content hash — the multimodal
    * analogue of image/audio dedup in a training pipeline: identical
    * payloads collapse to one keeper regardless of doc metadata. Emits
    * the full keeper manifest (one row per content hash, n_copies ≥ 1 —
    * dedup_exact's convention, so the output is non-degenerate on
    * corpora without raw-byte duplicates). md5 of the BINARY payload;
    * since the stand-in payload is the text's UTF-8 bytes, DuckDB's
    * md5(VARCHAR) hashes the same bytes — the one multimodal query with
    * a full hash-matched oracle. Scale: one map-side-combined aggregate
    * on the 16-byte hash; payload bytes never shuffle (only their hash
    * and length do). */
  def mmDedup(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("doc_id"), md5(col("payload")).as("payload_md5"),
        octet_length(col("payload")).as("byte_len"))
      .groupBy(col("payload_md5"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"),
        max(col("byte_len")).as("byte_len"))
      .orderBy(col("payload_md5"))

  val mmDedupSql: String =
    """SELECT md5(text) AS payload_md5, min(doc_id) AS keeper_id,
      |       count(*) AS n_copies, max(strlen(text)) AS byte_len
      |FROM documents GROUP BY 1
      |ORDER BY payload_md5""".stripMargin

  /** mm_shard_pack: pack media payloads into training shards bounded by
    * a byte budget — the binary twin of text_pack_tokens (a multimodal
    * loader wants "~64 KiB of payload per pack file", not a doc count).
    * Docs pre-partition into shards (doc_id % 32 at gate scale — the
    * same floor-preserving knob pattern as TrainPrep.packShards grows
    * it with data), then a per-shard running byte sum assigns pack ids;
    * a GLOBAL running sum would serialize on one task.
    *
    * Only byte LENGTHS cross the compare (payload bytes never shuffle
    * beyond their shard), so this is fully oracled: the stand-in
    * payload is the text's UTF-8 bytes and DuckDB's strlen counts the
    * same bytes. */
  def mmShardPack(spark: SparkSession, dir: String): DataFrame = {
    val capBytes = 65536L
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    mediaTable(spark, dir)
      .select(col("doc_id"), col("kind"), (col("doc_id") % 32).as("shard"),
        octet_length(col("payload")).cast("long").as("byte_len"))
      .withColumn("cum_bytes", sum(col("byte_len")).over(w))
      .select(col("shard"), col("doc_id"), col("kind"), col("byte_len"),
        col("cum_bytes"),
        ((col("cum_bytes") - col("byte_len")) / capBytes).cast("long").as("pack_id"))
      .orderBy(col("shard"), col("doc_id"))
  }

  val mmShardPackSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
      |              WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |         doc_id % 32 AS shard,
      |         CAST(strlen(text) AS BIGINT) AS byte_len
      |  FROM documents),
      |c AS (
      |  SELECT *, CAST(sum(byte_len) OVER (PARTITION BY shard ORDER BY doc_id
      |                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_bytes
      |  FROM t)
      |SELECT shard, doc_id, kind, byte_len, cum_bytes,
      |       CAST((cum_bytes - byte_len) // 65536 AS BIGINT) AS pack_id
      |FROM c ORDER BY shard, doc_id""".stripMargin

  /** mm_frame_sample: video frame SAMPLING plumbing — treat each video
    * payload as a sequence of fixed 256-byte pseudo-frames (standing in
    * for container-reported frames; a real pipeline reads the frame
    * count from metadata the same way) and sample an evenly-strided ≤8
    * of them per video, emitting each sampled frame's offset and an
    * 8-byte fingerprint. This is the decode-free half of frame
    * extraction a training pipeline runs BEFORE the expensive decoder
    * (pick frames → then decode only those); the stride arithmetic,
    * explode shape and byte-slicing are the real distributed work.
    *
    * Scale: map-only — sequence+explode emits ≤8 rows per video and
    * only (doc_id, idx, 16-hex-char fingerprint) scalars leave the
    * scan; payload bytes never shuffle. Fully oracled: the fingerprint
    * is hex(bytes) so DuckDB can slice the hex string (hex pairs =
    * bytes) without blob substring support — byte-exact regardless of
    * text encoding. Videos shorter than one frame emit no rows. */
  def mmFrameSample(spark: SparkSession, dir: String): DataFrame =
    mmFrameSampleFrom(mediaTable(spark, dir))

  private[graft] def mmFrameSampleFrom(media: DataFrame): DataFrame = {
    val frameBytes = 256
    val maxFrames = 8
    media.filter(col("kind") === "video")
      .select(col("doc_id"), col("payload"),
        expr(s"CAST(octet_length(payload) DIV $frameBytes AS BIGINT)").as("n_frames"))
      .filter(col("n_frames") >= 1)
      .withColumn("stride", greatest(lit(1L),
        ceil(col("n_frames").cast("double") / maxFrames).cast("long")))
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, col("stride"))).as("frame_idx"),
        col("payload"))
      .select(col("doc_id"), col("n_frames"), col("frame_idx"),
        (col("frame_idx") * frameBytes).as("frame_off"),
        hex(col("payload").substr((col("frame_idx") * frameBytes + 1).cast("int"),
          lit(8))).as("frame_hex"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  val mmFrameSampleSql: String =
    """WITH v AS (
      |  SELECT doc_id, text, strlen(text) // 256 AS n_frames
      |  FROM documents
      |  WHERE CAST(doc_id % 3 AS INT) = 2 AND strlen(text) >= 256),
      |s AS (SELECT doc_id, n_frames, text,
      |        greatest(1, CAST(ceil(CAST(n_frames AS DOUBLE) / 8) AS BIGINT)) AS stride
      |      FROM v),
      |f AS (SELECT doc_id, n_frames, text,
      |        unnest(range(0, n_frames, stride)) AS frame_idx FROM s)
      |SELECT doc_id, n_frames, frame_idx, frame_idx * 256 AS frame_off,
      |       substring(hex(encode(text)), CAST(frame_idx * 512 + 1 AS BIGINT), 16) AS frame_hex
      |FROM f ORDER BY doc_id, frame_idx""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_frame_sample" -> (mmFrameSample _),
    "mm_metadata" -> (mmMetadata _),
    "mm_features" -> (mmFeatures _),
    "mm_dedup" -> (mmDedup _),
    "mm_shard_pack" -> (mmShardPack _))

  def oracles: Map[String, String] = Map(
    "mm_frame_sample" -> mmFrameSampleSql,
    "mm_metadata" -> mmMetadataSql,
    "mm_dedup" -> mmDedupSql,
    "mm_shard_pack" -> mmShardPackSql)
}
