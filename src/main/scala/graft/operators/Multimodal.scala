package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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
    * per-batch init cost of a real codec is amortized — and the digest
    * instance is allocated once per batch for the same reason.
    *
    * r14: the pseudo-checksum is the top 60 bits of md5(payload) (the
    * repo's md5-prefix lane convention, TextHashes.scala:124) instead of
    * CRC32, which DuckDB lacks — every derived column is then integer
    * arithmetic a mirror can replay, so the one remaining rows-only
    * query gained a full oracle without touching the batching plumbing
    * that is the actual point of this operator. */
  def stubDecodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    batch.map { r =>
      md.reset()
      val d = md.digest(r.payload)
      // big-endian first 8 digest bytes >>> 4 = first 15 hex chars
      // = a nonnegative 60-bit long, bit-identical to DuckDB's
      // CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)
      val c = java.nio.ByteBuffer.wrap(d, 0, 8).getLong >>> 4
      MediaFeatures(r.doc_id, r.kind, r.payload.length, c,
        width = (c % 1920).toInt + 1, height = ((c >> 16) % 1080).toInt + 1)
    }
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

  /** mm_features: the batched stub-decode as a registered query. Fully
    * oracled since r14 (was the last rows-only query): the stub's
    * checksum is the 60-bit md5 prefix, so the mirror replays the whole
    * feature row — doc_id/kind/byte_len from the media projection,
    * width/height as integer arithmetic on the checksum. MultimodalSpec
    * stays authority for the batching semantics the SQL can't see
    * (batch grouping, partitioning-independence). */
  def mmFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decodeFeatures(mediaTable(spark, dir).as[MediaRow]).toDF()
      .orderBy(col("doc_id"))
  }

  val mmFeaturesSql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |         ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
      |         CAST(strlen(text) AS INT) AS byte_len,
      |         CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS checksum
      |  FROM documents)
      |SELECT doc_id, kind, byte_len, checksum,
      |       CAST(checksum % 1920 + 1 AS INT) AS width,
      |       CAST((checksum >> 16) % 1080 + 1 AS INT) AS height
      |FROM m ORDER BY doc_id""".stripMargin

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

  private val FrameBytes = 256
  private val MaxFrames = 8

  /** The sampled-frame spine (doc_id, n_frames, frame_idx, payload) both
    * frame consumers read — the stride arithmetic factored once so
    * mm_frame_sample and mm_near_dup cannot sample different frames. */
  private[graft] def videoFrames(media: DataFrame): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("doc_id"), col("payload"),
        expr(s"CAST(octet_length(payload) DIV $FrameBytes AS BIGINT)").as("n_frames"))
      .filter(col("n_frames") >= 1)
      .withColumn("stride", greatest(lit(1L),
        ceil(col("n_frames").cast("double") / MaxFrames).cast("long")))
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, col("stride"))).as("frame_idx"),
        col("payload"))

  private[graft] def mmFrameSampleFrom(media: DataFrame): DataFrame =
    videoFrames(media)
      .select(col("doc_id"), col("n_frames"), col("frame_idx"),
        (col("frame_idx") * FrameBytes).as("frame_off"),
        hex(col("payload").substr((col("frame_idx") * FrameBytes + 1).cast("int"),
          lit(8))).as("frame_hex"))
      .orderBy(col("doc_id"), col("frame_idx"))

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

  /** mm_near_dup: near-duplicate VIDEO detection by sampled-frame
    * fingerprint overlap — the multimodal twin of dedup_containment:
    * re-encoded/trimmed copies of a video keep most of their frame
    * content even when the container bytes (and so mm_dedup's payload
    * hash) differ. TWO candidate keys per sampled frame (r13 — the r12
    * verdict's robustness task):
    *  - EXACT: mm_frame_sample's first-8-bytes fingerprint — byte-
    *    identical frames only; any re-encode defeats it;
    *  - PERCEPTUAL (quantized, blockhash-style): the 256-byte frame
    *    splits into 8 blocks of 32 bytes; each block contributes the
    *    //8-quantized count of its high-nibble-0x6_ bytes (a-o — the
    *    dominant text class), concatenated to an 8-symbol signature.
    *    Byte substitutions WITHIN the class (any re-encode that keeps
    *    coarse content) and small count drifts inside a bucket leave
    *    the signature unchanged, while the per-block structure keeps
    *    unrelated content apart (the whole-frame histogram variant was
    *    measured degenerate on text: every frame bucketed alike).
    *    Derived from the frame's HEX string (even positions = high
    *    nibbles), so it is byte-exact cross-engine regardless of text
    *    encoding; integer-exact and fully oracled. A real pipeline
    *    swaps this stand-in for a decoded-pixel pHash/blockhash; the
    *    candidate algebra downstream is unchanged.
    * A pair is near-dup when the EXACT family reaches 50% overlap, or
    * the perceptual family reaches 50% overlap with ≥2 independently
    * shared signatures (the dedup_winnow_pairs ≥2 convention: one
    * coarse bucket match alone is too weak — measured at sf0.01, the
    * single-sig rule flagged 37 unrelated 1-frame video pairs). All
    * verdicts are exact integer cross-tests, no float compare.
    *
    * Scale: candidate generation joins on the (kind, key) — work is
    * O(shared-key pairs), never all-pairs — with the dedup family's
    * boilerplate cap (keys in > 64 videos: intros/test patterns/black
    * frames would contribute c² candidate pairs each); denominators
    * keep the UNCAPPED per-video set so the overlap fraction stays
    * honest. The distinct key set and the capped join side are staged
    * once each (the aliased-self-join ReuseExchange miss, SURVEY §4). */
  def mmNearDup(spark: SparkSession, dir: String): DataFrame =
    mmNearDupFrom(mediaTable(spark, dir))

  private val FpDfCap = 64
  private val PcptQuant = 8

  private[graft] def mmNearDupFrom(media: DataFrame): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.stageBarrier
    val hx = hex(col("payload").substr(
      (col("frame_idx") * FrameBytes + 1).cast("int"), lit(FrameBytes)))
    val hn = regexp_replace(hx, "(.).", "$1") // high nibble of every byte
    def blockQ(b: Int): Column =
      floor(length(regexp_replace(substring(hn, b * 32 + 1, 32), "[^6]", ""))
        / lit(PcptQuant.toDouble)).cast("int").cast("string")
    val keys = videoFrames(media).select(col("doc_id"),
      hex(col("payload").substr((col("frame_idx") * FrameBytes + 1).cast("int"),
        lit(8))).as("xk"),
      concat((0 until 8).map(blockQ): _*).as("pk"))
    val fp = stageBarrier(keys
      .select(col("doc_id"), explode(array(
        struct(lit("x").as("kt"), col("xk").as("k")),
        struct(lit("p").as("kt"), col("pk").as("k")))).as("e"))
      .select(col("doc_id"), col("e.kt"), col("e.k")).distinct())
    val sizes = fp.groupBy(col("doc_id"), col("kt")).agg(count(lit(1)).as("nf"))
    val keep = fp.groupBy(col("kt"), col("k")).agg(count(lit(1)).as("c"))
      .filter(col("c") <= FpDfCap).select(col("kt"), col("k"))
    val fpk = stageBarrier(fp.join(keep, Seq("kt", "k")))
    val pairs = fpk.select(col("kt"), col("k"), col("doc_id").as("doc_a"))
      .join(fpk.select(col("kt"), col("k"), col("doc_id").as("doc_b")), Seq("kt", "k"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(when(col("kt") === "x", 1L).otherwise(0L)).as("shared"),
        sum(when(col("kt") === "p", 1L).otherwise(0L)).as("shared_pcpt"))
    val sx = sizes.filter(col("kt") === "x")
    val sp = sizes.filter(col("kt") === "p")
    pairs
      .join(sx.select(col("doc_id").as("doc_a"), col("nf").as("n_a")), Seq("doc_a"))
      .join(sx.select(col("doc_id").as("doc_b"), col("nf").as("n_b")), Seq("doc_b"))
      .join(sp.select(col("doc_id").as("doc_a"), col("nf").as("pn_a")), Seq("doc_a"))
      .join(sp.select(col("doc_id").as("doc_b"), col("nf").as("pn_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("shared"), col("n_a"), col("n_b"),
        col("shared_pcpt"), col("pn_a"), col("pn_b"),
        (round(col("shared").cast("double") / least(col("n_a"), col("n_b")), 4) + 0.0)
          .as("overlap"),
        (round(col("shared_pcpt").cast("double") / least(col("pn_a"), col("pn_b")), 4)
          + 0.0).as("overlap_pcpt"),
        (col("shared") * 2 >= least(col("n_a"), col("n_b")) ||
          (col("shared_pcpt") >= 2 &&
            col("shared_pcpt") * 2 >= least(col("pn_a"), col("pn_b")))).as("near_dup"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Mirror: the same dual-key algebra off the same hex parses — the
    * perceptual high-nibble string is regexp_replace('(.).', '\1') over
    * the identical frame hex mm_frame_sample slices. */
  lazy val mmNearDupSql: String =
    s"""WITH pv AS (
       |  SELECT doc_id, strlen(text) // 256 AS n_frames, text
       |  FROM documents
       |  WHERE CAST(doc_id % 3 AS INT) = 2 AND strlen(text) >= 256),
       |ps AS (SELECT doc_id, n_frames, text,
       |         greatest(1, CAST(ceil(CAST(n_frames AS DOUBLE) / 8) AS BIGINT)) AS stride
       |       FROM pv),
       |pf AS (SELECT doc_id, text, unnest(range(0, n_frames, stride)) AS frame_idx
       |       FROM ps),
       |ph AS (SELECT doc_id,
       |         substring(hex(encode(text)), CAST(frame_idx * 512 + 1 AS BIGINT), 16) AS xk,
       |         regexp_replace(substring(hex(encode(text)),
       |           CAST(frame_idx * 512 + 1 AS BIGINT), 512), '(.).', '\\1', 'g') AS hn
       |       FROM pf),
       |pkk AS (SELECT doc_id, xk,
       |         ${(0 until 8).map(b =>
              s"CAST(length(regexp_replace(substring(hn, ${b * 32 + 1}, 32), " +
                s"'[^6]', '', 'g')) // $PcptQuant AS VARCHAR)")
              .mkString(" ||\n       |         ")} AS pkey
       |       FROM ph),
       |fp AS (SELECT DISTINCT doc_id, kt, k FROM (
       |         SELECT doc_id, 'x' AS kt, xk AS k FROM pkk
       |         UNION ALL SELECT doc_id, 'p', pkey FROM pkk)),
       |sz AS (SELECT doc_id, kt, count(*) AS nf FROM fp GROUP BY doc_id, kt),
       |keep AS (SELECT kt, k FROM fp GROUP BY kt, k HAVING count(*) <= $FpDfCap),
       |fpk AS (SELECT fp.doc_id, fp.kt, fp.k FROM fp JOIN keep USING (kt, k)),
       |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |        CAST(sum(CASE WHEN a.kt = 'x' THEN 1 ELSE 0 END) AS BIGINT) AS shared,
       |        CAST(sum(CASE WHEN a.kt = 'p' THEN 1 ELSE 0 END) AS BIGINT) AS shared_pcpt
       |      FROM fpk a JOIN fpk b
       |        ON a.kt = b.kt AND a.k = b.k AND a.doc_id < b.doc_id
       |      GROUP BY 1, 2)
       |SELECT doc_a, doc_b, shared, sxa.nf AS n_a, sxb.nf AS n_b,
       |       shared_pcpt, spa.nf AS pn_a, spb.nf AS pn_b,
       |       CAST(round(CAST(shared AS DOUBLE) / least(sxa.nf, sxb.nf), 4) AS DOUBLE)
       |         + 0.0 AS overlap,
       |       CAST(round(CAST(shared_pcpt AS DOUBLE) / least(spa.nf, spb.nf), 4) AS DOUBLE)
       |         + 0.0 AS overlap_pcpt,
       |       (shared * 2 >= least(sxa.nf, sxb.nf)
       |        OR (shared_pcpt >= 2
       |            AND shared_pcpt * 2 >= least(spa.nf, spb.nf))) AS near_dup
       |FROM p JOIN sz sxa ON sxa.doc_id = doc_a AND sxa.kt = 'x'
       |       JOIN sz sxb ON sxb.doc_id = doc_b AND sxb.kt = 'x'
       |       JOIN sz spa ON spa.doc_id = doc_a AND spa.kt = 'p'
       |       JOIN sz spb ON spb.doc_id = doc_b AND spb.kt = 'p'
       |ORDER BY doc_a, doc_b""".stripMargin

  // ------------------------------------------------------------ mm_size_hist
  /** Per-modality payload-SIZE profile: media rows bucketed by
    * floor(log2(bytes)) with per-bucket count, within-modality share,
    * and byte mass — the storage/shard-sizing read a media lake runs
    * before choosing mm_shard_pack's capacity (corpus_length_hist's
    * shape on binary payloads; the payload itself never decodes — only
    * octet_length leaves the scan).
    *
    * Exactness: the corpus_length_hist discipline — bucket =
    * len(binary(n)) − 1 (no transcendental log), floor an integer
    * shift, share one division of exact integers; empty payloads clamp
    * to 1 byte (bucket 0).
    *
    * Scale: map-only length extraction + ONE map-side-combined
    * (kind, bucket) aggregate (≤3·~30 rows), staged for its two
    * consumers (output + the per-kind rollup, broadcast back). */
  def mmSizeHist(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.stageBarrier
    val n = greatest(octet_length(col("payload")).cast("long"), lit(1L))
    val agg = stageBarrier(mediaTable(spark, dir)
      .select(col("kind"), n.as("n_bytes"))
      .withColumn("bucket", (length(bin(col("n_bytes"))) - 1).cast("int"))
      .groupBy(col("kind"), col("bucket"))
      .agg(count(lit(1)).as("n_rows"), sum(col("n_bytes")).as("sum_bytes")))
    val tot = agg.groupBy(col("kind")).agg(sum(col("n_rows")).as("kind_rows"))
    agg.join(broadcast(tot), Seq("kind"))
      .select(col("kind"), col("bucket"),
        expr("CAST(shiftleft(CAST(1 AS BIGINT), bucket) AS BIGINT)").as("bucket_lo"),
        col("n_rows"),
        (round(col("n_rows").cast("double") / col("kind_rows").cast("double"), 6)
          + 0.0).as("share"),
        col("sum_bytes"))
      .orderBy(col("kind"), col("bucket"))
  }

  val mmSizeHistSql: String =
    """WITH b AS (
      |  SELECT ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
      |         greatest(strlen(text), 1) AS n_bytes
      |  FROM documents),
      |k AS (SELECT kind, n_bytes,
      |        CAST(length(format('{:b}', n_bytes)) - 1 AS INT) AS bucket FROM b),
      |ag AS (SELECT kind, bucket, count(*) AS n_rows,
      |        CAST(sum(n_bytes) AS BIGINT) AS sum_bytes
      |       FROM k GROUP BY kind, bucket),
      |tt AS (SELECT kind, sum(n_rows) AS kind_rows FROM ag GROUP BY kind)
      |SELECT ag.kind, bucket, CAST(1 AS BIGINT) << bucket AS bucket_lo, n_rows,
      |       round(CAST(n_rows AS DOUBLE)/CAST(kind_rows AS DOUBLE), 6) + 0.0 AS share,
      |       sum_bytes
      |FROM ag JOIN tt ON ag.kind = tt.kind
      |ORDER BY ag.kind, bucket""".stripMargin

  // -------------------------------------------------------- mm_caption_pairs
  /** Multimodal training-pair manifest — the (media, caption) gate a
    * LAION-style pair pipeline runs before contrastive training: each
    * payload pairs with its caption text and passes three independent
    * gates (payload size within bounds, caption token count within
    * bounds, caption language = en), emitting keep + the FIRST failing
    * gate as the reject reason (ordered size → caption → lang, so both
    * engines name the same reason). The pair manifest — not the
    * payload — is what downstream shuffles; media bytes never move for
    * rejected rows.
    *
    * Scale: in production media and captions are separate tables paired
    * by a co-partitioned doc_id equi-join; the gate fixture derives
    * both from one documents scan, so the whole manifest is ONE
    * map-only codegen'd projection — zero shuffles, and the gates are
    * exact integer/string comparisons (no float thresholds). */
  def mmCaptionPairs(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val toks = graft.functions.Text.nBpeTokens(col("text"))
    d.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      octet_length(col("text").cast("binary")).as("byte_len"),
      toks.as("n_tokens"),
      col("lang"))
      .withColumn("size_ok", col("byte_len") >= 50 && col("byte_len") <= 5000)
      .withColumn("caption_ok", col("n_tokens") >= 5 && col("n_tokens") <= 512)
      .withColumn("lang_ok", col("lang") === "en")
      .withColumn("keep", col("size_ok") && col("caption_ok") && col("lang_ok"))
      .withColumn("reject_reason",
        when(col("keep"), lit(null).cast("string"))
          .when(!col("size_ok"), "payload_size")
          .when(!col("caption_ok"), "caption_length")
          .otherwise("language"))
      .select(col("doc_id"), col("kind"), col("byte_len"), col("n_tokens"),
        col("lang"), col("keep"), col("reject_reason"))
      .orderBy(col("doc_id"))
  }

  val mmCaptionPairsSql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
      |    strlen(text) AS byte_len,
      |    len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS n_tokens,
      |    lang
      |  FROM documents),
      |g AS (SELECT *,
      |        byte_len >= 50 AND byte_len <= 5000 AS size_ok,
      |        n_tokens >= 5 AND n_tokens <= 512 AS caption_ok,
      |        lang = 'en' AS lang_ok
      |      FROM m)
      |SELECT doc_id, kind, byte_len, n_tokens, lang,
      |  size_ok AND caption_ok AND lang_ok AS keep,
      |  CASE WHEN size_ok AND caption_ok AND lang_ok THEN NULL
      |       WHEN NOT size_ok THEN 'payload_size'
      |       WHEN NOT caption_ok THEN 'caption_length'
      |       ELSE 'language' END AS reject_reason
      |FROM g ORDER BY doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_caption_pairs" -> (mmCaptionPairs _),
    "mm_size_hist" -> (mmSizeHist _),
    "mm_near_dup" -> (mmNearDup _),
    "mm_frame_sample" -> (mmFrameSample _),
    "mm_metadata" -> (mmMetadata _),
    "mm_features" -> (mmFeatures _),
    "mm_dedup" -> (mmDedup _),
    "mm_shard_pack" -> (mmShardPack _))

  def oracles: Map[String, String] = Map(
    "mm_caption_pairs" -> mmCaptionPairsSql,
    "mm_size_hist" -> mmSizeHistSql,
    "mm_near_dup" -> mmNearDupSql,
    "mm_frame_sample" -> mmFrameSampleSql,
    "mm_metadata" -> mmMetadataSql,
    "mm_features" -> mmFeaturesSql,
    "mm_dedup" -> mmDedupSql,
    "mm_shard_pack" -> mmShardPackSql)
}
