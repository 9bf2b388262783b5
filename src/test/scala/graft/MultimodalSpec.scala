package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

/** Multimodal plumbing specs (driver check is rows-only for binary). */
class MultimodalSpec extends SparkSpec {

  test("mm_metadata extracts typed metadata without decoding") {
    val rows = SparkEntry.queries("mm_metadata")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(Set("image", "audio", "video").contains(r.getString(1)))
      assert(r.getInt(2) > 0)
      assert(r.getString(3).nonEmpty)
    }
  }

  test("batched decode: results independent of partitioning and batch size") {
    import spark.implicits._
    val media = Multimodal.mediaTable(spark, sf).as[MediaRow]
    def run(parts: Int, batch: Int) =
      Multimodal.decodeFeatures(media.repartition(parts), batch)
        .collect().map(f => (f.doc_id, f.kind, f.byte_len, f.checksum, f.width, f.height))
        .sortBy(_._1)
    val a = run(1, 32)
    val b = run(7, 5)
    assert(a.nonEmpty && a.sameElements(b))
    a.foreach { case (_, _, len, _, w, h) =>
      assert(len > 0 && w >= 1 && w <= 1920 && h >= 1 && h <= 1080)
    }
  }

  test("payload survives shuffle opaquely (checksum stable across repartition)") {
    import spark.implicits._
    val media = Multimodal.mediaTable(spark, sf).as[MediaRow]
    val direct = Multimodal.decodeFeatures(media).select("doc_id", "checksum")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val shuffled = Multimodal.decodeFeatures(
      media.repartition(11, col("kind"))).select("doc_id", "checksum")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(direct == shuffled)
  }

  test("mm_frame_sample: stride caps samples at 8, fingerprints match payload bytes") {
    import spark.implicits._
    // 19 frames (4864+192 bytes) -> stride ceil(19/8)=3 -> frames 0,3,..,18 (7)
    val longPayload = Array.tabulate[Byte](19 * 256 + 192)(i => (i % 251).toByte)
    val shortPayload = Array.tabulate[Byte](100)(i => i.toByte) // < 1 frame
    val media = Seq(
      (2L, "video", longPayload),
      (5L, "video", shortPayload),
      (1L, "image", longPayload) // non-video: excluded
    ).toDF("doc_id", "kind", "payload")
    val rows = Multimodal.mmFrameSampleFrom(media).collect()
    assert(rows.map(_.getLong(0)).distinct.toSeq == Seq(2L), "only the long video samples")
    assert(rows.map(_.getLong(2)).toSeq == Seq(0L, 3L, 6L, 9L, 12L, 15L, 18L))
    rows.foreach { r =>
      val off = r.getLong(3).toInt
      assert(off == r.getLong(2).toInt * 256)
      val expect = longPayload.slice(off, off + 8).map("%02X".format(_)).mkString
      assert(r.getString(4) == expect, s"frame ${r.getLong(2)} fingerprint")
    }
    assert(rows.length <= 8)
  }
}
