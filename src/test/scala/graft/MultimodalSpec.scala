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
}
