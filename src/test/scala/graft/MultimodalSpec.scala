package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

/** Multimodal plumbing specs (driver check is rows-only for binary). */
class MultimodalSpec extends SparkSpec {

  test("payloads never shuffle: no mm query's exchange carries a binary column") {
    // The family's 100 TB claim, pinned at the PLAN level: media bytes
    // stay in their scan partitions — only hashes/lengths/hex scalars
    // cross exchanges. AQE is disabled for the walk so the full
    // pre-stage plan is visible to collect().
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.BinaryType
    val mm = SparkEntry.queries.keys.filter(_.startsWith("mm_")).toSeq.sorted
    assert(mm.size >= 8, s"mm family shrank: $mm")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try mm.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan
      val offenders = plan.collect {
        case e: ShuffleExchangeExec if e.output.exists(_.dataType == BinaryType) => e
      }
      if (offenders.nonEmpty)
        fail(s"$name shuffles binary payload bytes:\n${offenders.head}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("mm_caption_pairs: keep is the AND of its gates, reason names the first failure") {
    val rows = SparkEntry.queries("mm_caption_pairs")(spark, sf).collect()
    assert(rows.nonEmpty)
    var kept = 0
    rows.foreach { r =>
      val (len, toks, lang) = (r.getInt(2).toLong, r.getInt(3), r.getString(4))
      val sizeOk = len >= 50 && len <= 5000
      val capOk = toks >= 5 && toks <= 512
      val langOk = lang == "en"
      val keep = sizeOk && capOk && langOk
      assert(r.getBoolean(5) == keep, s"keep wiring doc ${r.getLong(0)}")
      if (keep) { kept += 1; assert(r.isNullAt(6)) }
      else {
        val expect = if (!sizeOk) "payload_size"
        else if (!capOk) "caption_length" else "language"
        assert(r.getString(6) == expect, s"reason doc ${r.getLong(0)}")
      }
    }
    assert(kept > 0 && kept < rows.length, "both branches exercised at gate data")
  }

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

  test("stub checksum is the 60-bit md5 prefix (the cross-engine oracle contract)") {
    // mm_features' oracle replays width/height from
    // CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT); pin the
    // kernel's ByteBuffer derivation against Spark's own md5 so a stub
    // refactor can't silently break the mirror.
    import spark.implicits._
    val media = Multimodal.mediaTable(spark, sf).as[MediaRow]
    val kernel = Multimodal.decodeFeatures(media).select("doc_id", "checksum")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sqlSide = Multimodal.mediaTable(spark, sf)
      .select(col("doc_id"),
        conv(substring(md5(col("payload")), 1, 15), 16, 10).cast("long").as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kernel.nonEmpty && kernel == sqlSide)
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

  test("mm_near_dup: byte-identical videos flag near_dup, disjoint videos don't pair") {
    import spark.implicits._
    val base = Array.tabulate[Byte](8 * 256)(i => (i % 251).toByte)
    // half-overlap copy: first 4 frames of base + 4 novel frames
    val half = base.take(4 * 256) ++ Array.tabulate[Byte](4 * 256)(i => ((i * 7 + 3) % 249).toByte)
    val other = Array.tabulate[Byte](8 * 256)(i => ((i * 13 + 11) % 253).toByte)
    val media = Seq(
      (3L, "video", base), (6L, "video", base), // exact dup pair
      (9L, "video", half), // 50% frame overlap with base
      (12L, "video", other) // no shared frames
    ).toDF("doc_id", "kind", "payload")
    val rows = Multimodal.mmNearDupFrom(media).collect()
      .map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
        (r.getAs[Long]("shared"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Boolean]("near_dup")))).toMap
    // exact dup: all 8 sampled frames shared, near_dup
    assert(rows((3L, 6L)) == ((8L, 8L, 8L, true)), s"exact pair: ${rows.get((3L, 6L))}")
    // half overlap: 4 of 8 shared -> 2*4 >= 8, near_dup at the boundary
    assert(rows((3L, 9L)) == ((4L, 8L, 8L, true)), s"half pair: ${rows.get((3L, 9L))}")
    assert(rows((6L, 9L))._1 == 4L)
    // the disjoint video may surface as a coarse perceptual CANDIDATE
    // (uniform byte noise buckets alike) but must never be FLAGGED —
    // a single shared coarse signature is below the >=2 evidence bar
    assert(!rows.exists { case ((a, b), v) => (a == 12L || b == 12L) && v._4 })
  }

  test("mm_near_dup: a re-encoded copy (same-class byte substitutions) flags via the perceptual key") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // frame f: 32*f leading 'a' bytes (class 0x6_), rest 'p' (0x7_) —
    // 8 structurally distinct frames; the "re-encode" flips byte 0 of
    // every frame to another letter of the SAME class ('a'->'b',
    // 'p'->'q'), so every exact first-8-byte fingerprint changes while
    // every block class count (and so the perceptual signature) is
    // untouched — the mm_dedup/exact-key failure mode this key closes.
    def frame(f: Int, tweak: Boolean): Array[Byte] = {
      val c = 32 * f
      Array.tabulate[Byte](256) { i =>
        val b = if (i < c) 'a' else 'p'
        if (tweak && i == 0) (if (b == 'a') 'b' else 'q').toByte else b.toByte
      }
    }
    val orig = (0 until 8).flatMap(f => frame(f, tweak = false)).toArray
    val reenc = (0 until 8).flatMap(f => frame(f, tweak = true)).toArray
    val media = Seq((3L, "video", orig), (6L, "video", reenc))
      .toDF("doc_id", "kind", "payload")
    val r = Multimodal.mmNearDupFrom(media).orderBy(col("doc_a")).collect()
    assert(r.length == 1, s"one candidate pair expected, got ${r.length}")
    val row = r.head
    assert(row.getAs[Long]("shared") == 0L, "every exact fingerprint must differ")
    assert(row.getAs[Long]("shared_pcpt") == 8L,
      "all 8 perceptual signatures must survive the re-encode")
    assert(row.getAs[Long]("pn_a") == 8L, "the 8 frames must sign distinctly")
    assert(row.getAs[Boolean]("near_dup"),
      "the perceptual key must flag the re-encoded copy the exact key misses")
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

  test("mm_size_hist: row/byte conservation, per-kind shares sum to 1, buckets exact") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("mm_size_hist")(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == Set("image", "audio", "video"))
    val media = Multimodal.mediaTable(spark, sf)
    assert(rows.map(_.getLong(3)).sum == media.count(), "every payload in one bucket")
    val totalBytes = media
      .agg(sum(greatest(octet_length(col("payload")).cast("long"), lit(1L))))
      .first().getLong(0)
    assert(rows.map(_.getLong(5)).sum == totalBytes, "byte mass conserved")
    rows.groupBy(_.getString(0)).values.foreach { g =>
      assert(math.abs(g.map(_.getDouble(4)).sum - 1.0) <= 1e-4, "shares per kind")
    }
    rows.foreach { r =>
      val (b, lo, nr, sb) = (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(5))
      assert(lo == (1L << b) && sb >= nr * lo && sb < nr * (lo << 1), s"bucket: $r")
    }
  }
}
