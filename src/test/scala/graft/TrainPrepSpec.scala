package graft

import org.apache.spark.sql.functions._

/** Semantic checks for the training-prep operators. */
class TrainPrepSpec extends SparkSpec {

  test("pack assignment is monotone within shard and respects capacity boundaries") {
    val rows = SparkEntry.queries("text_pack_tokens")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      val packs = sorted.map(_.getLong(4))
      assert(packs.zip(packs.tail).forall { case (a, b) => a <= b }, "packs monotone")
      sorted.foreach { r =>
        assert(r.getLong(4) == (r.getLong(3) - r.getInt(2)) / 2048)
      }
    }
  }

  test("pii scrub redacts every planted email and phone") {
    val rows = SparkEntry.queries("text_pii_scrub")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(1) >= 1, "planted email must be found")
      assert(r.getInt(2) >= 1, "planted phone must be found")
    }
  }

  test("quantization error bounded by half a scale step") {
    val rows = SparkEntry.queries("embed_quantize")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = math.max((r.getDouble(2) - r.getDouble(1)) / 255.0, 1e-12)
      assert(r.getDouble(3) <= scale / 2 + 1e-6,
        s"max err ${r.getDouble(3)} > half step ${scale / 2}")
      assert(r.getDouble(4) <= r.getDouble(3))
    }
  }

  test("corpus curation drops near-dup partners and junk docs") {
    val kept = SparkEntry.queries("corpus_curate")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.nonEmpty)
    // every >=0.9-Jaccard pair contributes at most its lower doc_id
    val pairs = SparkEntry.queries("dedup_ngram_jaccard")(spark, sf)
      .filter(col("jaccard") >= 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (_, b) => assert(!kept.contains(b), s"dup partner $b kept") }
    // kept docs satisfy the gates
    SparkEntry.queries("corpus_curate")(spark, sf).collect().foreach { r =>
      assert(r.getInt(1) >= 20 && r.getDouble(2) >= 0.3)
    }
  }

  test("ngram frequencies are descending and deduplicated") {
    val rows = SparkEntry.queries("text_ngram_freq")(spark, sf).collect()
    assert(rows.length == 50)
    val ns = rows.map(_.getLong(1)).toSeq
    assert(ns == ns.sorted.reverse)
    assert(rows.map(_.getString(0)).distinct.length == rows.length)
  }
}
