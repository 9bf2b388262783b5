package graft

import org.apache.spark.sql.functions._
import graft.operators.TrainPrep

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

  test("stratified sample hits its per-language rates and is partitioning-independent") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val totals = docs.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = SparkEntry.queries("corpus_sample_stratified")(spark, sf).collect()
    val got = sampled.groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    // binomial rates: en ~25%, others ~75% (wide tolerance, small corpus)
    assert(math.abs(got("en").toDouble / totals("en") - 0.25) < 0.12)
    val restGot = (got - "en").values.sum.toDouble
    val restTot = (totals - "en").values.sum.toDouble
    assert(math.abs(restGot / restTot - 0.75) < 0.12)
    // determinism: the sample is a pure function of doc_id, not of plan shape
    val again = SparkEntry.queries("corpus_sample_stratified")(spark, sf)
      .repartition(7).collect().map(_.getLong(0)).toSet
    assert(again == sampled.map(_.getLong(0)).toSet)
  }

  test("sampling queries prune the text column off the parquet scan") {
    for (q <- Seq("corpus_sample_stratified", "corpus_train_split")) {
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      val readSchemas = plan.linesIterator.filter(_.contains("ReadSchema")).toSeq
      assert(readSchemas.nonEmpty, s"$q: no ReadSchema in plan:\n$plan")
      assert(readSchemas.forall(!_.contains("text")),
        s"$q reads the text column it never uses:\n${readSchemas.mkString("\n")}")
    }
  }

  test("train split partitions the corpus 90/5/5 with no doc in two splits") {
    val out = SparkEntry.queries("corpus_train_split")(spark, sf).collect()
    val bySplit = out.groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    val total = bySplit.values.sum.toDouble
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(math.abs(bySplit("train") / total - 0.90) < 0.05)
    assert(math.abs(bySplit("val") / total - 0.05) < 0.03)
    assert(math.abs(bySplit("test") / total - 0.05) < 0.03)
    // the splits exhaust the corpus exactly (counts sum to |documents|)
    assert(total.toLong == graft.sources.Tables.documents(spark, sf).count())
  }

  test("corpus mix lands on the 4:3:2:1 band targets with the binding band kept whole") {
    val docs = graft.sources.Tables.documents(spark, sf)
    def band(src: String): Int = src.drop(3).toInt % 4
    val totals = docs.groupBy(col("source")).count().collect()
      .map(r => band(r.getString(0)) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val out = SparkEntry.queries("corpus_mix")(spark, sf).collect()
    val got = out.groupBy(r => band(r.getString(2))).view
      .mapValues(_.length.toLong).toMap
    // band weights 0.08/0.06/0.04/0.02 per source over uniform sources →
    // acceptance rates 1.0 / 0.75 / 0.5 / 0.25 (band 0 binds)
    val wantRate = Map(0 -> 1.0, 1 -> 0.75, 2 -> 0.5, 3 -> 0.25)
    for ((b, want) <- wantRate) {
      val rate = got.getOrElse(b, 0L).toDouble / totals(b)
      assert(math.abs(rate - want) < 0.12, s"band $b rate $rate want $want")
    }
    // the binding band loses at most the 1-in-65536 floor quirk
    assert(totals(0) - got(0) <= 1 + totals(0) / 1000)
    // membership is a pure function of doc_id (partitioning-independent)
    val again = SparkEntry.queries("corpus_mix")(spark, sf)
      .repartition(7).collect().map(_.getLong(0)).toSet
    assert(again == out.map(_.getLong(0)).toSet)
    // the corpus side never shuffles: threshold join is broadcast-only
    val plan = SparkEntry.queries("corpus_mix")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), s"expected broadcast-only join:\n$plan")
  }

  test("per-group sample takes exactly k per language and matches the one-window answer") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val totals = docs.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = SparkEntry.queries("corpus_sample_per_group")(spark, sf).collect()
    val got = out.groupBy(_.getString(0)).view.mapValues(_.length.toLong).toMap
    for ((lang, tot) <- totals)
      assert(got.getOrElse(lang, 0L) == math.min(50L, tot), s"lang $lang")
    // exactness of the two-level top-k: same (lang, doc_id) set as the
    // naive single window over each full language partition
    val naive = docs
      .select(md5(col("doc_id").cast("string")).as("coin"), col("doc_id"), col("lang"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lang")).orderBy(col("coin"))))
      .filter(col("rk") <= 50)
      .collect().map(r => (r.getString(2), r.getLong(1))).toSet
    assert(out.map(r => (r.getString(0), r.getLong(2))).toSet == naive)
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

  test("decontaminate: train doc sharing a 5-gram with the eval set dropped, others kept") {
    import spark.implicits._
    import graft.operators.TrainPrep
    val evalText = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (20L, evalText, "en", "t", 0L),                                  // eval (id % 20 == 0)
      (1L, "prefix words alpha beta gamma delta epsilon suffix", "en", "t", 0L), // shares a 5-gram
      (2L, "completely different words with no overlap at all", "en", "t", 0L),
      (3L, "alpha beta gamma unshared tail words here now", "en", "t", 0L))      // only a 3-gram
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val kept = TrainPrep.corpusDecontaminateFrom(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L), s"got $kept")
  }

  test("weighted sample keeps exactly the coins below each doc's own threshold") {
    import org.apache.spark.sql.functions._
    val kept = SparkEntry.queries("corpus_sample_weighted")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    // independent recompute: md5-prefix-as-int vs the integer threshold
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars"),
        conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("long").as("coin"))
      .collect()
    docs.foreach { r =>
      val w16 = math.min(58982L, math.max(6554L, r.getLong(1) * 65536L / 4000L))
      val expectKeep = r.getLong(2) < w16
      assert(kept.contains(r.getLong(0)) == expectKeep,
        s"doc ${r.getLong(0)}: coin ${r.getLong(2)} vs w16 $w16")
      if (expectKeep) assert(kept(r.getLong(0)) == w16)
    }
    // longer docs keep more often overall (weights actually bite)
    assert(kept.nonEmpty && kept.size < docs.length)
  }

  test("text_pack_ffd: caps respected, exactly-once, first-fit bound, deterministic") {
    val cap = 2048L
    def run() = SparkEntry.queries("text_pack_ffd")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4)))
    val rows = run()
    assert(rows.nonEmpty)
    // exactly-once assignment
    assert(rows.map(_._2).distinct.length == rows.length)
    // per-(shard, bin): pack_fill is the exact token sum, and no bin
    // overflows the cap unless it is a singleton over-cap doc
    rows.groupBy(t => (t._1, t._4)).foreach { case ((s, b), ds) =>
      val total = ds.map(_._3).sum
      assert(ds.map(_._5).distinct.length == 1 && ds.head._5 == total,
        s"bin ($s,$b) fill mismatch")
      assert(total <= cap || ds.length == 1, s"bin ($s,$b) overflows: $total")
    }
    // first-fit quality: bins <= 2*ceil(total/cap)+1 per shard
    // (first-fit <= 2*OPT, OPT >= the fractional lower bound)
    rows.groupBy(_._1).foreach { case (s, ds) =>
      val bins = ds.map(_._4).distinct.length
      val lower = (ds.map(_._3).sum + cap - 1) / cap
      assert(bins <= 2 * lower + 1, s"shard $s: $bins bins vs lower bound $lower")
    }
    // group-iterator order must not matter (the fold sorts internally)
    assert(run().toSet == rows.toSet)
  }

  test("FirstFitTree is bit-identical to the reference linear first-fit scan on adversarial folds") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val cap = 2048L
    def linearScan(toks: Seq[Long]): (Seq[Int], Seq[Long]) = {
      val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
      val bs = toks.map { n =>
        var b = 0
        while (b < fills.length && fills(b) + n > cap) b += 1
        if (b == fills.length) fills += 0L
        fills(b) += n
        b
      }
      (bs, fills.toSeq)
    }
    // adversarial token mixes: tiny fillers, near-cap, over-cap
    // singletons, exact-fit boundaries, zeros
    val g = Gen.listOfN(200, Gen.frequency(
      4 -> Gen.chooseNum(1L, 300L),
      3 -> Gen.chooseNum(1000L, 2048L),
      1 -> Gen.chooseNum(2049L, 5000L),
      1 -> Gen.oneOf(0L, 1024L, 2048L)))
    (0 until 60).foreach { i =>
      val toks = g.apply(Gen.Parameters.default, Seed(7L + i)).get
        .sortBy(-_) // the FFD order the operator feeds it
      val (wantB, wantF) = linearScan(toks)
      val ff = new graft.operators.TrainPrep.FirstFitTree(cap)
      val gotB = toks.map(ff.assign)
      assert(gotB == wantB, s"case $i: assignments diverge")
      wantF.indices.foreach { b =>
        assert(ff.fill(b) == wantF(b), s"case $i: fill($b)")
      }
    }
  }

  test("pipeline_funnel: stages monotone non-increasing, raw = corpus, quality agrees") {
    val rows = SparkEntry.queries("corpus_pipeline_funnel")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows.size == 4)
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(rows("0_raw")._1 == nDocs && rows("0_raw")._3 == 1.0)
    val order = Seq("0_raw", "1_exact_dedup", "2_near_dedup", "3_quality").map(rows)
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(b._1 <= a._1 && b._2 <= a._2, s"funnel not monotone: $a -> $b")
    }
    // the final stage can never keep more than the quality gate alone
    val nKeep = SparkEntry.queries("corpus_quality_gate")(spark, sf)
      .collect().count(_.getBoolean(7))
    assert(rows("3_quality")._1 <= nKeep)
  }

  test("pipeline_funnel staged twin == in-query (shared oracle SQL, warm cache path too)") {
    // the staged flags must reproduce the composed stage semantics
    // exactly — any drift (join vs flag logic, null token sums on an
    // empty stage, rounding) must be caught here, not at the driver gate
    val inQuery = SparkEntry.queries("corpus_pipeline_funnel")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val staged = SparkEntry.queries("corpus_pipeline_funnel_staged")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(staged == inQuery, "staged funnel diverged from in-query")
    val warm = SparkEntry.queries("corpus_pipeline_funnel_staged")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(warm == inQuery, "warm cache-hit path diverged")
  }

  test("source_report: docs conserve, dup counts pair up, shares in range") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("corpus_source_report")(spark, sf).collect()
    assert(rows.nonEmpty)
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == nDocs, "per-source doc counts conserve")
    // a duplicated text involves >= 2 docs somewhere in the corpus
    val totalDup = rows.map(_.getLong(5)).sum
    assert(totalDup == 0 || totalDup >= 2, s"dup total $totalDup")
    rows.foreach { r =>
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0, "avg_quality in (0,1]")
      assert(r.getDouble(6) >= 0.0 && r.getDouble(6) <= 1.0, "dup_share in [0,1]")
    }
  }

  test("ngram_novelty: first doc owns its grams, copies add nothing, overlap is partial") {
    import spark.implicits._
    val block = (1 to 9).map(i => s"n$i").mkString(" ") // 9 words -> 5 distinct 5-grams
    val docs = Seq(
      (1L, block), // introduces all 5 grams -> novelty 1.0
      (2L, block), // exact copy, later id -> novelty 0.0
      // 5 novel grams from m1..m9, then the copied block re-contributes
      // its 5 known grams; boundary grams mix m/n words -> also novel
      (3L, (1 to 9).map(i => s"m$i").mkString(" ") + " " + block),
      (4L, "too short for grams")
    ).toDF("doc_id", "text")
    val got = TrainPrep.corpusNgramNoveltyFrom(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((5L, 5L)), s"doc1: ${got(1L)}")
    assert(got(2L) == ((5L, 0L)), s"doc2: ${got(2L)}")
    // doc3: 18 words -> 14 grams, the 5 block-internal ones are known
    assert(got(3L) == ((14L, 9L)), s"doc3: ${got(3L)}")
    assert(!got.contains(4L), "sub-5-word doc emits no row")
  }

  test("dup_spans: interval union, partial-span trim, and exact-copy drop on planted fixtures") {
    import spark.implicits._
    val s = (1 to 10).map(i => s"s$i").mkString(" ") // shared 10-word block
    val docs = Seq(
      // doc 1: block at positions 5..14 of 20 → dup grams 5,6,7; union = 10 tokens → trim
      (1L, (1 to 5).map(i => s"a$i").mkString(" ") + " " + s + " " + (1 to 5).map(i => s"b$i").mkString(" ")),
      // doc 2: same block at positions 2..11 of 20 → dup grams 2,3,4; union = 10 → trim
      (2L, "c1 c2 " + s + " " + (1 to 8).map(i => s"d$i").mkString(" ")),
      // doc 3: unique throughout → keep
      (3L, (1 to 12).map(i => s"e$i").mkString(" ")),
      // docs 4/5: exact copies (10 words) → all 3 grams dup, union = 10/10 → drop
      (4L, (1 to 10).map(i => s"f$i").mkString(" ")),
      (5L, (1 to 10).map(i => s"f$i").mkString(" "))
    ).toDF("doc_id", "text")
    val got = TrainPrep.corpusDupSpansFrom(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4), r.getString(6))).toMap
    assert(got(1L) == ((3L, 10L, "trim")), s"doc1: ${got(1L)}")
    assert(got(2L) == ((3L, 10L, "trim")), s"doc2: ${got(2L)}")
    assert(got(3L) == ((0L, 0L, "keep")), s"doc3: ${got(3L)}")
    assert(got(4L) == ((3L, 10L, "drop")), s"doc4: ${got(4L)}")
    assert(got(5L) == ((3L, 10L, "drop")), s"doc5: ${got(5L)}")
  }

  test("token_budget: cascade prefix equals the global window, cut respects budget") {
    import org.apache.spark.sql.expressions.Window
    val got = SparkEntry.queries("corpus_token_budget")(spark, sf).collect()
    assert(got.nonEmpty)
    // budget respected, prefix monotone along the selection order
    assert(got.forall(_.getLong(3) <= 10000L))
    val cums = got.map(_.getLong(3))
    assert(cums.zip(cums.tail).forall { case (a, b) => a < b }, "prefix monotone")
    // bit-equality vs the naive global window (fine at spec scale)
    val docs = graft.sources.Tables.documents(spark, sf)
    val base = docs.select(col("doc_id"),
      expr("CAST(size(array_distinct(split(text, ' '))) * CAST(65536 AS BIGINT)" +
        " DIV size(split(text, ' ')) AS BIGINT)").as("q16"),
      graft.functions.Text.nBpeTokens(col("text")).cast("long").as("n_tokens"))
    val w = Window.orderBy(col("q16").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val ref = base.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= 10000L)
      .orderBy(col("q16").desc, col("doc_id")).collect()
    assert(got.map(_.toSeq).toSeq == ref.map(_.toSeq).toSeq)
  }

  test("dup_trim: trimmed text drops exactly the covered spans, clean docs pass through") {
    import spark.implicits._
    val s = (1 to 10).map(i => s"s$i").mkString(" ")
    val d1words = (1 to 5).map(i => s"a$i") ++ (1 to 10).map(i => s"s$i") ++ (1 to 5).map(i => s"b$i")
    val docs = Seq(
      (1L, d1words.mkString(" ")),                    // block at 5..14 -> trimmed out
      (2L, "c1 c2 " + s + " " + (1 to 8).map(i => s"d$i").mkString(" ")),
      (3L, (1 to 12).map(i => s"e$i").mkString(" ")), // clean
      (4L, (1 to 10).map(i => s"f$i").mkString(" ")), // exact copies -> empty trim
      (5L, (1 to 10).map(i => s"f$i").mkString(" "))
    ).toDF("doc_id", "text")
    val got = TrainPrep.corpusDupTrimFrom(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    def m(sq: Seq[String]) = java.security.MessageDigest.getInstance("MD5")
      .digest(sq.mkString(" ").getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(1L) == ((20L, 10L, m((1 to 5).map(i => s"a$i") ++ (1 to 5).map(i => s"b$i")))))
    assert(got(3L) == ((12L, 12L, m((1 to 12).map(i => s"e$i")))))
    assert(got(4L) == ((10L, 0L, m(Seq()))), s"full dup trims to empty: ${got(4L)}")
  }

  test("dsir: target-vocabulary raw docs outscore off-target raw docs") {
    import spark.implicits._
    val tvoc = (1 to 8).map(i => s"t$i").mkString(" ")  // target vocabulary
    val ovoc = (1 to 8).map(i => s"o$i").mkString(" ")  // off-target vocabulary
    val docs = Seq(
      (20L, tvoc), (40L, tvoc),            // target suite (doc_id % 20 == 0)
      (1L, tvoc), (2L, tvoc),              // raw, target-like
      (3L, ovoc), (4L, ovoc)               // raw, off-target
    ).toDF("doc_id", "text")
    val got = TrainPrep.corpusDsirWeightsFrom(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L), "weights only for raw docs")
    assert(got(1L) == got(2L) && got(3L) == got(4L), "identical docs tie")
    assert(got(1L) > got(3L),
      s"target-like ${got(1L)} must outscore off-target ${got(3L)}")
  }

  test("corpus_length_hist: doc/token conservation, shares sum to 1 per lang, buckets exact") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("corpus_length_hist")(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = graft.sources.Tables.documents(spark, sf)
    assert(rows.map(_.getLong(3)).sum == docs.count(), "every doc in one bucket")
    rows.groupBy(_.getString(0)).values.foreach { g =>
      assert(math.abs(g.map(_.getDouble(4)).sum - 1.0) <= 1e-4,
        s"shares sum per lang: ${g.head.getString(0)}")
    }
    rows.foreach { r =>
      val (b, lo, nd, st) = (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(5))
      assert(lo == (1L << b), s"bucket floor: $r")
      // token mass consistent with the bucket bounds
      assert(st >= nd * lo && st < nd * (lo << 1), s"mass outside bucket: $r")
    }
  }

  test("corpus_vocab_growth: conservation, monotone cum, bucket 0 introduces its own words") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("corpus_vocab_growth")(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == (0 to 9), "all ten buckets present")
    val docs = graft.sources.Tables.documents(spark, sf)
    assert(rows.map(_.getLong(1)).sum == docs.count(), "every doc in one bucket")
    val vocab = docs.select(explode(split(col("text"), " ")).as("w"))
      .select(col("w")).distinct().count()
    assert(rows.map(_.getLong(2)).sum == vocab, "every word introduced exactly once")
    assert(rows.last.getLong(3) == vocab, "cum ends at the full vocabulary")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(3) >= a.getLong(3), "cum is monotone")
    }
    // bucket 0's new words = its own distinct words (nothing seen before it)
    val n = docs.agg(max(col("doc_id")) + 1).first().getLong(0)
    val b0 = docs.filter(col("doc_id") * 10 < n)
      .select(explode(split(col("text"), " ")).as("w")).distinct().count()
    assert(rows.head.getLong(2) == b0, "bucket 0 introduces exactly its vocabulary")
  }

  test("decontaminate: both probe joins broadcast — the corpus side never shuffles") {
    val plan = SparkEntry.queries("corpus_decontaminate")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), s"expected broadcast-only joins:\n$plan")
  }
}
