package graft

import org.apache.spark.sql.functions._
import graft.functions.Text

/** Semantic checks for the text suite beyond oracle parity. */
class TextSpec extends SparkSpec {

  test("text_winnow_fp: matches a literal re-simulation of the paper's algorithm") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("text_winnow_fp")(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.nonEmpty)
    val hs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), graft.functions.Text.shingleHashes(col("text"), 3).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val w = 4
    hs.foreach { case (id, h) =>
      val r = rows(id)
      val n = h.length
      assert(r.getInt(1) == n)
      if (n == 0) assert(r.getInt(3) == 0)
      else {
        // literal winnowing: each window picks its min, rightmost on ties
        val sel = (0 until math.max(n - w + 1, 1)).map { s =>
          val win = h.slice(s, math.min(s + w, n))
          val m = win.min
          val p = s + win.lastIndexOf(m)
          (p, m)
        }.distinct
        assert(r.getInt(3) == sel.length, s"doc $id n_selected")
        assert(r.getString(5) == sel.map(_._2).min, s"doc $id sel_min")
        assert(r.getString(6) == sel.map(_._2).max, s"doc $id sel_max")
        // the winnowing coverage guarantee: selected positions are never
        // more than w apart (every window contributed a selection)
        val ps = sel.map(_._1).sorted
        ps.zip(ps.drop(1)).foreach { case (a, b) => assert(b - a <= w, s"doc $id gap") }
      }
    }
  }

  test("text_readability: formula/band wiring exact, whole-doc syllable count = per-word sum") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("text_readability")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, s, sy) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(s >= 1, "sentence count floored at 1")
      if (w == 0) { assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6)) }
      else {
        val f = 206.835 - 1.015 * (w.toDouble / s) - 84.6 * (sy.toDouble / w)
        assert(math.abs(r.getDouble(4) - f) < 1e-3, s"flesch wiring doc ${r.getLong(0)}")
        val g = 0.39 * (w.toDouble / s) + 11.8 * (sy.toDouble / w) - 15.59
        assert(math.abs(r.getDouble(5) - g) < 1e-3, s"grade wiring doc ${r.getLong(0)}")
        val fl = r.getDouble(4)
        val expect =
          if (fl >= 90) "5_very_easy" else if (fl >= 70) "4_easy"
          else if (fl >= 50) "3_standard" else if (fl >= 30) "2_difficult"
          else "1_very_hard"
        assert(r.getString(6) == expect, s"band doc ${r.getLong(0)}")
      }
    }
    // spaces break vowel runs, so the whole-doc regexp count must equal
    // the per-word sum (the claim that lets the op skip the explode)
    val perWord = graft.sources.Tables.documents(spark, sf).limit(50)
      .select(col("doc_id"),
        size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0))).as("whole"),
        aggregate(transform(split(lower(col("text")), " "),
          wd => size(regexp_extract_all(wd, lit("[aeiouy]+"), lit(0)))),
          lit(0), (acc, x) => acc + x).as("summed"))
      .collect()
    perWord.foreach(r => assert(r.getInt(1) == r.getInt(2), s"doc ${r.getLong(0)}"))
  }

  test("quality_gate: keep is the AND of its gates, repetition gate mirrors text_repetition") {
    val rows = SparkEntry.queries("corpus_quality_gate")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val gates = (2 to 6).map(r.getBoolean)
      assert(r.getBoolean(7) == gates.forall(identity), s"doc ${r.getLong(0)}")
    }
    // non-degenerate verdict mix on the corpus
    assert(rows.exists(_.getBoolean(7)) && rows.exists(!_.getBoolean(7)))
    val rep = SparkEntry.queries("text_repetition")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    rows.foreach(r => assert(r.getBoolean(6) == !rep(r.getLong(0)),
      s"doc ${r.getLong(0)} repetition gate"))
  }

  test("gate_strictness: cumulatives conserve the corpus and agree with the per-doc verdicts") {
    val rows = SparkEntry.queries("corpus_gate_strictness")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty && rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
    // the loosest cutoff retains everything: cum at min n_gates = totals
    val docs = SparkEntry.queries("corpus_quality_gate")(spark, sf).collect()
    assert(rows.head._4 == docs.length && math.abs(rows.head._6 - 1.0) < 1e-9)
    // the strictest row's cumulative = the gate query's keep count
    val keeps = docs.count(_.getBoolean(7))
    val strict = rows.last
    assert(strict._1 == 5 || keeps == 0)
    if (strict._1 == 5)
      assert(strict._4 == keeps, s"cum_docs at 5 gates ${strict._4} vs keep=$keeps")
    // cumulative really is the suffix sum of the per-level counts
    rows.reverse.foldLeft((0L, 0L)) { case ((cd, ct), r) =>
      assert(r._4 == cd + r._2 && r._5 == ct + r._3, s"level ${r._1}")
      (r._4, r._5)
    }
    // fractions monotone: relaxing the cutoff only retains more
    assert(rows.map(_._6).toSeq == rows.map(_._6).sorted.reverse.toSeq)
    assert(rows.map(_._7).toSeq == rows.map(_._7).sorted.reverse.toSeq)
  }

  test("langid_eval: per-declared-lang shares sum to 1, counts conserve") {
    val rows = SparkEntry.queries("corpus_langid_eval")(spark, sf).collect()
    assert(rows.nonEmpty)
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == nDocs, "cells conserve the corpus")
    rows.groupBy(_.getString(0)).foreach { case (lang, cells) =>
      val s = cells.map(_.getDouble(3)).sum
      assert(math.abs(s - 1.0) < 1e-3, s"$lang shares sum $s")
    }
  }

  test("fingerprint is whitespace/case-insensitive but content-sensitive") {
    import spark.implicits._
    val df = Seq("Hello  World", "hello world", "hello worlds")
      .toDF("text").select(Text.fingerprint(col("text")).as("fp"))
    val fps = df.collect().map(_.getString(0))
    assert(fps(0) == fps(1) && fps(1) != fps(2))
  }

  test("nPunct counts punctuation characters, not the alphanumeric complement") {
    import spark.implicits._
    val rows = Seq("ab,c!", "no punct here", "!!!", "").toDF("text")
      .select(Text.nPunct(col("text")).as("n")).collect().map(_.getInt(0))
    assert(rows.toSeq == Seq(2, 0, 3, 0))
  }

  test("shingles: n-2 shingles for n words, empty under k") {
    import spark.implicits._
    val rows = Seq("a b c d e", "a b").toDF("text")
      .select(size(Text.shingles(col("text"), 3)).as("n")).collect()
    assert(rows(0).getInt(0) == 3 && rows(1).getInt(0) == 0)
  }

  test("langid scores and ratios are in range over the corpus") {
    val rows = SparkEntry.queries("text_langid")(spark, sf).collect()
    assert(rows.nonEmpty)
    val preds = rows.map(_.getAs[String]("pred_lang")).toSet
    assert(preds.subsetOf(Set("en", "es", "de", "fr", "und")))
    val q = SparkEntry.queries("text_quality")(spark, sf).collect()
    q.foreach { r =>
      val stop = r.getAs[Double]("stop_ratio"); val uniq = r.getAs[Double]("uniq_ratio")
      assert(stop >= 0 && stop <= 1 && uniq > 0 && uniq <= 1)
    }
  }

  test("repetition signals: bigram identity, bounds, and a planted repetitive doc") {
    val rows = SparkEntry.queries("text_repetition")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, ndw, nb, ndb) = (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
      assert(nb == nw - 1, "every adjacent word pair is one bigram")
      assert(ndw >= 1 && ndw <= nw && ndb >= 1 && ndb <= nb)
      assert(r.getBoolean(5) == (10L * ndb < 7L * nb))
    }
    // a doc that is one phrase looped is flagged; fresh prose is not
    import spark.implicits._
    import graft.operators.TextAnalysis
    val planted = Seq(
      (1L, Array.fill(20)("buy cheap pills now").mkString(" "), "en", "t", 0L),
      (2L, (1 to 80).map(i => s"w$i").mkString(" "), "en", "t", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val bi = Text.shingles(col("text"), 2)
    val got = planted.select(col("doc_id"),
        (lit(10) * size(array_distinct(bi)) < lit(7) * size(bi)).as("rep"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got(1L) && !got(2L))
  }

  test("heavy_hitters_cms: estimates never undercount and overshoot within eps*N") {
    val rows = SparkEntry.queries("heavy_hitters_cms")(spark, sf).collect()
    assert(rows.length == 20)
    val totalTokens = graft.sources.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0).count()
    val slack = (1e-4 * totalTokens).ceil.toLong
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"CMS undercounted ${r.getString(0)}: $est < $exact")
      assert(est - exact <= slack,
        s"CMS overshoot ${est - exact} beyond eps*N=$slack for ${r.getString(0)}")
    }
    // descending by exact count, deterministic tie-break
    val ns = rows.map(_.getLong(1)).toSeq
    assert(ns == ns.sorted.reverse)
  }

  test("text_entropy: bounded by ln(n_distinct), repetition scores below diversity") {
    val rows = SparkEntry.queries("text_entropy")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nd, ent, uni) = (r.getInt(2), r.getDouble(3), r.getDouble(4))
      assert(ent >= 0.0 && ent <= math.log(math.max(nd, 1).toDouble) + 1e-6, s"$r")
      assert(uni >= 0.0 && uni <= 1.0 + 1e-9, s"$r")
    }
    // planted extremes: pure repetition -> 0; 40 distinct words -> ln(40)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq((1L, Seq.fill(40)("spam").mkString(" ")),
      (2L, (0 until 40).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val planted = graft.operators.TextAnalysis.entropyOf(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(planted(1L) == 0.0, s"pure repetition must score zero entropy: $planted")
    assert(math.abs(planted(2L) - math.log(40.0)) < 1e-4,
      s"40 distinct words ~ ln(40): $planted")
  }

  test("text_entropy: one-pass sorted-run fold is bit-equal to the naive per-distinct formula") {
    // The naive O(n_distinct × n) shape the operator replaced: transform
    // over sorted distinct words, each re-scanning the array. Same fold
    // order ⇒ the one-pass plan must be BIT-identical, not just close.
    import org.apache.spark.sql.functions._
    val ws = split(col("text"), " ")
    val n = size(ws)
    val terms = transform(sort_array(array_distinct(ws)),
      w => {
        val c = size(filter(ws, x => x === w))
        (c.cast("double") / n) * log(c.cast("double") / n)
      })
    val naiveEnt = -aggregate(terms, lit(0.0), (acc, x) => acc + x)
    val docs = graft.sources.Tables.documents(spark, sf)
    val naive = docs.select(col("doc_id"), (round(naiveEnt, 6) + 0.0).as("entropy"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val fast = graft.operators.TextAnalysis.entropyOf(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(fast.keySet == naive.keySet)
    fast.foreach { case (id, e) =>
      assert(java.lang.Double.doubleToRawLongBits(e) ==
        java.lang.Double.doubleToRawLongBits(naive(id)),
        s"doc $id: one-pass $e != naive ${naive(id)}")
    }
    // edge shapes: empty text ([""] token), single word, all-equal runs
    import spark.implicits._
    val edge = Seq((1L, ""), (2L, "solo"), (3L, "b a b a b"))
      .toDF("doc_id", "text")
    val e = graft.operators.TextAnalysis.entropyOf(edge)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
    assert(e(1L) == ((1, 1, 0.0)))
    assert(e(2L) == ((1, 1, 0.0)))
    val expected3 = -(3.0 / 5 * math.log(3.0 / 5) + 2.0 / 5 * math.log(2.0 / 5))
    assert(math.abs(e(3L)._3 - expected3) < 1e-6, s"$e")
  }
}
