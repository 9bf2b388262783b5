package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** Semantic checks for the BPE trainer beyond oracle parity: a full
  * driver-side reference re-simulation (plain Scala collections — the
  * textbook algorithm, independently coded) must reproduce the merge
  * table AND the fertility panel exactly, and the greedy fold's
  * overlap/edge behavior is pinned on hand cases. */
class BpeSpec extends SparkSpec {

  /** Reference BPE: word-freq table, `rounds` argmax merges with the
    * greedy left-to-right single-pass rewrite. */
  private def referenceBpe(texts: Seq[String], rounds: Int)
      : (Seq[(Int, String, String, Long)], Map[String, List[String]]) = {
    val wf = texts.flatMap(_.split(' ')).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    var syms: Map[String, List[String]] =
      wf.map { case (w, _) => w -> w.map(_.toString).toList }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, ss) <- syms; Seq(a, b) <- ss.sliding(2) if ss.size >= 2)
        pc((a, b)) = pc.getOrElse((a, b), 0L) + wf(w)
      val ((a, b), c) = pc.minBy { case ((a, b), c) => (-c, a, b) }
      merges += ((r, a, b, c))
      syms = syms.map { case (w, ss) =>
        val out = scala.collection.mutable.ListBuffer(ss.head)
        for (s <- ss.tail)
          if (out.last == a && s == b) out(out.size - 1) = a + b
          else out += s
        w -> out.toList
      }
    }
    (merges.result(), syms)
  }

  test("merge table matches an independent reference BPE on sf0.001") {
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0)).toSeq
    val (expMerges, _) = referenceBpe(texts, Bpe.Rounds)
    val got = Bpe.textBpeTrain(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == expMerges)
  }

  test("fertility panel matches the reference rewrite exactly on sf0.001") {
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val (_, syms) = referenceBpe(rows.map(_._2), Bpe.Rounds)
    val agg = scala.collection.mutable.Map.empty[String, (Long, Long, Long)]
    for ((lang, t) <- rows; w <- t.split(' ') if w.nonEmpty) {
      val (nw, nt, nc) = agg.getOrElse(lang, (0L, 0L, 0L))
      agg(lang) = (nw + 1, nt + syms(w).size, nc + w.length)
    }
    val got = Bpe.textBpeFertility(spark, sf).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    }.toMap
    assert(got.keySet == agg.keySet)
    def rnd6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for ((lang, (nw, nt, nc)) <- agg)
      assert(got(lang) == ((nw, nt, nc,
        rnd6(nt.toDouble / nw.toDouble), rnd6(nc.toDouble / nt.toDouble))),
        s"lang $lang")
  }

  test("per-doc encode matches the reference rewrite exactly on sf0.001") {
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val (_, syms) = referenceBpe(rows.map(_._2), Bpe.Rounds)
    val exp = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
    for ((id, t) <- rows; w <- t.split(' ') if w.nonEmpty) {
      val (nw, nt, nc) = exp.getOrElse(id, (0L, 0L, 0L))
      exp(id) = (nw + 1, nt + syms(w).size, nc + w.length)
    }
    val got = Bpe.textBpeEncode(spark, sf).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    }.toMap
    assert(got.keySet == exp.keySet) // docs with no words absent, both sides
    def rnd6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for ((id, (nw, nt, nc)) <- exp)
      assert(got(id) == ((nw, nt, nc,
        rnd6(nt.toDouble / nw.toDouble), rnd6(nc.toDouble / nt.toDouble))),
        s"doc $id")
    // the per-doc panel sums to the corpus curve's final round
    val corpusTokens = Bpe.textBpeCurve(spark, sf).collect()
      .filter(_.getInt(0) == Bpe.Rounds).head.getLong(4)
    assert(got.values.map(_._2).sum == corpusTokens,
      "per-doc token counts must sum to the round-8 corpus total")
  }

  test("greedy fold: 'aaa' under (a,a) merges non-overlapping; merged token never re-merges") {
    import spark.implicits._
    // the registered operator's own fold expression, on hand cases
    def foldOf(syms: Seq[String], a: String, b: String): Seq[String] =
      Seq((a, b)).toDF("a", "b")
        .withColumn("syms", typedLit(syms))
        .selectExpr(s"${Bpe.mergeFold} AS m")
        .collect().head.getSeq[String](0)
    // overlap: only non-overlapping occurrences merge, left to right
    assert(foldOf(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(foldOf(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    // a freshly merged token does not cascade into the next pair
    assert(foldOf(Seq("a", "b", "b"), "a", "b") == Seq("ab", "b"))
    // single symbol is the init, untouched
    assert(foldOf(Seq("x"), "a", "b") == Seq("x"))
    // the independent reference agrees on the same edges
    val (m, syms) = referenceBpe(Seq("aaa aaa baa"), 1)
    assert(m.head._2 == "a" && m.head._3 == "a")
    assert(syms("aaa") == List("aa", "a"))
    assert(syms("baa") == List("b", "aa"))
  }

  test("compression curve matches the reference rewrite per round; monotone; row 0 is the char baseline") {
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0)).toSeq
    val wf = texts.flatMap(_.split(' ')).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    // per-round token totals from the reference
    val exp = scala.collection.mutable.ArrayBuffer[Long](
      wf.map { case (w, f) => f * w.length }.sum)
    for (r <- 1 to Bpe.Rounds) {
      val (_, syms) = referenceBpe(texts, r)
      exp += wf.map { case (w, f) => f * syms(w).size }.sum
    }
    val got = Bpe.textBpeCurve(spark, sf).collect()
    assert(got.length == Bpe.Rounds + 1)
    got.foreach { r =>
      assert(r.getLong(4) == exp(r.getInt(0)), s"round ${r.getInt(0)}")
    }
    assert(got.head.getDouble(5) == 1.0, "char baseline: one char per token")
    assert(got.head.isNullAt(1), "round 0 has no merge")
    got.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(4) <= a.getLong(4), "tokens monotone non-increasing")
    case _ => ()
    }
  }

  test("single-character words survive every round unchanged") {
    val (_, syms) = referenceBpe(Seq("a b ab ab ab cd cd"), 2)
    assert(syms("a") == List("a") && syms("b") == List("b"))
    assert(syms("ab") == List("ab"))
  }
}
