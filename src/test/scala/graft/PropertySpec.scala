package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.Financial
import graft.warehouse.Statements

/** Property-based tests (raw ScalaCheck generators, deterministic
  * seeds): the parsing functions must invert the formatting functions
  * for EVERY representable amount, not just enumerated edge cases. */
class PropertySpec extends SparkSpec {

  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("cleanAmount inverts fmtAmount for any signed cents") {
    val cents = samples(Gen.chooseNum(-99999999999L, 99999999999L), 500) ++
      Seq(0L, -1L, 1L, 99L, 100L, 99999L, 100000L, -100000L, 99999999L,
        100000000L, 123456789L, -123456789L, 99999999999L, -99999999999L)
    val out = cents.toDF("cents")
      .select(col("cents"),
        Financial.cleanAmount(Statements.fmtAmount(col("cents"))).as("v"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(!r.isNullAt(1), s"cents ${r.getLong(0)} parsed to null")
      assert(r.getDouble(1) == r.getLong(0) / 100.0,
        s"cents ${r.getLong(0)} round-tripped to ${r.getDouble(1)}")
    }
  }

  test("normalizeGlCode accepts 1-4 digit tokens and Excel-numeric NNN.d forms") {
    val raws = (samples(Gen.chooseNum(0, 9999), 200).map(_.toString) ++
      samples(Gen.alphaStr, 50) ++
      samples(Gen.chooseNum(10000, 999999), 50).map(_.toString) ++
      samples(Gen.chooseNum(0, 9999), 50).map(_.toString + ".0") ++
      Seq("", "12a4", " 42 ", "0000", "123.0", "123.45", "12345.0", ".5", "123.")).distinct
    val out = raws.toDF("raw")
      .select(col("raw"), Financial.normalizeGlCode(col("raw")).as("gl"))
      .collect().map(r => (r.getString(0), Option(r.getString(1))))
    val glPat = "^(\\d{1,4})(?:\\.\\d+)?$".r
    out.foreach { case (raw, gl) =>
      val expected = glPat.findFirstMatchIn(raw.trim).map(m => ("0000" + m.group(1)).takeRight(4))
      assert(gl == expected, s"raw '$raw' -> $gl, want $expected")
    }
  }

  test("fmtAmount groups thousands correctly into the millions") {
    val cases = Seq(
      0L -> "$0.00", 99L -> "$0.99", 123456L -> "$1,234.56",
      -123456L -> "$(1,234.56)", 100000000L -> "$1,000,000.00",
      123456789L -> "$1,234,567.89", -123456789L -> "$(1,234,567.89)",
      99999999999L -> "$999,999,999.99")
    val out = cases.map(_._1).toDF("cents")
      .select(col("cents"), Statements.fmtAmount(col("cents")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.foreach { case (c, want) => assert(out(c) == want, s"$c -> ${out(c)}") }
  }

  test("monthName/monthNumber invert each other over the whole domain") {
    val rows = (1 to 12).toDF("m")
      .select(Financial.monthNumber(Financial.monthName(col("m"))).as("back"), col("m"))
      .collect()
    assert(rows.forall(r => r.getInt(0) == r.getInt(1)))
  }

  test("shingle minhash estimate correlates with true Jaccard on random docs") {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val gen = Gen.listOfN(40, Gen.oneOf(vocab)).map(_.mkString(" "))
    val docs = samples(gen, 40).distinct.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
      .select(col("doc_id"),
        array_distinct(graft.functions.Text.shingles(col("text"), 3)).as("sh"),
        graft.operators.Dedup.minhashSignature(col("text")).as("sig"))
      .collect()
    val items = df.map(r => (r.getSeq[String](1).toSet, r.getSeq[Long](2)))
    for (Seq((shA, sigA), (shB, sigB)) <- items.toSeq.combinations(2)) {
      val trueJ = shA.intersect(shB).size.toDouble / shA.union(shB).size
      val est = sigA.zip(sigB).count { case (x, y) => x == y }.toDouble / sigA.length
      assert(math.abs(est - trueJ) <= 0.35,
        s"est $est vs true $trueJ (32 lanes, tolerance 2/sqrt(32))")
    }
  }

  test("BPE mergeFold equals the reference greedy single-pass merge on random symbol lists") {
    // random words over a 3-letter alphabet maximize overlap/adjacency
    // edge cases ("aaa" runs, merged-token lookalikes)
    val symGen = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "ab", "aa"))
    val pairGen = for {
      a <- Gen.oneOf("a", "b", "c", "ab", "aa")
      b <- Gen.oneOf("a", "b", "c", "ab", "aa")
    } yield (a, b)
    val cases = samples(Gen.zip(symGen, pairGen), 120)
    def refMerge(syms: List[String], a: String, b: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer(syms.head)
      for (s <- syms.tail)
        if (out.last == a && s == b) out(out.size - 1) = a + b
        else out += s
      out.toList
    }
    val df = cases.zipWithIndex.map { case (((syms, (a, b))), i) =>
      (i.toLong, syms, a, b)
    }.toDF("i", "syms", "a", "b")
    val got = df.selectExpr("i", s"${graft.operators.Bpe.mergeFold} AS m")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    cases.zipWithIndex.foreach { case (((syms, (a, b))), i) =>
      assert(got(i.toLong) == refMerge(syms, a, b),
        s"case $i: $syms merge ($a,$b)")
    }
  }
}
