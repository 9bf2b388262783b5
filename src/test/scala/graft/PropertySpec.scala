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
    val cents = samples(Gen.chooseNum(-99999999L, 99999999L), 500) ++
      Seq(0L, -1L, 1L, 99L, 100L, 99999L, 100000L, -100000L, 99999999L)
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

  test("normalizeGlCode accepts exactly 1-4 digit tokens") {
    val raws = (samples(Gen.chooseNum(0, 9999), 200).map(_.toString) ++
      samples(Gen.alphaStr, 50) ++
      samples(Gen.chooseNum(10000, 999999), 50).map(_.toString) ++
      Seq("", "12a4", " 42 ", "0000")).distinct
    val out = raws.toDF("raw")
      .select(col("raw"), Financial.normalizeGlCode(col("raw")).as("gl"))
      .collect().map(r => (r.getString(0), Option(r.getString(1))))
    out.foreach { case (raw, gl) =>
      val t = raw.trim
      val expected =
        if (t.nonEmpty && t.length <= 4 && t.forall(_.isDigit))
          Some(("0000" + t).takeRight(4))
        else None
      assert(gl == expected, s"raw '$raw' -> $gl, want $expected")
    }
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
}
