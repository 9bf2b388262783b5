package graft

import org.apache.spark.sql.functions._
import graft.expressions.TextHashes
import org.apache.spark.unsafe.types.UTF8String

/** Native sketch expressions: registration, codegen/eval parity,
  * edge-case handling. */
class ExpressionsSpec extends SparkSpec {

  import spark.implicits._

  test("shingle_minhashes registered via GraftExtensions and deterministic") {
    val df = Seq("a b c d e", "a b c d e", "x y z w v").toDF("text")
      .select(expr("shingle_minhashes(text, 3, 8)").as("sig"))
    val rows = df.collect().map(_.getSeq[Long](0))
    assert(rows(0).length == 8)
    assert(rows(0) == rows(1), "same text, same signature")
    assert(rows(0) != rows(2))
  }

  test("codegen result matches direct kernel eval") {
    val texts = Seq("the quick brown fox jumps", "a b", "")
    val viaSql = texts.toDF("text")
      .select(expr("shingle_minhashes(text, 3, 4)").as("s"),
        expr("simhash64(text)").as("h"))
      .collect()
    texts.zipWithIndex.foreach { case (t, i) =>
      val direct = TextHashes.shingleMinHashes(UTF8String.fromString(t), 3, 4)
      assert(viaSql(i).getSeq[Long](0) == direct.toLongArray().toSeq)
      assert(viaSql(i).getLong(1) == TextHashes.simHash64(UTF8String.fromString(t)))
    }
  }

  test("short/empty text yields empty signature, null stays null") {
    val rows = Seq(Some("a b"), Some(""), None).toDF("text")
      .select(expr("shingle_minhashes(text, 3, 4)").as("s")).collect()
    assert(rows(0).getSeq[Long](0).isEmpty)
    assert(rows(1).getSeq[Long](0).isEmpty)
    assert(rows(2).isNullAt(0))
  }

  test("ShingleMd5s kernel equals transform(shingles, md5) exactly") {
    // includes trailing / consecutive / leading spaces: the kernel must
    // tokenize with split(" ", -1) semantics (keep empty tokens) exactly
    // like the declarative split and DuckDB string_split
    val df = Seq("the quick brown fox jumps over", "a b", "",
      "a b c ", "a b c  ", "a  b c", " a b c", "  ")
      .toDF("text")
      .select(graft.functions.Text.shingleHashes(col("text"), 3).as("kernel"),
        transform(graft.functions.Text.shingles(col("text"), 3), s => md5(s)).as("declarative"))
    df.collect().foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("VectorDot kernel is bit-identical to the declarative fold") {
    val df = Seq((Seq(1.1, -2.2, 3.3, 0.004), Seq(0.5, 1.5, -2.5, 100.0)))
      .toDF("a", "b")
    val r = df.select(
      graft.functions.Vectors.dot(col("a"), col("b")).as("kernel"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("fold"))
      .collect()(0)
    assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
      java.lang.Double.doubleToLongBits(r.getDouble(1)))
  }

  test("VectorQuantError kernel is bit-identical to the declarative chain") {
    // [0, 127.5, 255] makes scale exactly 1.0 and (x-vmin)/scale an exact
    // .5 half — where HALF_UP (Spark round) and rint (HALF_EVEN) diverge;
    // plus random float-ish vectors like the embeddings table carries
    val rnd = new scala.util.Random(7)
    val vecs = Seq(
      Seq(0.0, 127.5, 255.0),
      Seq(-1.5, -0.5, 0.5, 1.5),
      Seq(3.25, 3.25, 3.25),          // zero range -> 1e-12 scale floor
      Seq(0.0)) ++
      (1 to 20).map(_ => Seq.fill(64)(rnd.nextFloat().toDouble * 4 - 2))
    val v = col("v")
    val vmin = array_min(v); val vmax = array_max(v)
    val scale = greatest((vmax - vmin) / 255.0, lit(1e-12))
    val err = transform(v, x => abs(round((x - vmin) / scale) * scale + vmin - x))
    val rows = vecs.toDF("v").select(
      graft.functions.Vectors.quantError(v).as("k"),
      struct(vmin.as("vmin"), vmax.as("vmax"),
        array_max(err).as("max_abs_err"),
        (aggregate(err, lit(0.0), (a, x) => a + x) / size(v)).as("mean_abs_err")).as("d"))
      .collect()
    rows.foreach { r =>
      val k = r.getStruct(0); val d = r.getStruct(1)
      (0 until 4).foreach { i =>
        assert(java.lang.Double.doubleToLongBits(k.getDouble(i)) ==
          java.lang.Double.doubleToLongBits(d.getDouble(i)),
          s"field $i: kernel ${k.getDouble(i)} vs declarative ${d.getDouble(i)}")
      }
    }
  }

  test("simhash64 flips few bits for small edits") {
    val rows = Seq(
      "the quick brown fox jumps over the lazy dog again and again today",
      "the quick brown fox jumps over the lazy cat again and again today")
      .toDF("text").select(expr("simhash64(text)")).collect()
    val d = java.lang.Long.bitCount(rows(0).getLong(0) ^ rows(1).getLong(0))
    assert(d <= 16, s"one-word edit flipped $d bits")
  }
}
