package graft

import org.apache.spark.sql.functions._
import graft.functions.Text

/** Semantic checks for the text suite beyond oracle parity. */
class TextSpec extends SparkSpec {

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
}
