package graft

import org.apache.spark.sql.functions._
import graft.functions.Financial

/** Unit tests for the financial normalization column functions against the
  * reference's documented edge cases (build_warehouse.py:37-51,
  * Code.gs:237-256). */
class FinancialSpec extends SparkSpec {

  private def evalAmounts(in: Seq[String]): Seq[Option[Double]] = {
    import spark.implicits._
    in.toDF("raw").select(Financial.cleanAmount(col("raw")).as("v"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
  }

  test("cleanAmount: reference edge cases") {
    val cases = Seq(
      "$1,234.50" -> Some(1234.50),
      "(1,234.50)" -> Some(-1234.50),
      "$(1,234.50)" -> Some(-1234.50), // $ stripped BEFORE paren detection
      "( 42 )" -> Some(-42.0),
      "  $12  " -> Some(12.0),
      ".5" -> Some(0.5),
      "5." -> Some(5.0),
      "+5" -> Some(5.0),
      "1e3" -> Some(1000.0),
      "-12.25" -> Some(-12.25),
      "" -> None,
      "   " -> None,
      "N/A" -> None,
      "12(34)" -> None, // interior parens = garbage, not 1234
      "(12(34))" -> None,
      "--5" -> None)
    assert(evalAmounts(cases.map(_._1)) == cases.map(_._2))
  }

  test("normalizeGlCode: strings, numerics, garbage") {
    import spark.implicits._
    val strs = Seq("123", "0042", "9999", "12345", "12a", "", "  7  ")
      .toDF("raw").select(Financial.normalizeGlCode(col("raw")).as("v"))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(strs == Seq(Some("0123"), Some("0042"), Some("9999"), None, None, None, Some("0007")))
    // Excel-origin numeric cells: double 123.0 → "0123" (Code.gs:253)
    val nums = Seq(123.0, 42.0, 9999.0, 12345.0)
      .toDF("raw").select(Financial.normalizeGlCode(col("raw")).as("v"))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(nums == Seq(Some("0123"), Some("0042"), Some("9999"), None))
  }

  test("monthName/monthNumber round-trip") {
    import spark.implicits._
    val df = (1 to 12).toDF("m")
      .select(col("m"), Financial.monthName(col("m")).as("name"))
      .select(col("m"), col("name"), Financial.monthNumber(col("name")).as("back"))
    assert(df.collect().forall(r => r.getInt(0) == r.getInt(2)))
  }

  test("period and department extraction") {
    import spark.implicits._
    val df = Seq("Financials 03.2024.xlsx", "nope", "x 13.2024 y").toDF("f")
      .select(Financial.periodMonth(col("f")).as("m"), Financial.periodYear(col("f")).as("y"))
    val rows = df.collect()
    assert(!rows(0).isNullAt(0) && rows(0).getInt(0) == 3 && rows(0).getInt(1) == 2024)
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
    assert(rows(2).isNullAt(0) && rows(2).getInt(1) == 2024) // month 13 out of range
    val depts = Seq("DEPARTMENT 110-F", "department 7 - f", "SUMMARY", "DEPARTMENT X-F")
      .toDF("s").select(graft.functions.Financial.extractDepartment(col("s")).as("d"))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(depts == Seq(Some("110"), Some("7"), None, None))
  }
}
