package graft

import org.apache.spark.sql.functions._
import graft.sources.Xlsx
import graft.warehouse.Warehouse

/** Drives the dependency-free xlsx reader against the reference's OWN
  * sample workbooks (python_version/sample_data) — the files a real user
  * of the reference holds. */
class XlsxSpec extends SparkSpec {

  private val sample = "/root/reference/python_version/sample_data"
  private val income = s"$sample/MM.YYYY Compant Depts Income Statement updated.xlsx"
  private val warehouseWb = s"$sample/Example_Company Data Warehouse.xlsx"

  test("cellsDf reads every department sheet of the real income workbook") {
    val sheets = Xlsx.cellsDf(spark, income)
      .select("sheet").distinct().collect().map(_.getString(0)).sorted
    assert(sheets.length == 8 && sheets.forall(_.matches("DEPARTMENT 1\\d\\d-F")))
  }

  test("statementsXlsx yields the statements shape below each detected header row") {
    val st = Xlsx.statementsXlsx(spark, income)
    val rows = st.collect()
    assert(rows.nonEmpty)
    // header/banner rows are gone: nothing at or above the header (row 2)
    assert(rows.forall(_.getLong(2) > 2))
    val labels = rows.map(_.getString(3)).toSet
    assert(labels.contains("REVENUES") && labels.contains("EXPENSES"))
    assert(labels.exists(_.matches("\\d{3,4}")), s"numeric GL labels expected: $labels")
  }

  test("the warehouse pipeline runs off the real workbook end to end") {
    val fact = Warehouse.factFrom(Xlsx.statementsXlsx(spark, income))
    val rows = fact.select("sheet", "gl_code", "category", "amount").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getString(1) != null && r.getString(1).length == 4))
    assert(rows.map(_.getString(2)).toSet.subsetOf(Set("Revenue", "Expenses")))
  }

  test("sheetByHeaders extracts the GL reference sheet from the warehouse workbook") {
    val gl = Xlsx.sheetByHeaders(spark, warehouseWb, Seq("GL#", "Description"))
      .filter(col("sheet") === "GL")
    val rows = gl.select(col("`GL#`"), col("DESCRIPTION")).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getString(0).matches("\\d{4}")))
  }
}
