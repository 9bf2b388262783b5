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

  test("loadAudit surfaces the reference's failure contract on malformed workbooks") {
    import graft.sources.XlsxParse.Cell
    import graft.sources.XlsxWrite
    // one sheet's cells: the NUMBER/DESCRIPTION/ACTUAL header at row 2
    // (statementsXlsx detects it), then the given (label, amount) rows
    def sheetCells(rows: Seq[(String, String)]): Seq[Cell] = {
      val hdr = Seq(Cell("s", 2, "A", "NUMBER"), Cell("s", 2, "B", "DESCRIPTION"),
        Cell("s", 2, "C", "ACTUAL"))
      hdr ++ rows.zipWithIndex.flatMap { case ((l, a), i) =>
        Seq(Cell("s", 3 + i, "A", l), Cell("s", 3 + i, "B", "d"), Cell("s", 3 + i, "C", a))
      }
    }
    val good = Seq(("REVENUES", ""), ("1010", "$100.00"))
    val dir = java.nio.file.Files.createTempDirectory("graft-audit").toString
    // the reference raises on each of these (build_warehouse.py:27-29, :129);
    // the audit reports them per file instead
    XlsxWrite.writeCells(s"$dir/Financials 13.2024.xlsx",
      Seq(("DEPARTMENT 101-F", sheetCells(good))))
    XlsxWrite.writeCells(s"$dir/Financials latest.xlsx",
      Seq(("DEPARTMENT 102-F", sheetCells(good))))
    XlsxWrite.writeCells(s"$dir/Financials 05.2024.xlsx",
      Seq(("Summary", sheetCells(good))))
    XlsxWrite.writeCells(s"$dir/Financials 06.2024.xlsx",
      Seq(("DEPARTMENT 103-F", sheetCells(
        good ++ Seq(("Total Revenue", "$5.00"), ("2020", "N/A"))))))
    val audit = Warehouse.loadAudit(Xlsx.statementsXlsx(spark, s"$dir/*.xlsx"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(audit(("file", "month_out_of_range")) == 1)
    assert(audit(("file", "no_period_in_filename")) == 1)
    assert(audit(("file", "no_department_sheets")) == 1)
    assert(audit(("file", "ok")) == 1)
    assert(audit(("row", "non_gl_label")) == 1)      // 'Total Revenue'
    assert(audit(("row", "unparseable_amount")) == 1) // 'N/A'
    assert(audit(("row", "ok")) >= 1)
  }

  test("headerAudit mirrors the reference's GL-sheet header identification") {
    import spark.implicits._
    val audit = Warehouse.headerAudit(Seq(
      ("GL Code", "Description"), ("account #", "name"), // identified
      ("Num", "Description"),                            // bad GL header
      ("GL", "Detail")                                   // bad Description header
    ).toDF("gl_hdr", "desc_hdr"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(audit("ok") == 2)
    assert(audit("gl_header_unidentified") == 1)
    assert(audit("desc_header_unidentified") == 1)
  }

  test("writeBack replaces Final/Missing_GL_Mapping and preserves every other sheet cell-for-cell") {
    import graft.sources.XlsxParse
    // real pipeline output as the report payload
    val fact = Warehouse.factFrom(Xlsx.statementsXlsx(spark, income))
    val finalDf = fact
      .select(col("gl_code"), col("category"), col("department"), col("amount"))
      .na.drop()
      .orderBy(col("gl_code"), col("department"), col("amount")).limit(50)
    val missingDf = fact.select(col("gl_code")).distinct().orderBy(col("gl_code")).limit(5)
    val out = java.nio.file.Files.createTempFile("graft-wb-", ".xlsx").toString
    Xlsx.writeBack(warehouseWb, out, finalDf, missingDf)

    def cellsOf(p: String) =
      XlsxParse.cells(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)))
    val orig = cellsOf(warehouseWb)
    val now = cellsOf(out)

    // every non-report sheet survives cell-for-cell (build_warehouse.py:174-179)
    val preservedNames = orig.map(_.sheet).distinct
      .filterNot(s => s == "Final" || s == "Missing_GL_Mapping")
    assert(preservedNames.nonEmpty)
    for (s <- preservedNames) {
      val a = orig.filter(_.sheet == s).map(c => (c.row, c.col, c.value)).sorted
      val b = now.filter(_.sheet == s).map(c => (c.row, c.col, c.value)).sorted
      assert(a == b, s"sheet $s not preserved")
    }

    // Final carries the DataFrame: header row 1 = column names, values below
    val fin = now.filter(_.sheet == "Final")
    val header = fin.filter(_.row == 1).sortBy(c => c.col.length -> c.col).map(_.value)
    assert(header == finalDf.columns.toSeq)
    val expected = finalDf.collect()
    assert(fin.map(_.row).max == expected.length + 1)
    val firstRow = fin.filter(_.row == 2).sortBy(c => c.col.length -> c.col).map(_.value)
    assert(firstRow == expected.head.toSeq.map(_.toString))

    // the written workbook is still consumable by the Spark-side reader
    val gl = Xlsx.sheetByHeaders(spark, out, Seq("GL#", "Description"))
      .filter(col("sheet") === "GL")
    assert(gl.count() > 0)
  }

  test("sheetByHeaders extracts the GL reference sheet from the warehouse workbook") {
    val gl = Xlsx.sheetByHeaders(spark, warehouseWb, Seq("GL#", "Description"))
      .filter(col("sheet") === "GL")
    val rows = gl.select(col("`GL#`"), col("DESCRIPTION")).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getString(0).matches("\\d{4}")))
  }
}
