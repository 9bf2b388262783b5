package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Deterministic "monthly statement" frames derived from the test star
  * schema — graft's stand-in for the reference's semi-structured Excel
  * workbooks (/root/reference/python_version/build_warehouse.py,
  * google_sheets_version/Code.gs). No statements-shaped table ships in
  * /root/testdata, so one is derived — seed-free and scale-independent —
  * from `orders` (income statements) and `customer` (balance sheets):
  *
  *  - one income-statement "file" per (month, year) named
  *    `Financials mm.yyyy.xlsx`, one "sheet" per department
  *    (`DEPARTMENT NNN-F`, dept = o_custkey%5+100);
  *  - each order is a statement row at position pos (the row's place in
  *    the sheet; detail rows with o_orderkey%100 >= 50 sort after the
  *    EXPENSES marker, below);
  *  - the NUMBER cell is a 1-4 digit GL code ((o_orderkey%40+1)*25), the
  *    non-GL junk line "Total Revenue" for o_orderkey%13==0, or the
  *    Excel-numeric form "NNN.0" for o_orderkey%19==0 (numeric cells
  *    arrive stringified with a decimal part — Code.gs:251-256's
  *    typeof-number branch must truncate them);
  *  - the ACTUAL cell is an accounting-formatted currency string built
  *    from exact integer cents ("$1,234.50"; parens-negative for
  *    o_orderkey%7==0; unparseable "N/A" for o_orderkey%17==0);
  *  - two section-marker rows per sheet: REVENUES before all detail rows
  *    and EXPENSES at the 50%-bucket boundary.
  *
  * Every derivation below also exists as a DuckDB SQL CTE string so the
  * driver's oracle constructs the *identical* raw statements — the SQL
  * side additionally carries ground-truth helper columns (k, sc) so
  * oracle amounts/codes come from arithmetic, NOT from re-running a
  * string parser: a Spark-side parsing bug therefore fails the hash.
  */
object Statements {

  /** pos = (k%100)*POS_BUCKET + k, unique & ordered by bucket. Shared
    * with Warehouse (the upsert's variant selectors key off pos%POS_BUCKET). */
  val POS_BUCKET = 10000000000L

  /** Accounting format from signed integer cents: 1013.70 dollars →
    * "$1,013.70"; negative → "$(1,013.70)". Grouped thousands separators
    * up to $999,999,999.99 (dollar magnitudes above that are out of the
    * supported range — asserted in PropertySpec). Native single-pass
    * kernel (expressions/StatementKernels.fmtCents): the declarative
    * 15-expression concat/lpad chain below is kept as the semantic twin
    * ExpressionsSpec pins the kernel against. */
  def fmtAmount(sc: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.expressions.FormatCents(
      GraftColumnBridge.expression(sc.cast("long"))))
  }

  /** The declarative Column chain — semantic twin for the kernel pin. */
  def fmtAmountDeclarative(sc: Column): Column = {
    val a = abs(sc)
    val d = (a / 100).cast("long")
    val f = (a % 100).cast("string")
    val dk = (d / 1000).cast("long")
    val dm = (d / 1000000).cast("long")
    val grouped =
      when(d >= 1000000,
        concat(dm.cast("string"), lit(","),
          lpad((dk % 1000).cast("string"), 3, "0"), lit(","),
          lpad((d % 1000).cast("string"), 3, "0")))
        .when(d >= 1000,
          concat(dk.cast("string"), lit(","),
            lpad((d % 1000).cast("string"), 3, "0")))
        .otherwise(d.cast("string"))
    val base = concat(grouped, lit("."), lpad(f, 2, "0"))
    when(sc < 0, concat(lit("$("), base, lit(")")))
      .otherwise(concat(lit("$"), base))
  }

  /** Identical formatter as a DuckDB SQL expression over column `c`. */
  def fmtAmountSql(c: String): String =
    s"""CASE WHEN $c < 0 THEN '$$(' ELSE '$$' END ||
       |CASE WHEN abs($c)//100 >= 1000000
       |     THEN CAST(abs($c)//100//1000000 AS VARCHAR) || ',' || lpad(CAST(abs($c)//100//1000 % 1000 AS VARCHAR),3,'0')
       |          || ',' || lpad(CAST(abs($c)//100 % 1000 AS VARCHAR),3,'0')
       |     WHEN abs($c)//100 >= 1000
       |     THEN CAST(abs($c)//100//1000 AS VARCHAR) || ',' || lpad(CAST(abs($c)//100 % 1000 AS VARCHAR),3,'0')
       |     ELSE CAST(abs($c)//100 AS VARCHAR) END ||
       |'.' || lpad(CAST(abs($c) % 100 AS VARCHAR),2,'0') ||
       |CASE WHEN $c < 0 THEN ')' ELSE '' END""".stripMargin.replace("\n", " ")

  /** Month number → English month name CASE expression (DuckDB side of
    * Financial.monthName — avoids locale-dependent strftime). */
  def monthNameSql(c: String): String = {
    val names = Seq("January", "February", "March", "April", "May", "June",
      "July", "August", "September", "October", "November", "December")
    names.zipWithIndex.map { case (n, i) => s"WHEN ${i + 1} THEN '$n'" }
      .mkString(s"CASE $c ", " ", " END")
  }

  // ------------------------------------------------------ income statements

  /** Raw income-statement rows: (file, sheet, pos, label, amount_str). */
  def income(spark: SparkSession, dir: String): DataFrame = {
    val k = col("o_orderkey")
    val cents = round(col("o_totalprice") * 100).cast("long")
    val sc = when(k % 7 === 0, -cents).otherwise(cents)
    val det = Tables.orders(spark, dir).select(
      concat(lit("Financials "), lpad(month(col("o_orderdate")).cast("string"), 2, "0"),
        lit("."), year(col("o_orderdate")).cast("string"), lit(".xlsx")).as("file"),
      concat(lit("DEPARTMENT "), (col("o_custkey") % 5 + 100).cast("string"), lit("-F")).as("sheet"),
      ((k % 100) * POS_BUCKET + k).as("pos"),
      when(k % 13 === 0, lit("Total Revenue"))
        .when(k % 19 === 0, concat(((k % 40 + 1) * 25).cast("string"), lit(".0")))
        .otherwise(((k % 40 + 1) * 25).cast("string")).as("label"),
      when(k % 17 === 0, lit("N/A")).otherwise(fmtAmount(sc)).as("amount_str"))
    val markers = spark.createDataFrame(Seq(
      (-2L, "REVENUES"), (50L * POS_BUCKET - 1, "EXPENSES")))
      .toDF("pos", "label")
    val mk = det.select("file", "sheet").distinct()
      .crossJoin(markers)
      .select(col("file"), col("sheet"), col("pos"), col("label"), lit("").as("amount_str"))
    det.unionByName(mk)
  }

  /** SQL CTEs producing the identical statements (+ ground-truth k, sc). */
  val incomeCtes: String =
    s"""fin_src AS (
       |  SELECT o_orderkey AS k,
       |         CAST(o_custkey % 5 + 100 AS VARCHAR) AS department,
       |         CAST(month(o_orderdate) AS INT) AS mn, CAST(year(o_orderdate) AS INT) AS yr,
       |         CAST(round(o_totalprice*100) AS BIGINT)
       |           * (CASE WHEN o_orderkey % 7 = 0 THEN -1 ELSE 1 END) AS sc
       |  FROM orders),
       |fin_det AS (
       |  SELECT 'Financials ' || lpad(CAST(mn AS VARCHAR),2,'0') || '.' || CAST(yr AS VARCHAR) || '.xlsx' AS file,
       |         'DEPARTMENT ' || department || '-F' AS sheet,
       |         (k % 100) * $POS_BUCKET + k AS pos,
       |         CASE WHEN k % 13 = 0 THEN 'Total Revenue'
       |              WHEN k % 19 = 0 THEN CAST((k % 40 + 1) * 25 AS VARCHAR) || '.0'
       |              ELSE CAST((k % 40 + 1) * 25 AS VARCHAR) END AS label,
       |         CASE WHEN k % 17 = 0 THEN 'N/A' ELSE ${fmtAmountSql("sc")} END AS amount_str,
       |         k, sc
       |  FROM fin_src),
       |fin_mk AS (
       |  SELECT file, sheet, m.pos, m.label, '' AS amount_str,
       |         CAST(NULL AS BIGINT) AS k, CAST(NULL AS BIGINT) AS sc
       |  FROM (SELECT DISTINCT file, sheet FROM fin_det)
       |  CROSS JOIN (VALUES (CAST(-2 AS BIGINT), 'REVENUES'),
       |                     (CAST(${50L * POS_BUCKET - 1} AS BIGINT), 'EXPENSES')) AS m(pos, label)),
       |fin_statements AS (SELECT * FROM fin_det UNION ALL SELECT * FROM fin_mk)""".stripMargin

  // --------------------------------------------------------- GL reference

  /** GL reference dimension (the warehouse's GL sheet, Code.gs:147-166):
    * 40 codes (0025..1000 step 25) with description and group; codes with
    * i%8==3 are deliberately absent → missing-mapping QA rows. */
  def glReference(spark: SparkSession): DataFrame = glRef(spark, Seq(3))

  /** The GL sheet as of the PREVIOUS run (for QA Open/Resolved
    * accumulation): additionally lacked the i%8==5 codes, which the
    * current sheet has since gained → those transition to Resolved. */
  def glReferenceOld(spark: SparkSession): DataFrame = glRef(spark, Seq(3, 5))

  private def glRef(spark: SparkSession, excluded: Seq[Int]): DataFrame = {
    val code = lpad((col("id") * 25).cast("string"), 4, "0")
    spark.range(1, 41)
      .filter(!(col("id") % 8).isin(excluded.map(_.toLong): _*))
      .select(code.as("gl_code"),
        concat(lit("Account "), code).as("description"),
        when(col("id") * 25 <= 500, "Operating").otherwise("Overhead").as("gl_group"))
  }

  val glRefCtes: String =
    """fin_glref AS (
      |  SELECT lpad(CAST(i*25 AS VARCHAR),4,'0') AS gl_code,
      |         'Account ' || lpad(CAST(i*25 AS VARCHAR),4,'0') AS description,
      |         CASE WHEN i*25 <= 500 THEN 'Operating' ELSE 'Overhead' END AS gl_group
      |  FROM range(1,41) t(i) WHERE i % 8 <> 3),
      |fin_glref_old AS (
      |  SELECT lpad(CAST(i*25 AS VARCHAR),4,'0') AS gl_code,
      |         'Account ' || lpad(CAST(i*25 AS VARCHAR),4,'0') AS description,
      |         CASE WHEN i*25 <= 500 THEN 'Operating' ELSE 'Overhead' END AS gl_group
      |  FROM range(1,41) t(i) WHERE i % 8 <> 3 AND i % 8 <> 5)""".stripMargin

  // --------------------------------------------------------- balance sheets

  /** Raw balance-sheet rows derived from `customer` (Code.gs:211-235's
    * input shape): one sheet per nation; the GL code sits in the label
    * cell, the description cell drives the Assets→Liability→Equity state
    * machine via TOTAL ASSETS / TOTAL LIABILITIES markers (plus a
    * TOTAL OPERATING row that must be skipped without a category change),
    * and c_custkey%11==0 rows have an empty description (skipped). */
  def balance(spark: SparkSession, dir: String): DataFrame = {
    val k = col("c_custkey")
    val sc = round(col("c_acctbal") * 100).cast("long")
    val code = ((k % 50) + 1) * 20
    val det = Tables.customer(spark, dir).select(
      concat(lit("BS "), col("c_nationkey").cast("string")).as("sheet"),
      ((k % 90) * POS_BUCKET + k).as("pos"),
      code.cast("string").as("label"),
      when(k % 11 === 0, lit(""))
        .otherwise(concat(lit("Account "), lpad(code.cast("string"), 4, "0"))).as("descr"),
      fmtAmount(sc).as("amount_str"))
    val markers = spark.createDataFrame(Seq(
      (30L * POS_BUCKET - 2, "TOTAL ASSETS"),
      (45L * POS_BUCKET - 2, "TOTAL OPERATING"),
      (60L * POS_BUCKET - 2, "TOTAL LIABILITIES")))
      .toDF("pos", "descr")
    val mk = det.select("sheet").distinct()
      .crossJoin(markers)
      .select(col("sheet"), col("pos"), lit("").as("label"), col("descr"), lit("").as("amount_str"))
    det.unionByName(mk)
  }

  val balanceCtes: String =
    s"""bs_src AS (
       |  SELECT c_custkey AS k, 'BS ' || CAST(c_nationkey AS VARCHAR) AS sheet,
       |         (c_custkey % 90) * $POS_BUCKET + c_custkey AS pos,
       |         CAST(((c_custkey % 50) + 1) * 20 AS VARCHAR) AS label,
       |         CASE WHEN c_custkey % 11 = 0 THEN ''
       |              ELSE 'Account ' || lpad(CAST(((c_custkey % 50) + 1) * 20 AS VARCHAR),4,'0') END AS descr,
       |         CAST(round(c_acctbal*100) AS BIGINT) AS sc
       |  FROM customer),
       |bs_det AS (
       |  SELECT sheet, pos, label, descr, ${fmtAmountSql("sc")} AS amount_str, sc FROM bs_src),
       |bs_mk AS (
       |  SELECT sheet, m.pos, '' AS label, m.descr, '' AS amount_str, CAST(NULL AS BIGINT) AS sc
       |  FROM (SELECT DISTINCT sheet FROM bs_det)
       |  CROSS JOIN (VALUES (CAST(${30L * POS_BUCKET - 2} AS BIGINT), 'TOTAL ASSETS'),
       |                     (CAST(${45L * POS_BUCKET - 2} AS BIGINT), 'TOTAL OPERATING'),
       |                     (CAST(${60L * POS_BUCKET - 2} AS BIGINT), 'TOTAL LIABILITIES')) AS m(pos, descr)),
       |bs_rows AS (SELECT * FROM bs_det UNION ALL SELECT * FROM bs_mk)""".stripMargin
}
