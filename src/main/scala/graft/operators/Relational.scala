package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Relational / OLAP query surface (SURVEY.md §2B).
  *
  * Oracle-parity rules (SURVEY.md §5): money sums are computed exactly in
  * integer cents (`round(x*100)` → BIGINT sum) and divided back to DOUBLE,
  * so Spark and DuckDB produce bit-identical doubles regardless of
  * aggregation order; every output column is explicitly typed; every query
  * is deterministically ordered.
  */
object Relational {

  /** Exact money arithmetic: dollars-as-double → integer cents. */
  private def cents(c: org.apache.spark.sql.Column) =
    round(c * lit(100)).cast("long")

  /** TPC-H Q1 shape: scan-heavy grouped aggregation on lineitem.
    * Scale: partial aggregation (map-side combine) means the shuffle
    * carries |groups| rows per partition, not |input|.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (sum(cents(col("l_quantity"))).cast("double") / 100.0).as("sum_qty"),
        (sum(cents(col("l_extendedprice"))).cast("double") / 100.0).as("sum_base_price"),
        count(lit(1)).as("count_order"),
        (sum(cents(col("l_quantity"))).cast("double") / 100.0 / count(lit(1))).as("avg_qty")
      )
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_qty,
      |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_base_price,
      |  count(*) AS count_order,
      |  CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100.0/count(*) AS avg_qty
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _)
  )

  def oracles: Map[String, String] = Map(
    "q1_agg" -> q1AggSql
  )
}
