package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the reference's end-to-end warehouse build. */
  def entry(spark: SparkSession): DataFrame =
    queries("fin_warehouse_build")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TpchExtra.queries ++ Analytics.queries ++
      graft.warehouse.Warehouse.queries ++
      TextAnalysis.queries ++ TextStats.queries ++ TrainPrep.queries ++
      Bpe.queries ++ Dedup.queries ++ Ann.queries ++ Graph.queries ++
      graft.streaming.EventStreams.queries ++ Multimodal.queries

  /** DuckDB-runnable equivalents over the same parquet tables. Keys absent
    * here get the driver's weaker rows-only check (see SURVEY.md §2). */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ TpchExtra.oracles ++ Analytics.oracles ++
      graft.warehouse.Warehouse.oracles ++
      TextAnalysis.oracles ++ TextStats.oracles ++ TrainPrep.oracles ++
      Bpe.oracles ++ Dedup.oracles ++ Ann.oracles ++ Graph.oracles ++
      graft.streaming.EventStreams.oracles ++ Multimodal.oracles
      // mm_metadata / mm_features: binary + stub semantics, rows-only
      // (MultimodalSpec); mm_dedup IS oracled (md5 over the same bytes)
}
