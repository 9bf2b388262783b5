package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Idempotent append + dedupe keep-last on a natural key — the reference's
  * monthly-load primitive (build_warehouse.py:159-169, Code.gs:264-274).
  *
  * Scale: one shuffle on the natural key. In a production 100 TB warehouse
  * the fact table is partitioned by (Year, Month) so a monthly re-load
  * rewrites a single partition; the keep-last window then runs per
  * partition with no global shuffle.
  */
object UpsertDedupe {
  /** Keep exactly one row per `keys` — the one ranked first by
    * `precedence` (pass descending batch/time columns: highest
    * precedence first). One shuffle on the natural key; Spark plans the
    * rank filter as WindowGroupLimit, pruning per partition before the
    * final window. */
  def keepLastWithin(df: DataFrame, keys: Seq[Column], precedence: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(precedence: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Union `existing` and `incoming` (same schema) then keep-last. */
  def keepLast(existing: DataFrame, incoming: DataFrame,
               keys: Seq[Column], precedence: Seq[Column]): DataFrame =
    keepLastWithin(existing.unionByName(incoming), keys, precedence)
}
