package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Forward-fill (the reference's section-marker → category `ffill`,
  * build_warehouse.py:91-94): carry the last non-null value down a
  * positional ordering within each partition.
  *
  * Scale: `last(_, ignoreNulls).over(running window)` — ONE shuffle on the
  * partition key, no self-join. Partitions are independent statements /
  * files / users, so 100 TB parallelizes across them; never use a global
  * (unpartitioned) window at scale.
  */
object ForwardFill {
  def ffill(df: DataFrame, partitionBy: Seq[Column], orderBy: Seq[Column],
            fill: Column, as: String): DataFrame = {
    val w = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as, last(fill, ignoreNulls = true).over(w))
  }
}
