package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters — the
  * standard shim for extension libraries that construct native Catalyst
  * expressions as Columns without registering a SQL function (Spark 4
  * removed the public Column(Expression) constructor). Kept to exactly
  * these two forwarders. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
