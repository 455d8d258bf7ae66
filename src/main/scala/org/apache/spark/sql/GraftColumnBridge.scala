package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the `private[sql]` Column ⇄ Expression
  * converters (Spark 4 moved Column construction behind ColumnNodes).
  * This is the only place the engine reaches past the public API, and
  * only to attach its own Catalyst expressions (graft.functions.
  * VectorExprs) to DataFrame columns.
  */
object GraftColumnBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
