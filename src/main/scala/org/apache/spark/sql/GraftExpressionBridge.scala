package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 removed the public Column-from-Expression constructor; the
  * supported extension route is a bridge in the org.apache.spark.sql
  * package (ExpressionUtils is private[sql]). Used only by
  * graft.functions wrappers. */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
