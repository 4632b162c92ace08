package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark 4's ColumnNode-backed Column for registering custom
  * Catalyst expressions (classic.ExpressionUtils is private[sql]). */
object GraftGlue {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
