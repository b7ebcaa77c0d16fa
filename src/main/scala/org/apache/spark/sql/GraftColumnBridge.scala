package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the sql-private Expression ↔ Column conversion (Spark 4
  * removed the public `Column(expr)` constructor; the classic converter is
  * `private[sql]`). Lives in the org.apache.spark.sql package namespace
  * solely to re-export those two calls for graft's custom expressions. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
