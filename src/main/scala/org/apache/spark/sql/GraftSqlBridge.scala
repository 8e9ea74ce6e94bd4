package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal access bridge: `ExpressionUtils.column/expression` are
  * `private[sql]` in Spark 4, so custom native expressions (graft.expr.*)
  * need one in-package hop to be lifted into the public Column API. This is
  * the standard pattern for out-of-tree Catalyst extensions; nothing else in
  * the private surface is touched. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
