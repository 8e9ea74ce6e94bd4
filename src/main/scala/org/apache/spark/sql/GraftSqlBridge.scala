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

  /** Lift a hand-built LogicalPlan (e.g. graft.plans.AsofMergeJoinPlan) into
    * a DataFrame — `Dataset.ofRows` is `private[sql]`, same one-hop pattern
    * as the expression lifts above. */
  def ofRows(spark: SparkSession, plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (for embedding as a child of a
    * custom node). */
  def analyzed(df: DataFrame): catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed
}
