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

  /** Eager local checkpoint WITHOUT the origin plan's statistics.
    *
    * `Dataset.localCheckpoint` truncates the LINEAGE but copies the origin
    * plan's `Statistics` onto the resulting `LogicalRDD` (`originStats`).
    * In an iterative algorithm whose round plan references the previous
    * round's checkpoint more than once (connected components SELF-JOINS the
    * label table for the pointer jump), join estimation MULTIPLIES those
    * BigInt sizes, so the carried `sizeInBytes` SQUARES every round — its
    * bit length doubles, and from round ~16 the driver spends its time in
    * `BigInteger.multiply` inside plan estimation: round wall doubles at
    * constant data (measured on a 416-node / 794-edge graph: 0.4 s rounds
    * until r16, then 0.5/0.9/2.2/4.9/12/31/92 s — a "hang" by round 23).
    * Short-converging graphs (near-clique dedup corpora, ≤5 rounds) never
    * reach the wall, which is why this stayed latent until a drift-chain
    * fingerprint graph needed 20+ rounds.
    *
    * This does exactly what the eager Dataset path does — materialize the
    * physical plan's rows, RDD-local-checkpoint them — but rebuilds the
    * frame through `internalCreateDataFrame`, whose `LogicalRDD` carries NO
    * origin statistics: each round re-plans from the session default size,
    * and AQE picks physical join strategies from RUNTIME shuffle sizes, so
    * nothing is lost at any scale. The `map(_.copy())` is the same unsafe-
    * row defensive copy `Dataset.checkpoint` performs before caching. */
  def localCheckpointNoStats(df: DataFrame): DataFrame = {
    val cls = df.sparkSession.asInstanceOf[classic.SparkSession]
    val rdd = df.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    rdd.count() // eager: materialize + truncate now, like localCheckpoint()
    cls.internalCreateDataFrame(rdd, df.schema)
  }
}
