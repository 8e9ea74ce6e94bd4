package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The tier-(c) extension surface (SURVEY §7 preference order): a custom
  * LogicalPlan + SparkStrategy + physical SparkPlan for the as-of join,
  * registered through SparkSessionExtensions (GraftExtensions).
  *
  * The composition spelling (ops.AsofJoin: union + running last_value) is
  * one shuffle + one sort over left+right TOGETHER — correct and
  * oracle-checked (q41). This operator is the dedicated physical form: each
  * side shuffles on its own key and sorts (key, time) independently, and a
  * single streaming MERGE WALK per co-partition emits `left ++ latest right
  * at-or-before left.time` — no union row-widening (the composition carries
  * every left column through the window as nulls on right rows), no
  * post-filter, and O(1) state (one buffered right row) per partition.
  * Semantics match DuckDB's `ASOF LEFT JOIN` (inclusive <=), which is the
  * q67 oracle; ties on (key, time) on the right must be pre-deduped, same
  * contract as q41 and DuckDB.
  *
  * Keys/times are carried as resolved `Attribute`s, NOT names: the node's
  * `references` derive from its expression fields, which is exactly what
  * keeps ColumnPruning from stripping the join columns out of the children
  * (a name-based first cut lost its keys to the optimizer).
  *
  * Join keys must be non-null (filter upstream): the merge compares keys
  * with the natural ordering, under which nulls compare equal — SQL join
  * semantics would drop them.
  */
case class AsofMergeJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute) extends BinaryNode {
  require(leftKeys.size == rightKeys.size, "key lists must align")
  // The merge walk builds ONE natural ordering from the left side's
  // (key, time) types and applies it to right-side rows — a left/right
  // type mismatch (e.g. date vs timestamp time axis) would compare
  // garbage bytes instead of failing. Reject it at construction.
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    s"asof key types must match: ${leftKeys.map(_.dataType)} vs " +
      s"${rightKeys.map(_.dataType)}")
  require(leftTime.dataType == rightTime.dataType,
    s"asof time types must match: ${leftTime.dataType} vs ${rightTime.dataType}")
  // right side nullable: unmatched left rows carry nulls
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofMergeJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans the logical node 1:1 into the physical merge join. */
object AsofMergeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofMergeJoinPlan(l, r, lk, rk, lt, rt) =>
      AsofMergeJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsofMergeJoinExec(left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // Both children cluster on their join keys — EnsureRequirements inserts
  // co-partitioned exchanges (the SortMergeJoin machinery) …
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  // … and sorts each side by (keys, time) ascending within partitions.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  // Sorted output propagates: downstream per-key windows reuse our sort.
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKT: Seq[Attribute] = leftKeys :+ leftTime
    val rKT: Seq[Attribute] = rightKeys :+ rightTime
    val ktTypes = lKT.map(_.dataType)
    val kTypes = leftKeys.map(_.dataType)
    val lKeys = leftKeys; val rKeys = rightKeys
    val leftOut = left.output
    val rightOut = right.output
    val allOut = output
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val lktProj = UnsafeProjection.create(lKT, leftOut)
      val rktProj = UnsafeProjection.create(rKT, rightOut)
      val lkProj = UnsafeProjection.create(lKeys, leftOut)
      val rkProj = UnsafeProjection.create(rKeys, rightOut)
      // bind against NULLABLE right attrs: the unmatched-row null struct
      // must survive the projection (binding against the child's original
      // non-nullable attrs makes codegen skip the null checks and read 0s)
      val outProj = UnsafeProjection.create(allOut,
        leftOut ++ rightOut.map(_.withNullability(true)))
      val ktOrd = RowOrdering.createNaturalAscendingOrdering(ktTypes)
      val kOrd = RowOrdering.createNaturalAscendingOrdering(kTypes)
      val nullRight = new GenericInternalRow(rightOut.size)
      val joined = new JoinedRow
      val rBuf = ri.buffered
      new Iterator[InternalRow] {
        // O(1) state: the latest right row at or before the current left
        // (key, time) — rows behind it are unreachable for later lefts
        // because both sides advance in (key, time) order.
        private var lastMatch: InternalRow = _
        private var lastMatchKey: UnsafeRow = _
        override def hasNext: Boolean = li.hasNext
        override def next(): InternalRow = {
          val l = li.next()
          val lkt = lktProj(l)
          while (rBuf.hasNext && ktOrd.compare(rktProj(rBuf.head), lkt) <= 0) {
            val r = rBuf.next().copy()
            // NULL right times sort first under the natural ordering and
            // would otherwise become match-eligible for every left row of
            // the key; DuckDB ASOF treats NULL <= t as no-match. Consume
            // but never buffer them.
            if (!rktProj(r).isNullAt(rKeys.size)) {
              lastMatch = r
              lastMatchKey = rkProj(r).copy()
            }
          }
          // A NULL left time likewise matches nothing (mirrors DuckDB).
          val matched = !lkt.isNullAt(lKeys.size) && lastMatch != null &&
            kOrd.compare(lastMatchKey, lkProj(l)) == 0
          outProj(joined(l, if (matched) lastMatch else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofMergeJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry point: `AsofMerge.join(trades, quotes, ...)`. Requires
  * the session to carry GraftExtensions (the strategy registration). Column
  * names resolve against each side's ANALYZED output, so the two sides may
  * reuse names; a literal self-join of one DataFrame needs an alias first
  * (standard Spark self-join caveat). */
object AsofMerge {
  def join(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String): DataFrame = {
    val lp = GraftSqlBridge.analyzed(left)
    val rp = GraftSqlBridge.analyzed(right)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"column '$n' not found in ${p.output.map(_.name)}"))
    GraftSqlBridge.ofRows(left.sparkSession,
      AsofMergeJoinPlan(lp, rp,
        leftKeys.map(attr(lp, _)), rightKeys.map(attr(rp, _)),
        attr(lp, leftTime), attr(rp, rightTime)))
  }
}
