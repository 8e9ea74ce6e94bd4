package graft.expr

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** [[SortedIntersectCount]] with an early-exit bound: walks two
  * SORTED-ascending long arrays and returns the exact |A ∩ B| whenever it is
  * >= `minCount`; as soon as the running count plus the remaining shorter
  * side can no longer reach `minCount` it returns -1 instead of finishing
  * the walk.
  *
  * Contract (deterministic): result >= minCount  ⟺  result is the exact
  * intersect count and it clears the bound; result < minCount  ⟹  the true
  * count is < minCount (the value may be the exact count or the -1
  * sentinel). Callers that filter `jaccard >= t` are unaffected by which —
  * a pruned pair was provably below threshold.
  *
  * This is the verify-tier hot loop of the set-similarity joins: most
  * candidate pairs FAIL the threshold, and for them the walk stops at the
  * first provably-hopeless position instead of consuming both arrays.
  * With Jaccard >= t, c/(n+m-c) >= t  ⟺  c >= t*(n+m)/(1+t) — callers pass
  * floor of that (conservative: never prunes a passing pair).
  */
case class ThresholdedIntersectCount(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_thresholded_isect"

  override protected def nullSafeEval(a: Any, b: Any, m0: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val minCount = m0.asInstanceOf[Long]
    var i = 0; var j = 0; var c = 0L
    val n = x.numElements(); val m = y.numElements()
    while (i < n && j < m) {
      val rem = math.min(n - i, m - j)
      if (c + rem < minCount) return -1L
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, mc) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val c = ctx.freshName("c"); val rem = ctx.freshName("rem")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
        |final int $n = $a.numElements();
        |final int $m = $b.numElements();
        |int $i = 0; int $j = 0; long $c = 0L;
        |while ($i < $n && $j < $m) {
        |  final int $rem = ($n - $i < $m - $j) ? $n - $i : $m - $j;
        |  if ($c + $rem < $mc) { $c = -1L; break; }
        |  final long $xv = $a.getLong($i);
        |  final long $yv = $b.getLong($j);
        |  if ($xv == $yv) { $c++; $i++; $j++; }
        |  else if ($xv < $yv) { $i++; } else { $j++; }
        |}
        |${ev.value} = $c;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): ThresholdedIntersectCount =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object ThresholdedIntersectCount {
  def apply(a: Column, b: Column, minCount: Column): Column =
    GraftSqlBridge.column(ThresholdedIntersectCount(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b),
      GraftSqlBridge.expression(minCount)))

  /** The Jaccard bound: exact count needed for J(A,B) >= t given |A|+|B|.
    * floor() keeps it conservative — never prunes a pair at the boundary. */
  def jaccardBound(nsum: Column, threshold: Double): Column =
    org.apache.spark.sql.functions.floor(
      nsum.cast("double") * (threshold / (1.0 + threshold))).cast("long")
}
