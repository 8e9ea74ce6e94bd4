package graft.expr

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** |A ∩ B| for two SORTED-ascending long arrays (distinct elements), as a
  * codegen'd merge walk — O(n+m) with no per-pair hash-set allocation.
  *
  * This is the verification kernel for the set-similarity pair joins: with
  * c = intersect count, Jaccard = c / (|A| + |B| - c), so the union set
  * never needs materializing either. `array_intersect`/`array_union` build a
  * boxed hash set per invocation — per candidate pair, in the join hot loop.
  *
  * Callers MUST pre-sort (array_sort at the per-document prep stage — O(n
  * log n) once per doc, amortized over all pairs the doc participates in).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_sorted_isect"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0L
    val n = x.numElements(); val m = y.numElements()
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
        |final int $n = $a.numElements();
        |final int $m = $b.numElements();
        |int $i = 0; int $j = 0; long $c = 0L;
        |while ($i < $n && $j < $m) {
        |  final long $xv = $a.getLong($i);
        |  final long $yv = $b.getLong($j);
        |  if ($xv == $yv) { $c++; $i++; $j++; }
        |  else if ($xv < $yv) { $i++; } else { $j++; }
        |}
        |${ev.value} = $c;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(SortedIntersectCount(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
