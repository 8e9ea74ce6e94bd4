package graft.expr

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Strict left-fold dot product over two double arrays, as a native Catalyst
  * expression with whole-stage codegen.
  *
  * Why not `aggregate(zip_with(...))`: higher-order functions evaluate their
  * lambdas interpreted (no codegen), which made the pairwise-cosine verify
  * the hot path of the embedding near-dup join (per-pair: 3 folds x 64
  * boxed lambda steps). This kernel is the (b)-tier of the custom-operator
  * preference order — a scalar `Expression` with `doGenCode` — and keeps the
  * EXACT summation order of the HOF version (sequential, index 0..n-1), so
  * results stay bit-identical to DuckDB's `list_dot_product` and nothing
  * changes for the oracle.
  *
  * Null semantics: null input, length mismatch, or any null element -> null
  * (mirrors what the zip_with/aggregate formulation produced).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Input typing is guaranteed by the Column-level constructor below, which
  // casts both sides to array<double> before the expression is built.
  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      sum += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
        |final int $n = $a.numElements();
        |if ($n != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $sum = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
        |    $sum += $a.getDouble($i) * $b.getDouble($i);
        |  }
        |  if (!${ev.isNull}) { ${ev.value} = $sum; }
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-level entry: elementwise-cast both sides to array<double>
    * (exact widening for float embeddings). */
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(
      GraftSqlBridge.expression(a.cast("array<double>")),
      GraftSqlBridge.expression(b.cast("array<double>"))))
}
