package graft.expr

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

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

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_dot"

  // Accept array<float> directly (widening each ELEMENT during the fold —
  // exact, so identical to casting the whole array first) as well as
  // array<double>: the former avoids materializing a casted copy of the
  // array per call, which mattered with 48 plane dots per row in the LSH
  // bucket computation.
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float|double> arguments, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (xf, yf) = (isFloat(left), isFloat(right))
    val n = x.numElements()
    if (n != y.numElements()) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      sum += xv * yv
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      def get(arr: String, side: Expression) =
        if (isFloat(side)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
        |final int $n = $a.numElements();
        |if ($n != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $sum = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
        |    $sum += ${get(a, left)} * ${get(b, right)};
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
  /** Column-level entry: float arrays are consumed directly (per-element
    * exact widening); anything else must already be array<double>. */
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
