package graft.expr

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native sketch kernels. The built-in spellings
  * (`transform`/`array_min`/`aggregate`) are higher-order functions whose
  * lambdas run INTERPRETED row-by-row — measured as the dominant cost of the
  * MinHash/SimHash/winnowing preps. Each kernel computes the IDENTICAL
  * arithmetic in one codegen'd pass, so oracle parity is untouched.
  */

/** MinHash signature: for each (a,b) permutation, min over the input hashes
  * of (a*x + b) mod p. One pass over the array, minima tracked in registers.
  * Equals `array(array_min(transform(hs, x -> (x*a_i+b_i)%p)), ...)`. */
case class MinhashSig(child: Expression, as: Seq[Long], bs: Seq[Long], p: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    new GenericArrayData(
      MinhashSig.compute(hs.toLongArray(), as.toArray, bs.toArray, p))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("as", as.toArray, "long[]")
    val bRef = ctx.addReferenceObj("bs", bs.toArray, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.expr.MinhashSig.compute($c.toLongArray(), $aRef, $bRef, ${p}L))")
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

object MinhashSig {
  def compute(hs: Array[Long], as: Array[Long], bs: Array[Long], p: Long): Array[Long] = {
    val k = as.length
    val out = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < hs.length) {
      val x = hs(i)
      var j = 0
      while (j < k) {
        val v = (as(j) * x + bs(j)) % p
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    // empty input: array_min over empty yields null in the HOF spelling; the
    // callers guard shingle sets to non-empty or tolerate MaxValue sentinels
    // only behind size()>0 guards, so keep sentinels deterministic.
    out
  }

  def apply(c: Column, perms: Seq[(Long, Long)], p: Long): Column =
    GraftSqlBridge.column(MinhashSig(GraftSqlBridge.expression(c),
      perms.map(_._1), perms.map(_._2), p))
}

/** 32-bit SimHash from token hashes: bit j of the result is set iff
  * sum over tokens of (bit j set ? +1 : -1) is positive. Equals the 32
  * `aggregate(...)` bit sums + weighted sum spelling. */
case class Simhash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash32"

  override protected def nullSafeEval(input: Any): Any =
    Simhash32.compute(input.asInstanceOf[ArrayData].toLongArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.Simhash32.compute($c.toLongArray())")

  override protected def withNewChildInternal(newChild: Expression): Simhash32 =
    copy(child = newChild)
}

object Simhash32 {
  def compute(hs: Array[Long]): Long = {
    val sums = new Array[Long](32)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var j = 0
      while (j < 32) {
        if (((h >> j) & 1L) == 1L) sums(j) += 1 else sums(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 32) {
      if (sums(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  def apply(c: Column): Column =
    GraftSqlBridge.column(Simhash32(GraftSqlBridge.expression(c)))
}

/** Winnowing minima: sliding-window (size w) minimum over a positional hash
  * sequence. Equals `transform(sequence(0, n-w), i -> array_min(slice(hs,
  * i+1, w)))` for n >= w, `[min(hs)]` for 0 < n < w, else empty. */
case class WindowMins(child: Expression, w: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_window_mins"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      WindowMins.compute(input.asInstanceOf[ArrayData].toLongArray(), w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.expr.WindowMins.compute($c.toLongArray(), $w))")

  override protected def withNewChildInternal(newChild: Expression): WindowMins =
    copy(child = newChild)
}

object WindowMins {
  def compute(hs: Array[Long], w: Int): Array[Long] = {
    val n = hs.length
    if (n == 0) return Array.emptyLongArray
    if (n < w) return Array(hs.min)
    val out = new Array[Long](n - w + 1)
    var i = 0
    while (i <= n - w) {
      var m = hs(i)
      var j = i + 1
      while (j < i + w) {
        if (hs(j) < m) m = hs(j)
        j += 1
      }
      out(i) = m
      i += 1
    }
    out
  }

  def apply(c: Column, w: Int): Column =
    GraftSqlBridge.column(WindowMins(GraftSqlBridge.expression(c), w))
}
