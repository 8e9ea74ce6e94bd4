package graft.expr

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** hash60 applied across a string array in one native pass — equals
  * `transform(arr, s -> hash60(s) [% p])` without the interpreted-lambda
  * wrapper. p <= 0 means no modulus. */
case class Hash60Array(child: Expression, p: Long) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hash60_array"

  override protected def nullSafeEval(input: Any): Any =
    Hash60Array.compute(input.asInstanceOf[ArrayData], p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.Hash60Array.compute($c, ${p}L)")

  override protected def withNewChildInternal(newChild: Expression): Hash60Array =
    copy(child = newChild)
}

object Hash60Array {
  def compute(arr: ArrayData, p: Long): GenericArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val h = Hash60.compute(arr.getUTF8String(i))
      out(i) = if (p > 0) h % p else h
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, p: Long = -1L): Column =
    GraftSqlBridge.column(Hash60Array(GraftSqlBridge.expression(c), p))
}

/** Positional word-k-gram hashing fused into one pass: for token array t,
  * emit hash60(t[i] + " " + ... + t[i+k-1]) mod p for each i — equals the
  * `transform(sequence(...), i -> pmod(hash60(array_join(slice(...))), p))`
  * spelling without materializing the intermediate shingle arrays. */
case class ShingleHashSeq(child: Expression, k: Int, p: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hash_seq"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashSeq.compute(input.asInstanceOf[ArrayData], k, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.ShingleHashSeq.compute($c, $k, ${p}L)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashSeq =
    copy(child = newChild)
}

object ShingleHashSeq {
  def compute(toks: ArrayData, k: Int, p: Long): GenericArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - k + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= n - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks.getUTF8String(i + j).toString)
        j += 1
      }
      val h = Hash60.compute(UTF8String.fromString(sb.toString))
      out(i) = if (p > 0) h % p else h
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, k: Int, p: Long = -1L): Column =
    GraftSqlBridge.column(ShingleHashSeq(GraftSqlBridge.expression(c), k, p))
}

/** Positional character n-gram hashing fused into one pass over the string:
  * hash60 of every length-n character substring — equals
  * `transform(sequence(1, len-n+1), i -> hash60(substr(text, i, n)))`
  * without materializing the gram strings (whose lambdas run interpreted).
  * Character (not byte) indexing, matching substr semantics in both
  * engines. */
case class CharGramHashSeq(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_chargram_hash_seq"

  override protected def nullSafeEval(input: Any): Any =
    CharGramHashSeq.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.CharGramHashSeq.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharGramHashSeq =
    copy(child = newChild)
}

object CharGramHashSeq {
  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val chars = text.numChars()
    if (chars < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](chars - n + 1)
    var i = 0
    while (i <= chars - n) {
      out(i) = Hash60.compute(text.substringSQL(i + 1, n))
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, n: Int): Column =
    GraftSqlBridge.column(CharGramHashSeq(GraftSqlBridge.expression(c), n))
}

/** Count of array elements contained in a fixed string set — equals
  * `size(filter(arr, x -> x IN (...)))` without the interpreted per-element
  * lambda. The set ships as a codegen reference object (hash lookups, not a
  * linear `isin` scan per element). */
case class MembershipCount(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_membership_count"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    MembershipCount.compute(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("memberSet", set, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.expr.MembershipCount.compute($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): MembershipCount =
    copy(child = newChild)
}

object MembershipCount {
  def compute(arr: ArrayData, set: java.util.HashSet[UTF8String]): Long = {
    val n = arr.numElements()
    var cnt = 0L
    var i = 0
    while (i < n) {
      if (set.contains(arr.getUTF8String(i))) cnt += 1
      i += 1
    }
    cnt
  }

  def apply(c: Column, words: Seq[String]): Column =
    GraftSqlBridge.column(MembershipCount(GraftSqlBridge.expression(c), words))
}
