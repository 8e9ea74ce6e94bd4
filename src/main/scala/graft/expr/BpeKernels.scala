package graft.expr

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the BPE family's U+001F symbol-string representation
  * (see [[graft.llm.TextAnalysis.bpeTrainRounds]]): a word segmented
  * [s1, s2, ...] is the string "␟s1␟␟s2␟..." (every symbol wrapped in
  * U+001F unit separators, one byte 0x1F in UTF-8; symbols never contain
  * it — scrubbed from input words first).
  *
  * The original spellings were higher-order functions —
  * `concat_ws("", transform(filter(split(word, "")...), wrap))` for the
  * initial wrap, `split(regexp_replace(seq, "^␟|␟$", ""), "␟␟")` + a
  * `transform(sequence(...))` for the per-round pair extraction — and HOF
  * lambdas evaluate INTERPRETED, one expression-tree walk per (word ×
  * char) per round, disabling whole-stage codegen for every stage that
  * contains them (JFR on q111: ArrayTransform/ArrayFilter eval = the top
  * CPU of the whole suite). These kernels run each per-word pass as one
  * byte-level loop and restore codegen to the enclosing stage; each is
  * pinned bit-identical to its HOF spelling by BpeKernelsSpec.
  */

/** "abc" -> "␟a␟␟b␟␟c␟": one U+001F-wrapped symbol per CODE POINT, matching
  * `concat_ws("", transform(filter(split(word, ""), c -> c != ""), wrap))`
  * (Java's zero-width split advances by code point). One byte pass; code
  * points are delimited by UTF-8 first-byte lengths. */
case class BpeWrap(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_bpe_wrap"

  override protected def nullSafeEval(input: Any): Any =
    BpeWrap.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.BpeWrap.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeWrap =
    copy(child = newChild)
}

object BpeWrap {
  final val US: Byte = 0x1f

  def compute(word: UTF8String): UTF8String = {
    val bytes = word.getBytes
    val n = bytes.length
    if (n == 0) return UTF8String.EMPTY_UTF8
    val out = new Array[Byte](n + 2 * word.numChars())
    var i = 0
    var o = 0
    while (i < n) {
      var len = UTF8String.numBytesForFirstByte(bytes(i))
      if (i + len > n) len = n - i // defensive: malformed tail
      out(o) = US; o += 1
      var j = 0
      while (j < len) { out(o) = bytes(i + j); o += 1; j += 1 }
      i += len
      out(o) = US; o += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }

  def apply(c: Column): Column =
    GraftSqlBridge.column(BpeWrap(GraftSqlBridge.expression(c)))
}

/** The symbol array of a wrapped seq — equals
  * `split(regexp_replace(seq, "^␟|␟$", ""), "␟␟")` (strip ONE leading and
  * ONE trailing separator, then split on each non-overlapping literal
  * "␟␟", Java limit -1 semantics: empty segments kept). */
case class BpeSymbols(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_symbols"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      BpeSymbols.compute(input.asInstanceOf[UTF8String])
        .asInstanceOf[Array[AnyRef]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"(Object[]) graft.expr.BpeSymbols.compute($c))")

  override protected def withNewChildInternal(newChild: Expression): BpeSymbols =
    copy(child = newChild)
}

object BpeSymbols {
  import BpeWrap.US

  def compute(seq: UTF8String): Array[UTF8String] = {
    val bytes = seq.getBytes
    var start = 0
    var end = bytes.length
    if (end > start && bytes(start) == US) start += 1
    if (end > start && bytes(end - 1) == US) end -= 1
    val out = new java.util.ArrayList[UTF8String](8)
    var segStart = start
    var i = start
    while (i < end - 1) {
      if (bytes(i) == US && bytes(i + 1) == US) {
        out.add(UTF8String.fromBytes(bytes, segStart, i - segStart))
        i += 2
        segStart = i
      } else i += 1
    }
    out.add(UTF8String.fromBytes(bytes, segStart, end - segStart))
    out.toArray(new Array[UTF8String](out.size()))
  }

  def apply(c: Column): Column =
    GraftSqlBridge.column(BpeSymbols(GraftSqlBridge.expression(c)))
}

/** Adjacent symbol pairs of a wrapped seq, each as "a b" — equals the
  * trainer's `transform(sequence(0, size(s) - 2), i -> concat(s[i+1], ' ',
  * s[i+2]))` over [[BpeSymbols]], with the empty array for sub-2-symbol
  * seqs (the callers' `filter(size >= 2)` guard folds into the explode of
  * the empty array). */
case class BpeAdjacentPairs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_adjacent_pairs"

  override protected def nullSafeEval(input: Any): Any =
    BpeAdjacentPairs.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.BpeAdjacentPairs.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): BpeAdjacentPairs =
    copy(child = newChild)
}

object BpeAdjacentPairs {
  private val SPACE = UTF8String.fromString(" ")

  def compute(seq: UTF8String): GenericArrayData = {
    val syms = BpeSymbols.compute(seq)
    if (syms.length < 2)
      return new GenericArrayData(Array.empty[AnyRef])
    val out = new Array[AnyRef](syms.length - 1)
    var i = 0
    while (i < syms.length - 1) {
      out(i) = UTF8String.concat(syms(i), SPACE, syms(i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column): Column =
    GraftSqlBridge.column(BpeAdjacentPairs(GraftSqlBridge.expression(c)))
}

/** Symbol count of a wrapped seq — equals `size(BpeSymbols(seq))` without
  * materializing the array (the encoders' per-word token count). */
case class BpeSymbolCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_symbol_count"

  override protected def nullSafeEval(input: Any): Any =
    BpeSymbolCount.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.BpeSymbolCount.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): BpeSymbolCount =
    copy(child = newChild)
}

object BpeSymbolCount {
  import BpeWrap.US

  def compute(seq: UTF8String): Long = {
    val bytes = seq.getBytes
    var start = 0
    var end = bytes.length
    if (end > start && bytes(start) == US) start += 1
    if (end > start && bytes(end - 1) == US) end -= 1
    var cnt = 1L
    var i = start
    while (i < end - 1) {
      if (bytes(i) == US && bytes(i + 1) == US) { cnt += 1; i += 2 }
      else i += 1
    }
    cnt
  }

  def apply(c: Column): Column =
    GraftSqlBridge.column(BpeSymbolCount(GraftSqlBridge.expression(c)))
}
