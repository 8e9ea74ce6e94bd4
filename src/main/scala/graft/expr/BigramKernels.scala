package graft.expr

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Adjacent-token bigram hashing in one native pass: for token array t,
  * emit per adjacent pair the struct (hp = hash60(t[i]),
  * hb = hash60(t[i] + " " + t[i+1]), h2 = hash60(t[i+1])) — the three
  * probes LM scoring needs (context count, bigram count, backoff
  * unigram). Equals the `transform(sequence(0, size(t)-2), i ->
  * struct(hash60(...), hash60(concat(...)), hash60(...)))` spelling
  * (whose lambda ran INTERPRETED per pair and disabled whole-stage
  * codegen for the enclosing stage), but hashes each TOKEN once — the
  * HOF spelling md5'd every token twice, once as hp of pair i and once
  * as h2 of pair i-1. */
case class BigramHash3Seq(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("hp", LongType, nullable = false),
      StructField("hb", LongType, nullable = false),
      StructField("h2", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_bigram_hash3_seq"

  override protected def nullSafeEval(input: Any): Any =
    BigramHash3Seq.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.BigramHash3Seq.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): BigramHash3Seq =
    copy(child = newChild)
}

object BigramHash3Seq {
  private val SPACE = UTF8String.fromString(" ")

  def compute(toks: ArrayData): GenericArrayData = {
    val n = toks.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[AnyRef])
    // hash every token once; the HOF spelling re-hashed interior tokens
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) = Hash60.compute(toks.getUTF8String(i))
      i += 1
    }
    val out = new Array[AnyRef](n - 1)
    i = 0
    while (i < n - 1) {
      val hb = Hash60.compute(UTF8String.concat(
        toks.getUTF8String(i), SPACE, toks.getUTF8String(i + 1)))
      out(i) = new GenericInternalRow(
        Array[Any](th(i), hb, th(i + 1))): InternalRow
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column): Column =
    GraftSqlBridge.column(BigramHash3Seq(GraftSqlBridge.expression(c)))
}
