package graft.expr

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine-portable 60-bit text hash, natively: md5 digest -> first 8
  * bytes as unsigned big-endian ->> 4. Exactly equal to
  * `conv(substring(md5(s), 1, 15), 16, 10)` — the first 15 hex digits ARE
  * the first 7.5 digest bytes — but without materializing the 32-char hex
  * string and parsing it back, which dominated the shingle-hashing prep of
  * the dedup operators. DuckDB mirrors stay on
  * `('0x' || substr(md5(s),1,15))::BIGINT`, same value.
  */
case class Hash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_hash60"

  override protected def nullSafeEval(input: Any): Any =
    Hash60.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.Hash60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)
}

object Hash60 {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 15 hex digits of md5 as a non-negative long. */
  def compute(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val u64 =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    u64 >>> 4
  }

  def apply(c: Column): Column =
    GraftSqlBridge.column(Hash60(GraftSqlBridge.expression(c.cast("string"))))
}
