package graft.expr

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a native aggregate: top-`outK` string
  * values by frequency using AT MOST `k` counters of state per group,
  * regardless of how many distinct values stream through.
  *
  * This is the bounded-memory alternative to the window-rank top-k (q43):
  * the window spelling shuffles EVERY (group, value) pair; the sketch
  * partial-aggregates map-side — each task ships one <= k-entry summary per
  * group, so the shuffle is O(groups * k), independent of value cardinality.
  * The price is approximation: each stored count undercounts its true
  * frequency by at most n/(k+1) (n = group size), and any value with true
  * count > n/(k+1) is guaranteed present (Misra & Gries 1982; the merge is
  * the mergeable-summaries form of Agarwal et al., PODS'12, preserving the
  * same bound). With k ABOVE the group's distinct-value count the sketch
  * never decrements and is EXACT — the regime the q59 oracle checks; the
  * approximation bound is property-tested in MisraGriesSpec.
  *
  * Buffer: mutable token->count map, serialized as (size, (UTF, long)*) for
  * shuffle transport (TypedImperativeAggregate contract).
  */
case class MisraGriesTopK(
    child: Expression,
    k: Int,
    outK: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1 && outK >= 1, s"k=$k and outK=$outK must be >= 1")

  override def prettyName: String = "graft_mg_topk"

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("token", StringType), StructField("n", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null)
      MisraGriesTopK.updateToken(buf, v.asInstanceOf[UTF8String].toString, k)
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (t, c) => buf.update(t, buf.getOrElse(t, 0L) + c) }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from everyone: <= k survivors,
      // and each survivor keeps the standard undercount bound.
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - 1 - k)
      buf.keys.toList.foreach { key =>
        val c = buf(key) - cut
        if (c <= 0) buf.remove(key) else buf.update(key, c)
      }
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val top = buf.toArray
      .sortBy { case (t, c) => (-c, t) }
      .take(outK)
      .map { case (t, c) => InternalRow(UTF8String.fromString(t), c) }
    new GenericArrayData(top.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    // length-prefixed UTF-8, not writeUTF: writeUTF throws
    // UTFDataFormatException past 65535 encoded bytes, so one pathological
    // long token would crash the aggregation at shuffle-serialization time
    buf.foreach { case (t, c) =>
      val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): MisraGriesTopK =
    copy(child = newChild)
}

object MisraGriesTopK {

  /** The Misra–Gries update rule, shared by the batch aggregate and the
    * streaming twin (StreamOps.heavyHittersStream) so the guarantee-bearing
    * logic has exactly one implementation: increment a tracked token,
    * insert below capacity, else decrement every counter and drop the
    * zeroed. */
  def updateToken(buf: mutable.HashMap[String, Long], tok: String, k: Int): Unit =
    buf.get(tok) match {
      case Some(c) => buf.update(tok, c + 1)
      case None if buf.size < k => buf.update(tok, 1L)
      case None => // counters full: decrement everyone, drop the zeroed
        buf.keys.toList.foreach { key =>
          val c = buf(key) - 1
          if (c == 0) buf.remove(key) else buf.update(key, c)
        }
    }

  def apply(c: Column, k: Int, outK: Int): Column =
    GraftSqlBridge.column(
      new MisraGriesTopK(GraftSqlBridge.expression(c), k, outK)
        .toAggregateExpression())
}
