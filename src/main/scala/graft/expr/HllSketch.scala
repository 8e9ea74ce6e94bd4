package graft.expr

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog distinct-count aggregate (Flajolet et al. 2007, with the
  * linear-counting small-range correction of the HLL++ paper, Heule et al.
  * 2013) as a native `TypedImperativeAggregate` — the mergeable sketch that
  * answers "how many distinct canonical URLs does this host have" over a
  * 100 TB crawl in one pass, 2^p bytes of state per group, register-wise-max
  * merge across shards (commutative + idempotent, so shard layout and
  * re-delivery order cannot change the answer).
  *
  * Determinism: the register vector is a pure function of the value SET —
  * max is order-independent — and the input hash is the engine-portable
  * md5-based [[Hash60]], so the estimate is reproducible across sessions,
  * partitionings, and replays. A SQL oracle cannot replay the estimator
  * economically, so the query-level contract is the repo's self-audit
  * pattern: the paired query emits the exact count AND a within-tolerance
  * boolean (p=12 → σ ≈ 1.04/√4096 ≈ 1.6%).
  *
  * Why not Spark's `approx_count_distinct`: same algorithm family, but its
  * xxHash64 seed/layout is an implementation detail the audit could not pin
  * cross-version; this kernel keeps the repo's one-hash-convention
  * (md5/Hash60) so every approximate operator audits against the same
  * portable hash. */
case class HllSketch(
    child: Expression,
    p: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllSketch.State]
  with UnaryLike[Expression] {

  require(p >= 4 && p <= 16, s"precision p=$p must be in [4, 16]")

  override def prettyName: String = "graft_hll"
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): HllSketch.State =
    new HllSketch.State(p)

  override def update(buf: HllSketch.State, input: InternalRow): HllSketch.State = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(buf: HllSketch.State, other: HllSketch.State): HllSketch.State = {
    buf.absorb(other); buf
  }

  override def eval(buf: HllSketch.State): Any = buf.estimate

  override def serialize(buf: HllSketch.State): Array[Byte] = buf.regs.clone()

  override def deserialize(bytes: Array[Byte]): HllSketch.State =
    new HllSketch.State(p, bytes.clone())

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllSketch =
    copy(child = newChild)
}

/** [[HllSketch]] emitting the raw REGISTER VECTOR (binary, 2^p bytes)
  * instead of the estimate — the shard-mergeable partial: a host-stats
  * shard carries one register vector per host (O(hosts), not O(urls)),
  * shards merge by [[HllMergeRegisters]] (register-wise max), and
  * [[HllEstimate]] finalizes. The vector is a pure function of the value
  * SET (max is order/replay-independent), so one-shot and shard-merged
  * sketches are BYTE-IDENTICAL — the spec-pinned merge law. */
case class HllRegisters(
    child: Expression,
    p: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllSketch.State]
  with UnaryLike[Expression] {

  require(p >= 4 && p <= 16, s"precision p=$p must be in [4, 16]")

  override def prettyName: String = "graft_hll_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType

  override def createAggregationBuffer(): HllSketch.State =
    new HllSketch.State(p)

  override def update(buf: HllSketch.State, input: InternalRow): HllSketch.State = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(buf: HllSketch.State, other: HllSketch.State): HllSketch.State = {
    buf.absorb(other); buf
  }

  override def eval(buf: HllSketch.State): Any = buf.regs.clone()

  override def serialize(buf: HllSketch.State): Array[Byte] = buf.regs.clone()

  override def deserialize(bytes: Array[Byte]): HllSketch.State =
    new HllSketch.State(p, bytes.clone())

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegisters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegisters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllRegisters =
    copy(child = newChild)
}

/** Register-wise-max fold of [[HllRegisters]] vectors — the shard merge.
  * Commutative and idempotent: shard layout, merge order, and re-delivered
  * partials cannot change the merged vector. */
case class HllMergeRegisters(
    child: Expression,
    p: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllSketch.State]
  with UnaryLike[Expression] {

  require(p >= 4 && p <= 16, s"precision p=$p must be in [4, 16]")

  override def prettyName: String = "graft_hll_merge"
  override def nullable: Boolean = false
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType

  override def createAggregationBuffer(): HllSketch.State =
    new HllSketch.State(p)

  override def update(buf: HllSketch.State, input: InternalRow): HllSketch.State = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[Array[Byte]]
      require(bytes.length == (1 << p),
        s"register vector length ${bytes.length} != 2^$p — " +
          "sketch precision mismatch")
      buf.absorb(new HllSketch.State(p, bytes))
    }
    buf
  }

  override def merge(buf: HllSketch.State, other: HllSketch.State): HllSketch.State = {
    buf.absorb(other); buf
  }

  override def eval(buf: HllSketch.State): Any = buf.regs.clone()

  override def serialize(buf: HllSketch.State): Array[Byte] = buf.regs.clone()

  override def deserialize(bytes: Array[Byte]): HllSketch.State =
    new HllSketch.State(p, bytes.clone())

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeRegisters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeRegisters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllMergeRegisters =
    copy(child = newChild)
}

/** Scalar finalizer: a register vector → the HLL estimate. Runs over
  * group-sized (post-aggregation) rows only, so the codegen fallback costs
  * nothing on the corpus path. */
case class HllEstimate(child: Expression, p: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(p >= 4 && p <= 16, s"precision p=$p must be in [4, 16]")

  override def prettyName: String = "graft_hll_estimate"
  override def dataType: DataType = LongType

  override protected def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    require(bytes.length == (1 << p),
      s"register vector length ${bytes.length} != 2^$p — " +
        "sketch precision mismatch")
    new HllSketch.State(p, bytes).estimate
  }

  override protected def withNewChildInternal(newChild: Expression): HllEstimate =
    copy(child = newChild)
}

object HllSketch {
  /** Column entry; the child is cast to string (one hash convention). */
  def apply(c: Column): Column = apply(c, 12)

  def apply(c: Column, p: Int): Column =
    GraftSqlBridge.column(
      new HllSketch(GraftSqlBridge.expression(c.cast("string")), p)
        .toAggregateExpression())

  /** Aggregate raw values into a register vector (the shard partial). */
  def registers(c: Column, p: Int = 12): Column =
    GraftSqlBridge.column(
      new HllRegisters(GraftSqlBridge.expression(c.cast("string")), p)
        .toAggregateExpression())

  /** Fold register vectors register-wise-max (the shard merge). */
  def mergeRegisters(c: Column, p: Int = 12): Column =
    GraftSqlBridge.column(
      new HllMergeRegisters(GraftSqlBridge.expression(c), p)
        .toAggregateExpression())

  /** Finalize a register vector to the distinct estimate. */
  def estimateOf(c: Column, p: Int = 12): Column =
    GraftSqlBridge.column(
      HllEstimate(GraftSqlBridge.expression(c), p))

  final class State(val p: Int, val regs: Array[Byte]) {
    def this(p: Int) = this(p, new Array[Byte](1 << p))

    private val m = 1 << p

    def insert(s: UTF8String): Unit = {
      val h = Hash60.compute(s) // 60 portable bits
      val idx = (h >>> (60 - p)).toInt // top p bits -> register
      val w = h & ((1L << (60 - p)) - 1) // remaining 60-p bits
      // rank = leading-zero count WITHIN the (60-p)-bit window, + 1;
      // an all-zero window ranks (60-p)+1, the standard convention
      val rank =
        (java.lang.Long.numberOfLeadingZeros(w) - (64 - (60 - p)) + 1).toByte
      if (rank > regs(idx)) regs(idx) = rank
    }

    def absorb(other: State): Unit = {
      var i = 0
      while (i < m) {
        if (other.regs(i) > regs(i)) regs(i) = other.regs(i)
        i += 1
      }
    }

    def estimate: Long = {
      val alpha = m match {
        case 16 => 0.673
        case 32 => 0.697
        case 64 => 0.709
        case _  => 0.7213 / (1.0 + 1.079 / m)
      }
      var invSum = 0.0
      var zeros = 0
      var i = 0
      while (i < m) {
        invSum += 1.0 / (1L << regs(i)).toDouble
        if (regs(i) == 0) zeros += 1
        i += 1
      }
      val raw = alpha * m.toDouble * m.toDouble / invSum
      // small-range correction: linear counting while any register is empty
      val est =
        if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
        else raw
      math.rint(est).toLong
    }
  }
}
