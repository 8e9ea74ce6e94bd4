package graft.expr

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan 2005) — the FREQUENCY member
  * of the repo's mergeable-sketch family (HyperLogLog answers distinct,
  * Misra-Gries answers top-k, this answers "how often does key x occur"
  * for ANY x, without a vocabulary-sized shuffle): d hash rows of w
  * counters; insert bumps one counter per row, the point estimate is the
  * MIN over rows — always ≥ the true count, over by at most ~N/w per row
  * with d-fold independence knocking outliers down. The corpus-scale use:
  * n-gram/token frequency for repetition filtering over 100 TB where the
  * exact groupBy's key space doesn't fit anywhere.
  *
  * Merge law: counters are SUMS, so shard sketches merge counter-wise
  * additive and the merged sketch is BYTE-IDENTICAL to the one-shot build
  * (exact integers, order-independent) — strictly stronger than the HLL
  * register-max law, and the q173 gate asserts the byte equality.
  *
  * Determinism: rows hash the engine-portable md5-based [[Hash60]] over
  * the salted key (`"cms|<row>|<value>"` — one hash convention repo-wide),
  * so estimates are reproducible across sessions, partitionings, and
  * replays. The serialized form carries a (depth, width) header so a
  * precision mismatch fails loudly instead of scoring against a
  * wrong-shaped counter table.
  */
object Cms {
  val DefaultDepth = 4
  val DefaultWidth = 2048

  def sketch(c: Column): Column = sketch(c, DefaultDepth, DefaultWidth)
  def sketch(c: Column, depth: Int, width: Int): Column =
    GraftSqlBridge.column(
      new CmsSketchAgg(GraftSqlBridge.expression(c.cast("string")), depth,
        width).toAggregateExpression())

  /** Counter-wise-sum fold of serialized sketches (the shard merge). */
  def merge(c: Column): Column =
    GraftSqlBridge.column(
      new CmsMergeAgg(GraftSqlBridge.expression(c)).toAggregateExpression())

  /** Point-frequency estimate of `key` from a serialized sketch. */
  def estimateOf(sketchCol: Column, key: Column): Column =
    GraftSqlBridge.column(CmsEstimate(
      GraftSqlBridge.expression(sketchCol),
      GraftSqlBridge.expression(key.cast("string"))))

  /** Counter-wise DIFFERENCE of two serialized sketches — the takedown
    * law run backwards: counters are sums of per-item contributions, so
    * for a removed set R that IS a sub-multiset of the sketched corpus A,
    * `subtract(cms(A), cms(R))` is BYTE-IDENTICAL to `cms(A \ R)` (the
    * merge law's inverse; spec-pinned). Refuses loudly on geometry
    * mismatch or a negative counter (proof R was not contained in A —
    * a silent floor-at-zero would leave a sketch that matches NO corpus).
    * HLL registers have no such inverse (max is not invertible), which
    * is why HLL-bearing marts rebuild on takedown instead. */
  def subtractOf(a: Column, b: Column): Column =
    GraftSqlBridge.column(CmsSubtract(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  final class State(val depth: Int, val width: Int,
      val counters: Array[Long]) {
    def this(depth: Int, width: Int) =
      this(depth, width, new Array[Long](depth * width))

    def insert(s: UTF8String): Unit = {
      var r = 0
      while (r < depth) {
        counters(r * width + Cms.bucketOf(s, r, width)) += 1L
        r += 1
      }
    }

    def absorb(other: State): Unit = {
      require(other.depth == depth && other.width == width,
        s"sketch shape mismatch: ${other.depth}x${other.width} vs " +
          s"${depth}x$width")
      var i = 0
      while (i < counters.length) {
        counters(i) += other.counters(i)
        i += 1
      }
    }

    def estimate(s: UTF8String): Long = {
      var best = Long.MaxValue
      var r = 0
      while (r < depth) {
        val c = counters(r * width + Cms.bucketOf(s, r, width))
        if (c < best) best = c
        r += 1
      }
      best
    }

    def serialize(): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + 8 * counters.length)
      bb.putInt(depth).putInt(width)
      var i = 0
      while (i < counters.length) { bb.putLong(counters(i)); i += 1 }
      bb.array()
    }
  }

  def deserialize(bytes: Array[Byte]): State = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val d = bb.getInt()
    val w = bb.getInt()
    require(bytes.length == 8 + 8 * d * w,
      s"corrupt CMS payload: ${bytes.length} bytes for ${d}x$w")
    val counters = new Array[Long](d * w)
    var i = 0
    while (i < counters.length) { counters(i) = bb.getLong(); i += 1 }
    new State(d, w, counters)
  }

  /** Row-salted portable bucket — the one-hash-convention kernel. */
  private[expr] def bucketOf(s: UTF8String, row: Int, width: Int): Int =
    (Hash60.compute(UTF8String.concat(
      UTF8String.fromString(s"cms|$row|"), s)) % width).toInt
}

/** Aggregate raw values into a serialized sketch (the shard partial). */
case class CmsSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Cms.State]
  with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16, s"depth $depth out of [1, 16]")
  require(width >= 16 && width <= (1 << 22), s"width $width out of range")

  override def prettyName: String = "graft_cms_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Cms.State =
    new Cms.State(depth, width)

  override def update(buf: Cms.State, input: InternalRow): Cms.State = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(buf: Cms.State, other: Cms.State): Cms.State = {
    buf.absorb(other); buf
  }

  override def eval(buf: Cms.State): Any = buf.serialize()
  override def serialize(buf: Cms.State): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): Cms.State =
    Cms.deserialize(bytes)

  override def withNewMutableAggBufferOffset(n: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): CmsSketchAgg =
    copy(child = c)
}

/** Counter-wise-sum fold of serialized sketches — shard-order- and
  * replay-partitioning-independent (integer sums). */
case class CmsMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[Cms.State]]
  with UnaryLike[Expression] {

  override def prettyName: String = "graft_cms_merge"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Option[Cms.State] = None

  override def update(buf: Option[Cms.State],
      input: InternalRow): Option[Cms.State] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val s = Cms.deserialize(v.asInstanceOf[Array[Byte]])
      buf match {
        case Some(acc) => acc.absorb(s); buf
        case None => Some(s)
      }
    }
  }

  override def merge(buf: Option[Cms.State],
      other: Option[Cms.State]): Option[Cms.State] = (buf, other) match {
    case (Some(a), Some(b)) => a.absorb(b); buf
    case (None, b) => b
    case (a, None) => a
  }

  override def eval(buf: Option[Cms.State]): Any =
    buf.map(_.serialize()).getOrElse(
      new Cms.State(Cms.DefaultDepth, Cms.DefaultWidth).serialize())

  override def serialize(buf: Option[Cms.State]): Array[Byte] =
    buf.map(_.serialize()).getOrElse(Array.emptyByteArray)
  override def deserialize(bytes: Array[Byte]): Option[Cms.State] =
    if (bytes.isEmpty) None else Some(Cms.deserialize(bytes))

  override def withNewMutableAggBufferOffset(n: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): CmsMergeAgg =
    copy(child = c)
}

/** Scalar point-frequency read: (sketch, key) → min-over-rows counter.
  * Runs over group-sized rows (post-aggregation), so the codegen fallback
  * costs nothing on the corpus path. */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "graft_cms_estimate"
  override def dataType: DataType = LongType

  override protected def nullSafeEval(sketch: Any, key: Any): Any =
    Cms.deserialize(sketch.asInstanceOf[Array[Byte]])
      .estimate(key.asInstanceOf[UTF8String])

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): CmsEstimate = copy(left = l, right = r)
}

/** Scalar counter-wise sketch difference (see [[Cms.subtractOf]]) — a
  * maintenance-path op over group-sized rows, like [[CmsEstimate]]. */
case class CmsSubtract(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "graft_cms_subtract"
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val sa = Cms.deserialize(a.asInstanceOf[Array[Byte]])
    val sb = Cms.deserialize(b.asInstanceOf[Array[Byte]])
    require(sa.depth == sb.depth && sa.width == sb.width,
      s"CMS geometry mismatch: ${sa.depth}x${sa.width} vs " +
        s"${sb.depth}x${sb.width}")
    val out = new Array[Long](sa.counters.length)
    var i = 0
    while (i < out.length) {
      val d = sa.counters(i) - sb.counters(i)
      if (d < 0) throw new IllegalArgumentException(
        "CMS subtract underflow: the removed set is not contained in " +
          "the sketched corpus — rebuild instead of subtracting")
      out(i) = d
      i += 1
    }
    new Cms.State(sa.depth, sa.width, out).serialize()
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): CmsSubtract = copy(left = l, right = r)
}
