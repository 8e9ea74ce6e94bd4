package graft.expr

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Deterministic KLL-style quantile sketch (Karnin, Lang, Liberty 2016,
  * "Optimal quantile approximation in streams") as a mergeable native
  * aggregate: per-group state is a ladder of capacity-`k` buffers where
  * level `l` holds items of weight 2^l; a full buffer sorts, promotes
  * alternating ranks of its PAIRED prefix to the level above, discards their
  * partners, and (odd length) retains the one unpaired item in place — so
  * total weight is conserved exactly through every compaction. The classic
  * algorithm picks the alternation offset randomly; here it FLIPS
  * deterministically per level (the standard derandomization), so there is
  * no RNG anywhere: a fixed sequence of update/merge operations always
  * yields the same sketch (pinned by spec in local mode). On a cluster,
  * reduce-side MERGE ORDER is not something Spark guarantees across
  * runs/retries — compaction timing then moves estimates, but only within
  * the rank-error envelope, which is why the q87 gate checks the envelope
  * (a run-stable invariant) rather than point estimates.
  *
  * Why this exists next to q44's exact percentiles: exact `percentile`
  * buffers every value of a group — O(group size) memory and a full sort —
  * while the sketch partial-aggregates map-side and ships O(k·log(n/k))
  * doubles per group through the shuffle, the mergeable-summaries shape
  * that survives a 100 TB group. Rank error is bounded by ~L/k of the group
  * size (L = levels ≈ log2(n/k)); with k=512 and n=10^9 that is ≈ 4%, and
  * the q87 gate self-audits a 5% bound: the query emits rank-window
  * BOOLEANS computed against the true ranks, so a bound violation turns the
  * row false and hash-mismatches the all-true oracle (the q37 exact+tolerance
  * pattern).
  *
  * Merge concatenates per-level buffers and re-compacts bottom-up —
  * associative up to compaction timing, which moves estimates only within
  * the same rank-error envelope the gate checks.
  */
case class QuantileSketch(
    child: Expression,
    ps: Seq[Double],
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketch.State]
  with UnaryLike[Expression] {

  require(k >= 8, s"capacity k=$k must be >= 8")
  require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
    s"quantiles $ps must be within [0, 1]")

  override def prettyName: String = "graft_quantile_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): QuantileSketch.State =
    new QuantileSketch.State(k)

  override def update(buf: QuantileSketch.State,
      input: InternalRow): QuantileSketch.State = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: QuantileSketch.State,
      other: QuantileSketch.State): QuantileSketch.State = {
    buf.absorb(other); buf
  }

  override def eval(buf: QuantileSketch.State): Any =
    new GenericArrayData(buf.queryAll(ps).toArray[Any])

  override def serialize(buf: QuantileSketch.State): Array[Byte] = buf.toBytes

  override def deserialize(bytes: Array[Byte]): QuantileSketch.State =
    QuantileSketch.State.fromBytes(bytes, k)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketch =
    copy(child = newChild)
}

object QuantileSketch {
  def apply(c: Column, ps: Seq[Double], k: Int): Column =
    GraftSqlBridge.column(
      new QuantileSketch(GraftSqlBridge.expression(c), ps, k)
        .toAggregateExpression())

  /** Buffer ladder; `parity(l)` is the deterministic alternation offset. */
  final class State(val k: Int) {
    val levels: mutable.ArrayBuffer[mutable.ArrayBuffer[Double]] =
      mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Double])
    val parity: mutable.ArrayBuffer[Int] = mutable.ArrayBuffer(0)

    def insert(v: Double): Unit = { levels(0) += v; compactFrom(0) }

    private def compactFrom(start: Int): Unit = {
      var l = start
      while (l < levels.length && levels(l).length >= k) {
        if (l + 1 == levels.length) {
          levels += mutable.ArrayBuffer.empty[Double]
          parity += 0
        }
        val buf = levels(l)
        val sorted = buf.toArray
        java.util.Arrays.sort(sorted)
        // Compact PAIRS only: promoting alternating ranks of an odd-length
        // buffer would drift total sketch weight by ±2^l per odd compaction;
        // classic KLL conserves weight by carrying one leftover item, so the
        // unpaired maximum stays at this level.
        val pairs = sorted.length / 2
        val off = parity(l)
        parity(l) ^= 1
        val up = levels(l + 1)
        var i = off
        while (i < 2 * pairs) { up += sorted(i); i += 2 }
        buf.clear()
        if (sorted.length % 2 == 1) buf += sorted(sorted.length - 1)
        l += 1
      }
    }

    def absorb(other: State): Unit = {
      var l = 0
      while (l < other.levels.length) {
        if (l == levels.length) {
          levels += mutable.ArrayBuffer.empty[Double]
          parity += 0
        }
        levels(l) ++= other.levels(l)
        l += 1
      }
      var i = 0
      while (i < levels.length) { compactFrom(i); i += 1 }
    }

    /** Smallest value whose cumulative weight reaches ceil(p * W). */
    def query(p: Double): Double = queryAll(Seq(p)).head

    /** All quantiles against ONE flatten+sort+cumulate pass (eval calls
      * this once per group — re-sorting the sketch per quantile would
      * repeat the O(k·L log(k·L)) work |ps| times). */
    def queryAll(ps: Seq[Double]): Seq[Double] = {
      val flat = mutable.ArrayBuffer.empty[(Double, Long)]
      var l = 0
      while (l < levels.length) {
        val w = 1L << l
        levels(l).foreach(v => flat += ((v, w)))
        l += 1
      }
      if (flat.isEmpty) return ps.map(_ => Double.NaN)
      val sorted = flat.sortBy(_._1)
      val total = sorted.iterator.map(_._2).sum
      ps.map { p =>
        val target = math.max(1L, math.ceil(p * total).toLong)
        var cum = 0L
        var i = 0
        var out = sorted.last._1
        var done = false
        while (i < sorted.length && !done) {
          cum += sorted(i)._2
          if (cum >= target) { out = sorted(i)._1; done = true }
          i += 1
        }
        out
      }
    }

    def toBytes: Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(levels.length)
      var l = 0
      while (l < levels.length) {
        out.writeInt(parity(l))
        out.writeInt(levels(l).length)
        levels(l).foreach(out.writeDouble)
        l += 1
      }
      out.flush()
      bos.toByteArray
    }
  }

  object State {
    def fromBytes(bytes: Array[Byte], k: Int): State = {
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val s = new State(k)
      val nLevels = in.readInt()
      var l = 0
      while (l < nLevels) {
        if (l == s.levels.length) {
          s.levels += mutable.ArrayBuffer.empty[Double]
          s.parity += 0
        }
        s.parity(l) = in.readInt()
        val n = in.readInt()
        var i = 0
        while (i < n) { s.levels(l) += in.readDouble(); i += 1 }
        l += 1
      }
      s
    }
  }
}
