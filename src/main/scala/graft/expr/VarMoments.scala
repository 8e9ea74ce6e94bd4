package graft.expr

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` (the Dataset-native UDAF surface — complements the
  * row-based TypedImperativeAggregate in MisraGriesTopK): sample variance
  * from EXACT integer moments.
  *
  * Input is a milli-quantized value (x → floor(x·1000 + 0.5), the engine's
  * rounding-parity recipe); the buffer is (n, Σq, Σq²) in plain Longs —
  * exact, order-insensitive, and merge-associative, so partial aggregation
  * and ANY shuffle/merge order give byte-identical results (the reason not
  * to use float Welford here: its result depends on merge order, which a
  * cluster does not fix). Overflow bound: Σq² stays under 2⁶³ while
  * n·(1000·max|x|)² < 9.2e18 — e.g. 3.6e9 rows of values up to 50. Beyond
  * that, widen the buffer to Decimal(38,0), same shape.
  *
  * The finish step is the only float arithmetic, in a pinned association
  * order mirrored by the oracle SQL:
  *   mean = Σq / n / 1000
  *   var  = (Σq² − Σq·Σq/n) / (n−1) / 10⁶
  */
object VarMoments extends Aggregator[Long, (Long, Long, Long), (Long, Double, Double)] {
  override def zero: (Long, Long, Long) = (0L, 0L, 0L)
  override def reduce(b: (Long, Long, Long), q: Long): (Long, Long, Long) =
    (b._1 + 1, b._2 + q, b._3 + q * q)
  override def merge(a: (Long, Long, Long), b: (Long, Long, Long)): (Long, Long, Long) =
    (a._1 + b._1, a._2 + b._2, a._3 + b._3)
  override def finish(b: (Long, Long, Long)): (Long, Double, Double) = {
    val n = b._1.toDouble
    val s = b._2.toDouble
    val sq = b._3.toDouble
    val mean = s / n / 1000.0
    val variance = (sq - s * s / n) / (n - 1.0) / 1000000.0
    (b._1, mean, variance)
  }
  override def bufferEncoder: Encoder[(Long, Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[(Long, Double, Double)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaDouble)
}
