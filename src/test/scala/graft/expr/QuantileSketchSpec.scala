package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The deterministic KLL sketch: rank-error bounds on random and adversarial
  * orderings, determinism across identical runs, and the distributed merge
  * path (many partitions → one sketch per group). */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private val ps = Seq(0.1, 0.25, 0.5, 0.75, 0.9)

  /** True rank window of `est` in `xs`: [#{x < est}/n, #{x <= est}/n]. */
  private def rankWindow(xs: Array[Double], est: Double): (Double, Double) = {
    val lt = xs.count(_ < est).toDouble / xs.length
    val le = xs.count(_ <= est).toDouble / xs.length
    (lt, le)
  }

  private def assertBounds(xs: Array[Double], parts: Int, eps: Double): Unit = {
    val ests = xs.toSeq.toDF("x").repartition(parts)
      .agg(QuantileSketch(col("x"), ps, 512).as("e"))
      .head.getSeq[Double](0)
    ps.zip(ests).foreach { case (p, est) =>
      val (lo, hi) = rankWindow(xs, est)
      assert(lo - eps <= p && p <= hi + eps,
        s"p=$p est=$est rank window [$lo, $hi] outside eps=$eps")
    }
  }

  test("rank error within bound on shuffled, sorted, and reversed inputs") {
    val rng = new scala.util.Random(11)
    val xs = Array.fill(20000)(rng.nextDouble() * 1000.0)
    assertBounds(xs, parts = 8, eps = 0.05)
    assertBounds(xs.sorted, parts = 8, eps = 0.05)          // adversarial order
    assertBounds(xs.sorted.reverse, parts = 8, eps = 0.05)
    assertBounds(Array.fill(5000)(7.5), parts = 4, eps = 0.05) // all ties
  }

  test("small groups (below capacity) are exact") {
    val xs = (1 to 100).map(_.toDouble).toArray
    val ests = xs.toSeq.toDF("x")
      .agg(QuantileSketch(col("x"), Seq(0.5), 512).as("e"))
      .head.getSeq[Double](0)
    assert(ests.head === 50.0) // ceil(0.5 * 100) = rank 50
  }

  test("deterministic: identical runs produce identical estimates") {
    val rng = new scala.util.Random(23)
    val xs = Array.fill(30000)(rng.nextGaussian())
    def run(): Seq[Double] = xs.toSeq.toDF("x").repartition(6)
      .agg(QuantileSketch(col("x"), ps, 256).as("e"))
      .head.getSeq[Double](0)
    assert(run() === run())
  }

  test("compaction and merge conserve total weight exactly") {
    val rng = new scala.util.Random(5)
    val a = new QuantileSketch.State(16)
    (1 to 12345).foreach(_ => a.insert(rng.nextDouble()))
    def weight(s: QuantileSketch.State): Long =
      s.levels.zipWithIndex.map { case (buf, l) => buf.length.toLong << l }.sum
    assert(weight(a) === 12345L) // odd compactions would drift ±2^l each
    val b = new QuantileSketch.State(16)
    (1 to 777).foreach(_ => b.insert(rng.nextDouble()))
    a.absorb(b)
    assert(weight(a) === 12345L + 777L)
  }

  test("null inputs are ignored; empty group yields NaN") {
    val ests = Seq(Some(1.0), None, Some(3.0), None).toDF("x")
      .agg(QuantileSketch(col("x"), Seq(0.5), 64).as("e"))
      .head.getSeq[Double](0)
    assert(ests.head === 1.0) // ceil(0.5*2) = rank 1 of {1.0, 3.0}
    val empty = Seq.empty[Double].toDF("x")
      .agg(QuantileSketch(col("x"), Seq(0.5), 64).as("e"))
      .head.getSeq[Double](0)
    assert(empty.head.isNaN)
  }
}
