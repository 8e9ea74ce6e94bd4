package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** VarMoments: agreement with Spark's own var_samp (to float tolerance),
  * exactness invariants of the long-moment buffer, and merge-order
  * insensitivity (bit-equal across repartitionings). */
class VarMomentsSpec extends SparkSpec {
  import spark.implicits._

  private def varOf(xs: Seq[Double], parts: Int): (Long, Double, Double) =
    xs.toDS().repartition(parts)
      .select(floor(col("value") * 1000 + 0.5).cast("long").as("q"))
      .as[Long]
      .groupByKey(_ => 1).agg(VarMoments.toColumn)
      .collect().head._2

  test("matches var_samp and avg to float tolerance") {
    val xs = Seq(1.0, 2.0, 2.0, 3.5, 10.0, 44.0)
    val (n, mean, v) = varOf(xs, 3)
    val expected = xs.toDS().agg(avg("value"), var_samp("value"))
      .as[(Double, Double)].head()
    assert(n === xs.size)
    assert(math.abs(mean - expected._1) < 1e-9)
    assert(math.abs(v - expected._2) < 1e-6)
  }

  test("merge-order insensitive: identical bits across any partitioning") {
    val rnd = new scala.util.Random(42)
    val xs = List.fill(257)(rnd.nextDouble() * 50.0)
    val base = varOf(xs, 1)
    for (parts <- Seq(2, 3, 7, 16)) {
      assert(varOf(xs, parts) === base, // exact long moments: order can't matter
        s"parts=$parts")
    }
  }

  test("single observation yields NaN variance (n-1 = 0), not a crash") {
    val (n, mean, v) = varOf(Seq(7.0), 1)
    assert(n === 1L && mean === 7.0 && v.isNaN)
  }
}
