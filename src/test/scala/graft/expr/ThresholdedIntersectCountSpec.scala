package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Early-exit intersect: above the bound it must equal the plain merge walk
  * exactly; below the bound the true count must really be below (pruning is
  * lossless for threshold filters). */
class ThresholdedIntersectCountSpec extends SparkSpec {
  import spark.implicits._

  test("matches SortedIntersectCount above the bound; prunes only losers") {
    val rng = new scala.util.Random(23)
    def sortedArr(): Seq[Long] =
      Seq.fill(1 + rng.nextInt(40))(rng.nextInt(60).toLong).distinct.sorted
    val rows = Seq.fill(300)((sortedArr(), sortedArr(), rng.nextInt(30).toLong))
    val out = rows.toDF("a", "b", "min_count")
      .select(
        SortedIntersectCount(col("a"), col("b")).as("exact"),
        ThresholdedIntersectCount(col("a"), col("b"), col("min_count")).as("thr"),
        col("min_count"))
      .collect()
    out.foreach { r =>
      val (exact, thr, mc) = (r.getLong(0), r.getLong(1), r.getLong(2))
      if (exact >= mc) assert(thr === exact, s"exact=$exact mc=$mc")
      else assert(thr < mc && (thr === exact || thr === -1L),
        s"exact=$exact thr=$thr mc=$mc")
    }
    // both branches actually exercised
    assert(out.exists(r => r.getLong(1) === -1L))
    assert(out.exists(r => r.getLong(1) >= r.getLong(2)))
  }

  test("jaccardBound never prunes a pair at or above the threshold") {
    // J(A,B) >= t  ⟺  icnt >= t*(|A|+|B|)/(1+t); the floor'd bound must sit
    // at or below every passing pair's true count.
    for (na <- 1 to 50; nb <- 1 to 50; icnt <- 0 to math.min(na, nb)) {
      val j = icnt.toDouble / (na + nb - icnt).toDouble
      val bound = math.floor((na + nb).toDouble * (0.6 / 1.6)).toLong
      if (j >= 0.6) assert(icnt >= bound, s"na=$na nb=$nb icnt=$icnt")
    }
  }
}
