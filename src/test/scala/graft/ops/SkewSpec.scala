package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Skew mitigation + approximate aggregates: the salted two-stage sum must
  * equal the plain groupBy exactly; HLL estimates must sit within rsd. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (1 to 2000).map { i =>
    (if (i % 10 == 0) "hot" else s"key${i % 7}", i.toLong % 97, i * 0.5)
  }.toDF("event_type", "user_id", "value")

  test("saltedSumCount == plain groupBy sum/count") {
    val salted = Skew.saltedSumCount(rows, Seq("event_type"), "value")
      .orderBy("event_type").collect()
    val plain = rows.groupBy("event_type")
      .agg(sum(col("value").cast("decimal(38,6)")).cast("double").as("s"),
        count(lit(1)).as("n"))
      .orderBy("event_type").collect()
    assert(salted.length === plain.length)
    salted.zip(plain).foreach { case (a, b) =>
      assert(a.getString(0) === b.getString(0))
      assert(a.getAs[Double]("sum_value") === b.getAs[Double]("s"))
      assert(a.getAs[Long]("n_rows") === b.getAs[Long]("n"))
    }
  }

  test("approxDistinct within 5% of exact at rsd 1%") {
    val approx = Skew.approxDistinct(rows).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("approx_users")).toMap
    val exact = rows.groupBy("event_type")
      .agg(countDistinct("user_id").as("d")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      assert(math.abs(approx(k) - ex) <= math.max(1L, (ex * 0.05).toLong),
        s"$k: approx ${approx(k)} vs exact $ex")
    }
  }
}
