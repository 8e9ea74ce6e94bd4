package graft.ops

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** As-of join semantics: inclusive <=, latest-right-wins, left rows before
  * any right row carry nulls, keys don't leak across partitions. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  private val left = Seq(
    (1L, "k1", d("2020-06-01")),
    (2L, "k1", d("2020-01-15")),  // between r1 and r2
    (3L, "k1", d("2019-12-31")),  // before any right row -> null
    (4L, "k2", d("2020-06-01")),  // other key
    (5L, "k1", d("2020-02-01"))   // exactly equal to r2 -> inclusive
  ).toDF("id", "k", "t")

  private val right = Seq(
    ("k1", d("2020-01-01"), "r1"),
    ("k1", d("2020-02-01"), "r2"),
    ("k2", d("2020-05-05"), "r3")
  ).toDF("k", "rt", "tag")

  test("latest right row at or before each left time, per key") {
    val out = AsofJoin.asof(left, right, Seq("k"), "t", "rt", Seq("tag"),
      tieBreak = Seq(col("id").asc_nulls_first))
      .orderBy("id").collect()
    val tags = out.map(r => r.getLong(0) -> r.getAs[String]("asof_tag")).toMap
    assert(tags(1L) === "r2") // latest of r1, r2
    assert(tags(2L) === "r1")
    assert(tags(3L) === null) // nothing at or before
    assert(tags(4L) === "r3") // key isolation
    assert(tags(5L) === "r2") // inclusive <=
  }

  test("left columns pass through untouched") {
    val out = AsofJoin.asof(left, right, Seq("k"), "t", "rt", Seq("tag"))
    assert(out.columns.toSeq === Seq("id", "k", "t", "asof_tag"))
    assert(out.count() === 5)
  }
}
