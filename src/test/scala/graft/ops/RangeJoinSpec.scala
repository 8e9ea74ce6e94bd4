package graft.ops

import java.sql.Date

import graft.SparkSpec

/** Bucketed interval-containment join: boundary inclusivity, cross-month
  * intervals, no duplicate matches from the bucket explode, key isolation. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  private val intervals = Seq(
    ("k1", 1L, d("2020-01-15"), d("2020-03-15")), // spans 3 month-buckets
    ("k1", 2L, d("2020-03-16"), d("2020-03-31")), // sub-month interval
    ("k2", 3L, d("2020-01-01"), d("2020-12-31"))
  ).toDF("k", "iv_id", "start", "end")

  private val points = Seq(
    ("k1", 10L, d("2020-01-15")), // on start boundary -> iv 1
    ("k1", 11L, d("2020-02-10")), // inside iv 1
    ("k1", 12L, d("2020-03-15")), // on end boundary -> iv 1 only
    ("k1", 13L, d("2020-03-20")), // iv 2
    ("k1", 14L, d("2020-04-01")), // no interval
    ("k2", 15L, d("2020-02-10"))  // key isolation -> iv 3
  ).toDF("k", "pt_id", "t")

  test("containment matches are exact, inclusive, and deduplicated") {
    val out = RangeJoin.containmentJoin(intervals, points,
      Seq("k"), "start", "end", "t")
      .select("iv_id", "pt_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 10L), (1L, 11L), (1L, 12L), (2L, 13L), (3L, 15L)))
    // no duplicates despite multi-bucket intervals
    val n = RangeJoin.containmentJoin(intervals, points,
      Seq("k"), "start", "end", "t").count()
    assert(n === 5L)
  }
}
