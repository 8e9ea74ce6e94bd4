package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Trend windows over the statements mart: lag/lead offsets, null/zero-safe
  * YoY, and the trailing-3-row moving average (frame-bounded). */
class TrendsSpec extends SparkSpec {
  import spark.implicits._

  private val statements = Seq(
    ("A", 2000, Some(100.0)),
    ("A", 2001, Some(110.0)),
    ("A", 2002, Some(121.0)),
    ("A", 2003, None),
    ("B", 2000, Some(50.0))
  ).toDF("cik", "fiscal_year", "revenues")

  test("lag/lead stay within the cik partition") {
    val got = Trends.revenueTrends(statements).orderBy("cik", "fiscal_year")
      .collect().map(r => (r.getString(0), r.getInt(1),
        Option(r.get(3)), Option(r.get(4)))).toSeq
    assert(got.head === (("A", 2000, None, Some(110.0)))) // no prior; next=2001
    assert(got(2) === (("A", 2002, Some(110.0), None)))   // 2003 rev is null
    assert(got.last === (("B", 2000, None, None)))        // B sees nothing of A
  }

  test("forwardFill carries the last non-null value and records its year") {
    val got = Trends.forwardFill(statements).orderBy("cik", "fiscal_year")
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((Option(r.get(3)), Option(r.get(4))))).toMap
    assert(got(("A", 2002)) === ((Some(121.0), Some(2002)))) // present: itself
    assert(got(("A", 2003)) === ((Some(121.0), Some(2002)))) // null: carried
    assert(got(("B", 2000)) === ((Some(50.0), Some(2000))))  // partition-local
  }

  test("yoy is null-safe and exact; ma3 averages the non-null trailing frame") {
    val byKey = Trends.revenueTrends(statements).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((Option(r.get(5)).map(_.asInstanceOf[Double]),
          Option(r.get(6)).map(_.asInstanceOf[Double])))).toMap
    val (yoy2001, ma2001) = byKey(("A", 2001))
    assert(yoy2001.exists(v => math.abs(v - 0.1) < 1e-12))
    assert(ma2001.exists(v => math.abs(v - 105.0) < 1e-12))
    val (yoy2002, ma2002) = byKey(("A", 2002))
    assert(yoy2002.exists(v => math.abs(v - 0.1) < 1e-12))
    assert(ma2002.exists(v => math.abs(v - (331.0 / 3)) < 1e-9))
    // 2003: revenue null -> yoy null; ma3 averages the 2 non-null rows in frame
    val (yoy2003, ma2003) = byKey(("A", 2003))
    assert(yoy2003.isEmpty)
    assert(ma2003.exists(v => math.abs(v - 115.5) < 1e-12))
    // first year has no prior -> yoy null
    assert(byKey(("A", 2000))._1.isEmpty)
  }
}
