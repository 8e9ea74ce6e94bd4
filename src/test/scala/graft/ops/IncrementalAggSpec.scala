package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental aggregate maintenance: the merge of partials over any
  * partitioning of the rows equals partials over all rows. */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("l_returnflag", "l_linestatus")
  private def li(rows: (String, String, Double, Double)*): DataFrame =
    rows.toDF("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")

  private val all = li(
    ("A", "F", 1.0, 10.0), ("A", "F", 2.0, 5.0), ("A", "O", 3.0, 7.0),
    ("R", "F", 4.0, 1.0), ("R", "F", 0.5, 99.0))

  private def canon(df: DataFrame): Seq[Seq[Any]] =
    rows(df.orderBy(keys.map(col): _*))

  test("merge of split partials equals partials of the whole") {
    val scratch = IncrementalAgg.partials(all, keys)
    val a = IncrementalAgg.partials(all.limit(2), keys)
    val b = IncrementalAgg.partials(all.offset(2), keys)
    assert(canon(IncrementalAgg.merge(keys, a, b)) === canon(scratch))
  }

  test("empty delta is the identity; merge is associative across 3 deltas") {
    val scratch = IncrementalAgg.partials(all, keys)
    val empty = IncrementalAgg.partials(all.limit(0), keys)
    assert(canon(IncrementalAgg.merge(keys, scratch, empty)) === canon(scratch))
    val parts = Seq(all.limit(1), all.offset(1).limit(2), all.offset(3))
      .map(IncrementalAgg.partials(_, keys))
    assert(canon(IncrementalAgg.merge(keys, parts: _*)) === canon(scratch))
  }

  test("a delta introducing a NEW group appears in the merged state") {
    val base = IncrementalAgg.partials(all, keys)
    val delta = IncrementalAgg.partials(li(("N", "O", 7.0, 3.0)), keys)
    val merged = IncrementalAgg.merge(keys, base, delta)
    val n = merged.filter(col("l_returnflag") === "N").collect()
    assert(n.length === 1 && n(0).getAs[Long]("n_rows") === 1L)
  }

  test("derived avg comes from merged sums, not averaged averages") {
    // groups sized 2 and 1: naive avg-of-avgs would weight them equally
    val a = IncrementalAgg.partials(all.limit(2), keys) // A/F: qty 1+2
    val b = IncrementalAgg.partials(all.offset(2), keys)
    val m = IncrementalAgg.withDerived(IncrementalAgg.merge(keys, a, b))
      .filter(col("l_returnflag") === "A" && col("l_linestatus") === "F")
    assert(m.select("avg_qty").head.getDouble(0) === 1.5)
  }
}
