package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** A7: null/zero-safe division never divides by zero and propagates nulls. */
class RatiosSpec extends SparkSpec {
  import spark.implicits._

  test("safeDiv: null/zero denominators -> null; null numerator propagates") {
    val df = Seq(
      (Some(10.0), Some(2.0)),   // 5.0
      (Some(10.0), Some(0.0)),   // null (guard, not Infinity)
      (Some(10.0), None),        // null
      (None, Some(2.0)),         // null (numerator null propagates through /)
      (Some(0.0), Some(4.0))     // 0.0
    ).toDF("a", "b")
    val out = df.select(Ratios.safeDiv(col("a"), col("b")).as("r"))
    assert(rows(out) === Seq(Seq(5.0), Seq(null), Seq(null), Seq(null), Seq(0.0)))
  }

  test("compute emits the 8-ratio block with null-safe semantics") {
    val st = Seq(("c1", 2020, 100.0, 40.0, 25.0, 20.0, 200.0, 120.0, 0.0,
      30.0, 10.0, 20.0)).toDF(
      "cik", "fiscal_year", "revenues", "gross_profit", "operating_income",
      "net_income", "total_assets", "total_liabilities", "total_equity",
      "operating_cash_flow", "capex", "free_cash_flow")
    val r = Ratios.compute(st).collect().head
    assert(r.getAs[Double]("gross_margin") === 0.4)
    assert(r.getAs[Double]("roa") === 0.1)
    // equity = 0 -> roe and leverage null, not Infinity
    assert(r.isNullAt(r.fieldIndex("roe")))
    assert(r.isNullAt(r.fieldIndex("leverage")))
    assert(r.getAs[Double]("asset_turnover") === 0.5)
  }
}
