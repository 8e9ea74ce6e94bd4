package graft.ops

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sec.SecTags

/** Units for the statement builders: A1 tie determinism, F6 duration
  * boundaries, A4 candidate order (v2 vs v3), A5 null propagation, A6 sign
  * normalization (SURVEY §5 item 2). */
class StatementsSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  // (cik, fiscal_year, tag, value, filed, fact_id)
  private val narrowSchema = Seq("cik", "fiscal_year", "tag", "value", "filed", "fact_id")

  test("latestWins keeps exactly one row per key, latest filed first") {
    val df = Seq(
      ("c1", 2020, "Revenues", 10.0, d("2021-02-01"), 1L),
      ("c1", 2020, "Revenues", 20.0, d("2021-03-01"), 2L), // latest -> wins
      ("c1", 2021, "Revenues", 30.0, d("2022-02-01"), 3L)
    ).toDF(narrowSchema: _*)
    val out = Statements.latestWins(
      Seq("cik", "fiscal_year", "tag"), Statements.dedupOrder)(df)
      .select("fiscal_year", "value").orderBy("fiscal_year")
    assert(rows(out) === Seq(Seq(2020, 20.0), Seq(2021, 30.0)))
  }

  test("latestWins breaks filed ties by value desc then fact_id asc — deterministic") {
    val df = Seq(
      ("c1", 2020, "Revenues", 10.0, d("2021-02-01"), 9L),
      ("c1", 2020, "Revenues", 50.0, d("2021-02-01"), 7L), // same filed, higher value
      ("c1", 2020, "Revenues", 50.0, d("2021-02-01"), 8L)  // full tie -> lower fact_id
    ).toDF(narrowSchema: _*)
    val out = Statements.latestWins(
      Seq("cik", "fiscal_year", "tag"),
      Statements.dedupOrder :+ col("fact_id").asc)(df)
    assert(rows(out.select("value", "fact_id")) === Seq(Seq(50.0, 7L)))
  }

  test("flowFacts keeps 330..380-day periods inclusive, drops 329/381") {
    def fact(id: Long, start: String, end: String) =
      (id, "c1", "us-gaap", "Revenues", "USD", d(start), d(end), 1.0,
        "ACC-1", "10-K", d("2021-01-01"), "CY2020")
    val df = Seq(
      fact(1, "2020-01-01", "2020-11-25"), // 329 days -> dropped
      fact(2, "2020-01-01", "2020-11-26"), // 330 -> kept
      fact(3, "2020-01-01", "2021-01-15"), // 380 -> kept
      fact(4, "2020-01-01", "2021-01-16")  // 381 -> dropped
    ).toDF("fact_id", "cik", "taxonomy", "tag", "unit", "period_start",
      "period_end", "value", "filing_accession_no", "form", "filed", "frame")
    assert(singleCol[Long](Statements.flowFacts(df).select("fact_id")
      .orderBy("fact_id")) === Seq(2L, 3L))
  }

  test("derive: capex sign normalized, fcf = ocf - |capex|, null-propagating") {
    val wide = Seq(
      ("c1", 2020, Some(100.0), Some(-30.0)),  // negative capex -> abs
      ("c2", 2020, Some(100.0), None),         // no capex -> fcf null
      ("c3", 2020, None, Some(10.0))           // no ocf -> fcf null
    ).toDF("cik", "fiscal_year",
      "NetCashProvidedByUsedInOperatingActivities",
      "PaymentsToAcquirePropertyPlantAndEquipment")
    val padded = SecTags.coreTags
      .filterNot(t => t == "NetCashProvidedByUsedInOperatingActivities" ||
        t == "PaymentsToAcquirePropertyPlantAndEquipment")
      .foldLeft(wide)((df, t) => df.withColumn(t, lit(null).cast("double")))
    val out = Statements.derive(padded)
      .select("cik", "capex", "free_cash_flow").orderBy("cik")
    assert(rows(out) === Seq(
      Seq("c1", 30.0, 70.0), Seq("c2", null, null), Seq("c3", 10.0, null)))
  }

  test("derive: v3 vs v2 revenue-candidate priority order differs") {
    val base = Seq(("c1", 2020, 1.0, 2.0)).toDF(
      "cik", "fiscal_year", "Revenues",
      "RevenueFromContractWithCustomerExcludingAssessedTax")
    val padded = SecTags.coreTags
      .filterNot(t => t == "Revenues" ||
        t == "RevenueFromContractWithCustomerExcludingAssessedTax")
      .foldLeft(base)((df, t) => df.withColumn(t, lit(null).cast("double")))
    val v3 = Statements.derive(padded).select("revenues")
    val v2 = Statements.derive(padded, SecTags.revenueCandidatesV2).select("revenues")
    assert(singleCol[Double](v3) === Seq(2.0)) // contract-revenue tag first in v3
    assert(singleCol[Double](v2) === Seq(1.0)) // plain Revenues first in v2
  }
}
