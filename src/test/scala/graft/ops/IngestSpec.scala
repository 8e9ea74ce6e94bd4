package graft.ops

import java.sql.Date

import graft.SparkSpec

/** Ingest: the nest->flatten round trip is lossless on the filtered slice;
  * the seed path normalizes and filters. */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  test("flatten(nest(facts)) == facts (filtered slice), row for row") {
    val facts = Seq(
      (1L, "c1", "us-gaap", "Revenues", "USD", Date.valueOf("2020-01-01"),
        Date.valueOf("2020-12-31"), 10.0, "A-1", "10-K", Date.valueOf("2021-02-01"), "CY2020"),
      (2L, "c1", "us-gaap", "Assets", "USD", null.asInstanceOf[Date],
        Date.valueOf("2020-12-31"), 20.0, "A-1", "10-K", Date.valueOf("2021-02-01"), "CY2020"),
      (3L, "c1", "dei", "Revenues", "USD", null.asInstanceOf[Date],
        Date.valueOf("2020-12-31"), 30.0, "A-1", "10-K", Date.valueOf("2021-02-01"), "CY2020"), // non us-gaap -> dropped
      (4L, "c2", "us-gaap", "Revenues", "EUR", null.asInstanceOf[Date],
        Date.valueOf("2020-12-31"), 40.0, "A-2", "10-K", Date.valueOf("2021-02-01"), "CY2020")  // non USD -> dropped
    ).toDF("fact_id", "cik", "taxonomy", "tag", "unit", "period_start",
      "period_end", "value", "filing_accession_no", "form", "filed", "frame")
    val out = Ingest.flattenCompanyFacts(Ingest.nestCompanyFacts(facts))
      .orderBy("fact_id")
    assert(singleCol[Long](out.select("fact_id")) === Seq(1L, 2L))
    val r = out.collect().head
    assert(r.getAs[String]("tag") === "Revenues")
    assert(r.getAs[Double]("value") === 10.0)
    assert(r.getAs[String]("frame") === "CY2020")
  }

  test("seedCompanies: env list is split/trimmed/uppercased; others dropped") {
    val companies = Seq(
      ("0000000001", "AAA", "Alpha"), ("0000000002", "BBB", "Beta"),
      ("0000000003", "CCC", "Gamma")
    ).toDF("cik", "ticker", "name")
    val out = Ingest.seedCompanies(companies, " aaa, ccc ,, ")
      .orderBy("ticker")
    assert(singleCol[String](out.select("ticker")) === Seq("AAA", "CCC"))
    assert(singleCol[String](out.select("cik")).forall(_.length == 10))
  }
}
