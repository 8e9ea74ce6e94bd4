package graft.sec

/** Concept-tag vocabulary of the reference warehouse.
  *
  * Tag sets from /root/reference/scripts/ingest_facts.py:11-31 (CORE_TAGS) and
  * /root/reference/scripts/build_statements_annual_v3.py:5-29 (REVENUE_CANDIDATES,
  * FLOW_TAGS, STOCK_TAGS). v3 is the canonical builder (README.md:88).
  */
object SecTags {
  /** Priority order for the revenue coalesce (v3; _v3.py:5-10). */
  val revenueCandidates: Seq[String] = Seq(
    "RevenueFromContractWithCustomerExcludingAssessedTax",
    "SalesRevenueNet",
    "Revenues",
    "TotalRevenues")

  /** v2 uses a different priority order (_v2.py:5-10) — kept as a variant. */
  val revenueCandidatesV2: Seq[String] = Seq(
    "Revenues",
    "SalesRevenueNet",
    "RevenueFromContractWithCustomerExcludingAssessedTax",
    "TotalRevenues")

  /** Duration-style (flow) metrics: income statement + cash flow (_v3.py:12-23). */
  val flowTags: Seq[String] = revenueCandidates ++ Seq(
    "GrossProfit",
    "OperatingIncomeLoss",
    "NetIncomeLoss",
    "NetCashProvidedByUsedInOperatingActivities",
    "PaymentsToAcquirePropertyPlantAndEquipment")

  /** Point-in-time (stock) metrics: balance sheet (_v3.py:25-29). */
  val stockTags: Seq[String] = Seq("Assets", "Liabilities", "StockholdersEquity")

  /** Full ingested concept set (ingest_facts.py:11-31). */
  val coreTags: Seq[String] = flowTags ++ stockTags

  /** tag → statement column name (schema.sql:43-63 measure columns). */
  val tagToColumn: Seq[(String, String)] = Seq(
    "GrossProfit" -> "gross_profit",
    "OperatingIncomeLoss" -> "operating_income",
    "NetIncomeLoss" -> "net_income",
    "Assets" -> "total_assets",
    "Liabilities" -> "total_liabilities",
    "StockholdersEquity" -> "total_equity",
    "NetCashProvidedByUsedInOperatingActivities" -> "operating_cash_flow")
}

/** Case classes for the warehouse tables (db/schema.sql:4-80), used where a
  * typed Dataset improves safety at API edges (SURVEY §7.1: DataFrames in the
  * core, Dataset[T] at the edges). Values are Option[Double]/Option[Int]
  * wherever the schema allows NULL — a non-nullable field over a nullable
  * column fails at encode time. Double (not decimal) is faithful to the
  * reference's actual ingested precision (float(val), ingest_facts.py:80).
  */
object SecModel {
  case class Company(cik: String, ticker: String, name: String)

  case class Filing(
      accession_no: String, cik: String, form: String,
      filing_date: java.sql.Date, report_date: java.sql.Date,
      fiscal_year: Option[Int], fiscal_period: String)

  case class Fact(
      fact_id: Long, cik: String, taxonomy: String, tag: String, unit: String,
      period_start: Option[java.sql.Date], period_end: Option[java.sql.Date],
      value: Option[Double], filing_accession_no: String, form: String,
      filed: java.sql.Date, frame: String)

  /** One screener hit (GET /screener response row, api.py:105-118). */
  case class ScreenerHit(
      ticker: String, name: String, cik: String, fiscal_year: Int,
      roe: Option[Double], fcf_margin: Option[Double],
      net_margin: Option[Double])

  case class StatementAnnual(
      cik: String, fiscal_year: Int,
      revenues: Option[Double], gross_profit: Option[Double],
      operating_income: Option[Double], net_income: Option[Double],
      total_assets: Option[Double], total_liabilities: Option[Double],
      total_equity: Option[Double], operating_cash_flow: Option[Double],
      capex: Option[Double], free_cash_flow: Option[Double])

  case class RatioAnnual(
      cik: String, fiscal_year: Int,
      gross_margin: Option[Double], operating_margin: Option[Double],
      net_margin: Option[Double], roa: Option[Double], roe: Option[Double],
      leverage: Option[Double], fcf_margin: Option[Double],
      asset_turnover: Option[Double])
}
