package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sec.{SecDerive, SecSql}
import graft.ops.{AsofJoin, Events, IncrementalAgg, Ingest, Multimodal, Quality, RangeJoin, Ratios, Scd, Screener, Sinks, Skew, Statements, Trends}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry pairs a Spark DataFrame program with ANSI SQL the driver runs in
  * DuckDB over the same parquet tables. Determinism rules (SURVEY §7.4):
  * total-order tie-breakers in every window/sort, aliases identical on both
  * sides, float SUMs routed through DECIMAL(38,6) so addition is exact and
  * order-insensitive, and `/` only ever double/double (IEEE-identical in both
  * engines).
  */
object SparkEntry {

  // ---------------------------------------------------------------------------
  // SEC warehouse pipeline (SURVEY §2) over facts/filings/companies derived
  // deterministically from the TPC-H tables (mirrored CTEs in SecSql).
  // ---------------------------------------------------------------------------

  // q09 measures the honest BUILD (direct, un-memoized); consumers read the
  // stored mart (SecDerive.ratiosV3) like the reference's scripts read
  // statements_annual/ratios_annual from Postgres.
  private def statementsV3(s: SparkSession, dir: String): DataFrame =
    Statements.buildV3(SecDerive.facts(s, dir))

  private def ratiosV3(s: SparkSession, dir: String): DataFrame =
    SecDerive.ratiosV3(s, dir)

  private val secQueries: Seq[Q] = Seq(
    Q("sec_facts",
      (s, dir) => SecDerive.facts(s, dir).orderBy("fact_id"),
      Some(s"""${SecSql.basePrelude}
        SELECT * FROM facts ORDER BY fact_id""")),

    Q("sec_filings",
      (s, dir) => SecDerive.filings(s, dir).orderBy("accession_no"),
      Some(s"""${SecSql.basePrelude}
        SELECT * FROM filings ORDER BY accession_no""")),

    Q("sec_companies",
      (s, dir) => SecDerive.companies(s, dir).orderBy("cik"),
      Some(s"""${SecSql.basePrelude}
        SELECT * FROM companies ORDER BY cik""")),

    // F1/F2/F3: CORE_TAGS ∩ USD ∩ value-not-null ingest filter
    // (ingest_facts.py:47-54).
    Q("q02_core_tag_filter",
      (s, dir) => SecDerive.facts(s, dir)
        .filter(col("taxonomy") === "us-gaap" &&
          col("tag").isin(graft.sec.SecTags.coreTags: _*) &&
          col("unit") === "USD" && col("value").isNotNull)
        .select("fact_id", "cik", "taxonomy", "tag", "unit", "period_end", "value")
        .orderBy("fact_id"),
      Some(s"""${SecSql.basePrelude}
        SELECT fact_id, cik, taxonomy, tag, unit, period_end, value
        FROM facts
        WHERE taxonomy = 'us-gaap'
          AND tag IN (${graft.sec.SecTags.coreTags.map(t => s"'$t'").mkString(", ")})
          AND unit = 'USD' AND value IS NOT NULL
        ORDER BY fact_id""")),

    // F4/X1: equality point-lookup after upper() (api.py:6-19).
    Q("q03_company_lookup",
      (s, dir) => Screener.companyLookup(SecDerive.companies(s, dir), "tkr7"),
      Some(s"""${SecSql.basePrelude}
        SELECT cik, ticker, name FROM companies WHERE ticker = upper('tkr7')""")),

    // J1: facts ⋈ filings equi-join on accession (build_statements_annual.py:43-44).
    // filings is fact-scale (one row per order) — no broadcast hint; AQE picks
    // the strategy, and at 100 TB this is a co-partitionable shuffle join.
    Q("q04_join_facts_filings",
      (s, dir) => {
        val f = SecDerive.facts(s, dir)
        val fl = SecDerive.filings(s, dir)
        f.join(fl, f("filing_accession_no") === fl("accession_no"), "inner")
          .select(f("fact_id"), f("cik"), f("tag"), f("value"),
            fl("fiscal_year").as("filing_fiscal_year"),
            fl("fiscal_period"), fl("form").as("filing_form"))
          .orderBy("fact_id")
      },
      Some(s"""${SecSql.basePrelude}
        SELECT f.fact_id, f.cik, f.tag, f.value,
               fl.fiscal_year AS filing_fiscal_year,
               fl.fiscal_period, fl.form AS filing_form
        FROM facts f JOIN filings fl ON fl.accession_no = f.filing_accession_no
        ORDER BY f.fact_id""")),

    // v1/v2 path: join + fp='FY' + form-priority ranking (A2;
    // build_statements_annual.py:36-51).
    Q("q05_annual_facts_v1",
      (s, dir) => Statements.annualFactsV1(SecDerive.facts(s, dir), SecDerive.filings(s, dir))
        .orderBy("cik", "fiscal_year", "tag"),
      Some(s"""${SecSql.basePrelude}, ${SecSql.annualV1Cte}
        SELECT cik, fiscal_year, tag, value FROM annual_v1
        ORDER BY cik, fiscal_year, tag""")),

    // J3 generalization: semi-join (EXISTS).
    Q("q06_semi_join",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey""")),

    // FK orphan detection as anti-join (SURVEY §1.3: facts→filings provenance).
    Q("q07_anti_join_orphans",
      (s, dir) => {
        val f = SecDerive.facts(s, dir)
        val fl = SecDerive.filings(s, dir)
        f.join(fl, f("filing_accession_no") === fl("accession_no"), "left_anti")
          .select("fact_id", "cik", "filing_accession_no")
          .orderBy("fact_id")
      },
      Some(s"""${SecSql.basePrelude}
        SELECT fact_id, cik, filing_accession_no FROM facts f
        WHERE NOT EXISTS (SELECT 1 FROM filings fl
                          WHERE fl.accession_no = f.filing_accession_no)
        ORDER BY fact_id""")),

    // A1: windowed latest-wins dedup, flow ∪ stock (v3; _v3.py:60-70,95-105).
    Q("q08_window_dedup",
      (s, dir) => Statements.dedupedFacts(SecDerive.facts(s, dir))
        .orderBy("cik", "fiscal_year", "tag"),
      Some(s"""${SecSql.fullPrelude}
        SELECT cik, fiscal_year, tag, value FROM deduped
        ORDER BY cik, fiscal_year, tag""")),

    // A3-A6: the canonical statements_annual build (v3).
    Q("q09_statements_v3",
      (s, dir) => statementsV3(s, dir).orderBy("cik", "fiscal_year"),
      Some(s"""${SecSql.fullPrelude}
        SELECT * FROM statements ORDER BY cik, fiscal_year""")),

    // A7/A8: null/zero-safe ratio block.
    Q("q10_ratios",
      (s, dir) => ratiosV3(s, dir).orderBy("cik", "fiscal_year"),
      Some(s"""${SecSql.fullPrelude}
        SELECT * FROM ratios ORDER BY cik, fiscal_year""")),

    // F8/J2/O2: the flagship screener — dynamic filters + broadcast join +
    // multi-key sort + top-k (api.py:63-119).
    Q("q11_screener",
      (s, dir) => Screener.screener(ratiosV3(s, dir), SecDerive.companies(s, dir),
        Screener.ScreenerParams(minRoe = Some(0.5), minNetMargin = Some(0.2), limit = 25)),
      Some(s"""${SecSql.fullPrelude}
        SELECT c.ticker, c.name, r.cik, r.fiscal_year, r.roe, r.fcf_margin, r.net_margin
        FROM ratios r JOIN companies c ON c.cik = r.cik
        WHERE r.roe >= 0.5 AND r.net_margin >= 0.2
        ORDER BY r.fiscal_year DESC, r.roe DESC NULLS LAST, r.cik ASC
        LIMIT 25""")),

    // F8 with the fiscal_year equality predicate exercised (api.py:71-74 —
    // the one screener parameter q11 leaves None).
    Q("q11b_screener_year",
      (s, dir) => Screener.screener(ratiosV3(s, dir), SecDerive.companies(s, dir),
        Screener.ScreenerParams(fiscalYear = Some(1995), minNetMargin = Some(0.1),
          limit = 50)),
      Some(s"""${SecSql.fullPrelude}
        SELECT c.ticker, c.name, r.cik, r.fiscal_year, r.roe, r.fcf_margin, r.net_margin
        FROM ratios r JOIN companies c ON c.cik = r.cik
        WHERE r.fiscal_year = 1995 AND r.net_margin >= 0.1
        ORDER BY r.fiscal_year DESC, r.roe DESC NULLS LAST, r.cik ASC
        LIMIT 50""")),

    // F8 with EVERY screener parameter bound at once (api.py:63-99): the
    // year equality + all three ratio floors fold into one conjunctive
    // predicate ahead of the dim join — the only multi-param combination
    // q11/q11b leave unchecked end-to-end. This tier also runs the
    // STATS-PLANNED dim join (Screener.screenerPlanned): the join strategy
    // comes from the companies dim's persisted ANALYZE mart, not a
    // hand-placed broadcast hint — the CBO loop closed on a registered
    // query, against the same oracle as the hinted tier.
    Q("q92_screener_full_params",
      (s, dir) => Screener.screenerPlanned(ratiosV3(s, dir),
        SecDerive.companies(s, dir), SecDerive.companiesStats(s, dir),
        Screener.ScreenerParams(fiscalYear = Some(1995), minRoe = Some(0.05),
          minFcfMargin = Some(0.01), minNetMargin = Some(0.05), limit = 50)),
      Some(s"""${SecSql.fullPrelude}
        SELECT c.ticker, c.name, r.cik, r.fiscal_year, r.roe, r.fcf_margin, r.net_margin
        FROM ratios r JOIN companies c ON c.cik = r.cik
        WHERE r.fiscal_year = 1995 AND r.roe >= 0.05
          AND r.fcf_margin >= 0.01 AND r.net_margin >= 0.05
        ORDER BY r.fiscal_year DESC, r.roe DESC NULLS LAST, r.cik ASC
        LIMIT 50""")),

    // O1: /ratios/{ticker} — lookup + order + limit (api.py:21-61). The cik
    // predicate is pushed BEFORE the window/pivot (point query, not a
    // full-table pipeline).
    Q("q12_ratios_for_ticker",
      (s, dir) => Screener.ratiosForTicker(SecDerive.facts(s, dir),
        SecDerive.companies(s, dir), "TKR5", limit = 10),
      Some(s"""${SecSql.fullPrelude}
        SELECT r.* FROM ratios r
        WHERE r.cik IN (SELECT cik FROM companies WHERE ticker = 'TKR5')
        ORDER BY r.fiscal_year DESC LIMIT 10""")),

    // The v2 statements build: v1/v2 join path + v2 revenue-candidate order
    // (`Revenues` first — _v2.py:5-10; SURVEY §7.4 item 6).
    Q("q17_statements_v2",
      (s, dir) => Statements.buildV2(SecDerive.facts(s, dir), SecDerive.filings(s, dir))
        .orderBy("cik", "fiscal_year"),
      Some(s"""${SecSql.basePrelude}, ${SecSql.annualV1Cte}, ${SecSql.statementsV2Cte}
        SELECT * FROM statements_v2 ORDER BY cik, fiscal_year""")),

    // S6/O3 exact shape: dimension scan ordered by ticker
    // (ingest_facts.py:100).
    Q("q18_companies_by_ticker",
      (s, dir) => SecDerive.companies(s, dir).select("cik", "ticker")
        .orderBy("ticker"),
      Some(s"""${SecSql.basePrelude}
        SELECT cik, ticker FROM companies ORDER BY ticker""")))

  // ---------------------------------------------------------------------------
  // Generic relational operators over the TPC-H tables.
  // ---------------------------------------------------------------------------

  private val dec = DecimalType(38, 6)

  private val relationalQueries: Seq[Q] = Seq(
    // S5/F9/F10: filtered scan + projection with pushed predicates.
    Q("q01_scan_filter_project",
      (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_discount") > 0.06 && col("l_quantity") < 10.0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
          to_date(col("l_shipdate")).as("ship_date"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice,
               CAST(l_shipdate AS DATE) AS ship_date
        FROM lineitem WHERE l_discount > 0.06 AND l_quantity < 10.0
        ORDER BY l_orderkey, l_linenumber""")),

    // O1: top-k (TakeOrderedAndProject, no global sort).
    Q("q13_topk_orders",
      (s, dir) => Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""")),

    // Scalar-function sampler: X1-X13 (upper, lpad, year, datediff, between,
    // casts, abs, when, coalesce).
    Q("q14_scalar_functions",
      (s, dir) => Tables.orders(s, dir)
        .select(
          col("o_orderkey"),
          upper(col("o_orderstatus")).as("status_upper"),
          lpad(col("o_custkey").cast("string"), 10, "0").as("cust_padded"),
          year(to_date(col("o_orderdate"))).cast("int").as("order_year"),
          datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
            .cast("int").as("days_since_95"),
          col("o_totalprice").between(1000.0, 2000.0).as("mid_price"),
          abs(col("o_totalprice") - 150000.0).as("price_dist"),
          when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0).as("is_urgent"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_coalesced"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
          upper(o_orderstatus) AS status_upper,
          lpad(CAST(o_custkey AS VARCHAR), 10, '0') AS cust_padded,
          CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS order_year,
          CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_95,
          o_totalprice BETWEEN 1000.0 AND 2000.0 AS mid_price,
          abs(o_totalprice - 150000.0) AS price_dist,
          CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_urgent,
          coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_coalesced
        FROM orders ORDER BY o_orderkey""")),

    // Top-k per group: rank window + filter (the per-group analogue of O1).
    Q("q43_topk_per_group",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        Tables.orders(s, dir)
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("o_orderpriority"), col("rk").cast("long").as("rk"),
            col("o_orderkey"), col("o_totalprice"))
          .orderBy("o_orderpriority", "rk")
      },
      Some("""SELECT o_orderpriority, rk, o_orderkey, o_totalprice FROM (
          SELECT o_orderpriority, o_orderkey, o_totalprice,
            row_number() OVER (PARTITION BY o_orderpriority
              ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
          FROM orders) WHERE rk <= 3
        ORDER BY o_orderpriority, rk""")),

    // Hash aggregation with exact (decimal-routed) float sums — TPC-H Q1 shape.
    Q("q15_agg_pricing_summary",
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec))
            .cast("double").as("sum_disc_price"),
          (sum(col("l_quantity").cast(dec)).cast("double") /
            count(lit(1)).cast("double")).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
          CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
          CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
          CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_qty,
          CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")))

  // ---------------------------------------------------------------------------

  val allQueries: Seq[Q] =
    secQueries ++ relationalQueries ++ graft.llm.LlmQueries.all ++
      Events.queries ++ Ingest.queries ++ Sinks.queries ++
      Multimodal.queries ++ Skew.queries ++ AsofJoin.queries ++
      RangeJoin.queries ++ Quality.queries ++ Trends.queries ++
      IncrementalAgg.queries ++ Scd.queries ++ graft.llm.Curation.queries ++
      graft.llm.Selection.queries ++ graft.llm.LangModel.queries ++
      ops.Zorder.queries ++ graft.llm.UrlCuration.queries ++
      ops.Analyze.queries

  /** Flagship query on sf=0.001; driver smoke-checks rows>0: the full
    * ingest-shaped pipeline facts → statements → ratios → screener, surfaced
    * through the typed Dataset edge (SecModel.ScreenerHit). */
  def entry(spark: SparkSession): DataFrame =
    Screener.screenerTyped(
      Ratios.compute(Statements.buildV3(SecDerive.facts(spark, "/root/testdata/sf0.001"))),
      SecDerive.companies(spark, "/root/testdata/sf0.001"),
      Screener.ScreenerParams(limit = 25)).toDF()

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted entries get the weaker rows-only check. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
