package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sec.SecTags

/** Annual-statement builders: the reference's core transform
  * (/root/reference/scripts/build_statements_annual_v3.py — canonical per
  * README.md:88 — plus the v1/v2 filings-join variant).
  *
  * Spark-first shape: filter → window latest-wins → unionByName → pivot →
  * derive, one lazy plan. The shuffles are exactly the window partitionBy and
  * the pivot groupBy, both on (cik, fiscal_year[, tag]) — at 100 TB the fact
  * table partitions by cik so both shuffles co-locate; AQE handles skewed
  * mega-filers.
  */
object Statements {

  /** A1: windowed latest-wins dedup — one best row per key.
    * Generalization of `ROW_NUMBER() OVER (PARTITION BY cik, fiscal_year, tag
    * ORDER BY filed DESC NULLS LAST) ... rn = 1` (_v3.py:60-70).
    * `order` must be a TOTAL order (SURVEY §7.4: ties on `filed` are broken
    * arbitrarily by engines; callers append unique tie-breakers).
    */
  def latestWins(keys: Seq[String], order: Seq[Column])(df: DataFrame): DataFrame =
    df.withColumn("__rn",
        row_number().over(Window.partitionBy(keys.map(col): _*).orderBy(order: _*)))
      .filter(col("__rn") === 1)
      .drop("__rn")

  /** Deterministic v3 dedup order: filed DESC NULLS LAST (+ value, fact_id
    * tie-breakers so Spark and the DuckDB oracle agree on ties). */
  val dedupOrder: Seq[Column] =
    Seq(col("filed").desc_nulls_last, col("value").desc_nulls_last, col("fact_id").asc)

  /** F6: flow-metric filter — duration facts with ~1-year periods
    * (_v3.py:52-58; README.md:141). All predicates are plain column
    * comparisons so Catalyst pushes them into the parquet scan. */
  def flowFacts(facts: DataFrame): DataFrame =
    facts
      .filter(
        col("taxonomy") === "us-gaap" && col("unit") === "USD" &&
        col("tag").isin(SecTags.flowTags: _*) &&
        col("form").isin("10-K", "20-F") &&
        col("period_start").isNotNull && col("period_end").isNotNull &&
        datediff(col("period_end"), col("period_start")).between(330, 380))
      .select(col("cik"), year(col("period_end")).cast("int").as("fiscal_year"),
        col("tag"), col("value"), col("filed"), col("fact_id"))

  /** F7: stock-metric filter — point-in-time balance-sheet facts
    * (_v3.py:88-93; README.md:142). */
  def stockFacts(facts: DataFrame): DataFrame =
    facts
      .filter(
        col("taxonomy") === "us-gaap" && col("unit") === "USD" &&
        col("tag").isin(SecTags.stockTags: _*) &&
        col("form").isin("10-K", "20-F") &&
        col("period_end").isNotNull && col("period_start").isNull)
      .select(col("cik"), year(col("period_end")).cast("int").as("fiscal_year"),
        col("tag"), col("value"), col("filed"), col("fact_id"))

  /** Flow ∪ stock → one best value per (cik, fiscal_year, tag).
    * (_v3.py:111-113's `flow_rows + stock_rows` merge + the two dedups.) */
  def dedupedFacts(facts: DataFrame): DataFrame =
    latestWins(Seq("cik", "fiscal_year", "tag"), dedupOrder)(
      flowFacts(facts).unionByName(stockFacts(facts)))
      .select("cik", "fiscal_year", "tag", "value")

  /** A3: narrow→wide pivot. `max` (not `first`) keeps the cell deterministic
    * even if an upstream guarantee slips; dedupedFacts guarantees ≤1 row per
    * cell so max == the one value. Explicit tag list → single-pass aggregate,
    * no values-discovery job. */
  def pivotWide(deduped: DataFrame): DataFrame =
    deduped.groupBy("cik", "fiscal_year")
      .pivot("tag", SecTags.coreTags)
      .agg(max("value"))

  /** A4/A5/A6: revenue-candidate coalesce (_v3.py:118-123 — v2 uses a
    * different priority order, _v2.py:5-10, so the order is a parameter),
    * capex sign fix (_v3.py:136-139), fcf = ocf − capex with null propagation
    * matching the both-non-null guard (_v3.py:141-143). */
  def derive(wide: DataFrame,
      revenueCandidates: Seq[String] = SecTags.revenueCandidates): DataFrame = {
    val capexRaw = col("PaymentsToAcquirePropertyPlantAndEquipment")
    val ocf = col("NetCashProvidedByUsedInOperatingActivities")
    wide.select(
      Seq(col("cik"), col("fiscal_year"),
        coalesce(revenueCandidates.map(col): _*).as("revenues")) ++
      SecTags.tagToColumn.map { case (tag, name) => col(tag).as(name) } ++
      Seq(abs(capexRaw).as("capex"),
        (ocf - abs(capexRaw)).as("free_cash_flow")): _*)
  }

  /** The canonical statements_annual build (v3). */
  def buildV3(facts: DataFrame): DataFrame =
    derive(pivotWide(dedupedFacts(facts)))

  /** The v2 build (build_statements_annual_v2.py): filings-join + fp='FY'
    * annual facts (v1/v2 path) pivoted wide, with the v2 revenue-candidate
    * priority order (`Revenues` first — _v2.py:5-10,75-79). */
  def buildV2(facts: DataFrame, filings: DataFrame): DataFrame =
    derive(pivotWide(annualFactsV1(facts, filings)), SecTags.revenueCandidatesV2)

  /** v1/v2 path: facts ⋈ filings on accession (J1), fiscal metadata from the
    * filing, fp='FY' only (F5), form-priority-then-filed ranking (A2;
    * build_statements_annual.py:36-51). Kept as a distinct operator. filings
    * is fact-scale (one row per filing, grows with the data) — NOT broadcast;
    * the fiscal_period filter shrinks it first and AQE picks the strategy. */
  def annualFactsV1(facts: DataFrame, filings: DataFrame): DataFrame = {
    val joined = facts
      .filter(col("taxonomy") === "us-gaap" && col("unit") === "USD" &&
        col("tag").isin(SecTags.coreTags: _*))
      .join(filings
          .filter(col("fiscal_year").isNotNull && col("fiscal_period") === "FY")
          .select(col("accession_no"),
            col("fiscal_year").as("f_fiscal_year"), col("fiscal_period")),
        col("filing_accession_no") === col("accession_no"), "inner")
    val formPriority = when(col("form") === "10-K", 0).otherwise(1)
    latestWins(Seq("cik", "f_fiscal_year", "tag"),
      Seq(formPriority.asc, col("filed").desc_nulls_last,
          col("value").desc_nulls_last, col("fact_id").asc))(joined)
      .select(col("cik"), col("f_fiscal_year").as("fiscal_year"), col("tag"), col("value"))
  }
}
