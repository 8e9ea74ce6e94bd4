package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.sec.{SecDerive, SecSql}

/** As-of join: for each left row, the most recent right row with
  * rightTime <= leftTime within the same key — the point-in-time lookup
  * (latest filing in effect when a fact was filed).
  *
  * Spark has no native as-of join; the preference order (compose > custom
  * plan) lands on composition: tag both inputs, UNION them, and take a
  * running `last_value(..., ignoreNulls)` over one (key)-partitioned,
  * time-ordered window. ONE shuffle + ONE sort total — vs the naive
  * range-join (key-equal AND t<=T then max-per-left), which is quadratic in
  * rows-per-key and a straggler factory at 100 TB. Right rows sort before
  * left rows at equal timestamps, giving <= (inclusive) semantics.
  *
  * Caller must ensure ≤1 right row per (key, rightTime) — dedup first — or
  * ties make "the" as-of row ill-defined (same contract as DuckDB's ASOF
  * JOIN, which this is oracle-checked against).
  */
object AsofJoin {

  /** Generic as-of: returns `left` columns + `carried` columns from the
    * latest right row at or before `leftTime`. */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, carried: Seq[String],
      tieBreak: Seq[Column] = Nil): DataFrame = {
    val leftCols = left.columns.toSeq
    // Right rows get __side=0 so they sort BEFORE left rows at equal times
    // (inclusive <=); carried columns are null on left rows and filled by
    // the running last_value.
    val taggedRight = right.select(
      (keys.map(col) :+ col(rightTime).as("__t") :+ lit(0).as("__side")) ++
        carried.map(c => col(c).as(s"__r_$c")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).as(c)): _*)
    val taggedLeft = left.select(
      (keys.map(col) :+ col(leftTime).as("__t") :+ lit(1).as("__side")) ++
        carried.map(c => lit(null).as(s"__r_$c")) ++
        leftCols.filterNot(keys.contains).map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc_nulls_first +: col("__side").asc +: tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .select(col("*") +: carried.map(c =>
        last(col(s"__r_$c"), ignoreNulls = true).over(w).as(s"asof_$c")): _*)
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ carried.map(c => col(s"asof_$c")): _*)
  }

  val queries: Seq[Q] = Seq(
    // Point-in-time provenance: for every fact, the latest filing of the
    // same cik on or before the fact's filed date. Filings deduped to one
    // per (cik, filing_date) first so the as-of row is well-defined; oracle
    // is DuckDB's NATIVE ASOF LEFT JOIN.
    Q("q41_asof_join",
      (s, dir) => {
        val facts = SecDerive.facts(s, dir)
          .select("fact_id", "cik", "filed")
        val filings = Statements.latestWins(Seq("cik", "filing_date"),
          Seq(col("accession_no").asc))(SecDerive.filings(s, dir))
          .select("cik", "filing_date", "accession_no")
        asof(facts, filings, Seq("cik"), "filed", "filing_date",
          Seq("accession_no", "filing_date"),
          tieBreak = Seq(col("fact_id").asc_nulls_first))
          .orderBy("fact_id")
      },
      Some(s"""${SecSql.basePrelude},
f1 AS (SELECT cik, filing_date, accession_no FROM (
         SELECT *, row_number() OVER (PARTITION BY cik, filing_date
                                      ORDER BY accession_no ASC) AS rn
         FROM filings) WHERE rn = 1)
SELECT f.fact_id, f.cik, f.filed,
       f1.accession_no AS asof_accession_no,
       f1.filing_date AS asof_filing_date
FROM (SELECT fact_id, cik, filed FROM facts) f
ASOF LEFT JOIN f1 ON f.cik = f1.cik AND f1.filing_date <= f.filed
ORDER BY f.fact_id""")),

    // The SAME point-in-time lookup through the dedicated physical operator
    // (graft.plans.AsofMergeJoinExec — custom LogicalPlan + Strategy +
    // SparkPlan, tier (c) of the extension ladder): per-side cluster+sort,
    // one streaming merge walk per co-partition, O(1) state. Oracle: the
    // identical DuckDB ASOF LEFT JOIN — one ground truth for both the
    // composition (q41) and the physical operator.
    Q("q67_asof_exec",
      (s, dir) => {
        val facts = SecDerive.facts(s, dir)
          .select("fact_id", "cik", "filed")
        val filings = Statements.latestWins(Seq("cik", "filing_date"),
          Seq(col("accession_no").asc))(SecDerive.filings(s, dir))
          .select(col("cik").as("f_cik"), col("filing_date"), col("accession_no"))
        graft.plans.AsofMerge.join(facts, filings,
          Seq("cik"), Seq("f_cik"), "filed", "filing_date")
          .select(col("fact_id"), col("cik"), col("filed"),
            col("accession_no").as("asof_accession_no"),
            col("filing_date").as("asof_filing_date"))
          .orderBy("fact_id")
      },
      Some(s"""${SecSql.basePrelude},
f1 AS (SELECT cik, filing_date, accession_no FROM (
         SELECT *, row_number() OVER (PARTITION BY cik, filing_date
                                      ORDER BY accession_no ASC) AS rn
         FROM filings) WHERE rn = 1)
SELECT f.fact_id, f.cik, f.filed,
       f1.accession_no AS asof_accession_no,
       f1.filing_date AS asof_filing_date
FROM (SELECT fact_id, cik, filed FROM facts) f
ASOF LEFT JOIN f1 ON f.cik = f1.cik AND f1.filing_date <= f.filed
ORDER BY f.fact_id""")),

    // Point-in-time feature join (the feature-store read pattern): each
    // filing is scored with the latest ratios available AT OR BEFORE its
    // fiscal year — never a later year's numbers (leakage). Through the
    // custom exec again, on an INTEGER time axis this time (the merge
    // compares (key, time) with natural ordering, so the operator is
    // type-generic across date/timestamp/int keys). ratios has one row per
    // (cik, fiscal_year) by construction — the ≤1-per-(key,time) contract.
    Q("q75_asof_features",
      (s, dir) => {
        val fl = SecDerive.filings(s, dir)
          .select("accession_no", "cik", "fiscal_year")
        val rt = SecDerive.ratiosV3(s, dir)
          .select(col("cik").as("r_cik"),
            col("fiscal_year").as("feature_year"),
            col("roe"), col("net_margin"))
        graft.plans.AsofMerge.join(fl, rt,
          Seq("cik"), Seq("r_cik"), "fiscal_year", "feature_year")
          .select(col("accession_no"), col("cik"), col("fiscal_year"),
            col("feature_year"), col("roe"), col("net_margin"))
          .orderBy("accession_no")
      },
      Some(s"""${SecSql.fullPrelude}
SELECT f.accession_no, f.cik, f.fiscal_year,
       r.fiscal_year AS feature_year, r.roe, r.net_margin
FROM (SELECT accession_no, cik, fiscal_year FROM filings) f
ASOF LEFT JOIN ratios r ON f.cik = r.cik AND r.fiscal_year <= f.fiscal_year
ORDER BY f.accession_no""")))
}
