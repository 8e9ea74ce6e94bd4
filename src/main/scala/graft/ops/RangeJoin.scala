package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Q
import graft.sec.{SecDerive, SecSql, SecTags}

/** Range (interval-containment) join: point-side rows matched to every
  * interval-side row whose [start, end] contains the point, per key.
  *
  * The naive spelling — equi-join on the key plus a BETWEEN residual — makes
  * every key-group a cross product before filtering; with 100 TB and hot
  * keys that's the straggler pattern. The scale formulation decomposes
  * intervals into coarse time buckets (months here): intervals explode into
  * the ≤13 buckets they overlap, points map to exactly one bucket, and the
  * join runs on (key, bucket) — bounded fan-out, uniform shuffle — with the
  * exact BETWEEN check as a cheap residual. Bucket width trades explode
  * factor against residual selectivity; month ≈ right for year-long
  * reporting periods.
  */
object RangeJoin {

  private def monthsBetween(start: Column, end: Column): Column =
    sequence(lit(0),
      ((year(end) - year(start)) * 12 + (month(end) - month(start))).cast("int"))

  /** Intervals (key, start, end, payload) ⋈ points (key, t): one output row
    * per (interval, contained point). */
  def containmentJoin(intervals: DataFrame, points: DataFrame,
      keys: Seq[String], start: String, end: String, t: String): DataFrame = {
    val iv = intervals
      .withColumn("__m", explode(monthsBetween(col(start), col(end))))
      .withColumn("__bucket", add_months(trunc(col(start), "month"), col("__m")))
      .drop("__m")
    val pt = points.withColumn("__bucket", trunc(col(t), "month"))
    iv.join(pt, keys :+ "__bucket")
      .filter(col(t).between(col(start), col(end)))
      .drop("__bucket")
  }

  val queries: Seq[Q] = Seq(
    // Filings made DURING a flow fact's reporting period, same cik — the
    // interval side is year-long periods, the point side filing dates.
    Q("q42_range_join",
      (s, dir) => {
        val iv = Statements.latestWins(Seq("cik", "fiscal_year", "tag"),
          Statements.dedupOrder)(
            SecDerive.facts(s, dir).filter(
              col("taxonomy") === "us-gaap" && col("unit") === "USD" &&
                col("tag").isin(SecTags.flowTags: _*) &&
                col("period_start").isNotNull && col("period_end").isNotNull &&
                datediff(col("period_end"), col("period_start")).between(330, 380))
              .withColumn("fiscal_year", year(col("period_end")).cast("int")))
          .select(col("cik"), col("fact_id"), col("period_start"), col("period_end"))
        val pts = SecDerive.filings(s, dir)
          .select(col("cik"), col("accession_no"), col("filing_date"))
        containmentJoin(iv, pts, Seq("cik"), "period_start", "period_end",
          "filing_date")
          .select("fact_id", "cik", "accession_no", "filing_date",
            "period_start", "period_end")
          .orderBy("fact_id", "accession_no")
      },
      Some(s"""${SecSql.basePrelude},
iv AS (SELECT cik, fact_id, period_start, period_end FROM (
         SELECT *, year(period_end) AS fiscal_year,
           row_number() OVER (PARTITION BY cik, year(period_end), tag
             ORDER BY filed DESC NULLS LAST, value DESC NULLS LAST, fact_id ASC) AS rn
         FROM facts
         WHERE taxonomy = 'us-gaap' AND unit = 'USD'
           AND tag IN (${SecTags.flowTags.map(t => s"'$t'").mkString(", ")})
           AND period_start IS NOT NULL AND period_end IS NOT NULL
           AND date_diff('day', period_start, period_end) BETWEEN 330 AND 380)
       WHERE rn = 1)
SELECT iv.fact_id, iv.cik, fl.accession_no, fl.filing_date,
       iv.period_start, iv.period_end
FROM iv JOIN filings fl
  ON fl.cik = iv.cik
 AND fl.filing_date BETWEEN iv.period_start AND iv.period_end
ORDER BY iv.fact_id, fl.accession_no""")))
}
