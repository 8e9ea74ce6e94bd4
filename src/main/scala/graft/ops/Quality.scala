package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Q, Tables}
import graft.sec.{SecDerive, SecSql}

/** Data-quality profiling — the reference lists "add data quality checks" as
  * future work (README.md:166); at pipeline scale this is the nightly audit
  * pass. One aggregation over the table computes every column's null count
  * plus numeric/date ranges: a single shuffle to ONE row, partials do all
  * the work, so it costs one scan regardless of table size.
  */
object Quality {

  private val dec = DecimalType(38, 6)

  /** Per-column null counts + row count + selected min/max ranges. */
  def profileFacts(facts: DataFrame): DataFrame = {
    val nullCounts = facts.columns.toSeq.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
    val aggs: Seq[Column] = nullCounts ++ Seq(
      countDistinct(col("cik")).as("n_ciks"),
      min(col("period_end")).as("min_period_end"),
      max(col("period_end")).as("max_period_end"),
      sum(col("value").cast(dec)).cast("double").as("sum_value"))
    facts.agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Exact interpolated percentiles of a numeric column per group — the
    * correctness tier (full sort per group); approx_percentile is the
    * sketch path at scale, same shape. */
  def percentiles(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    df.groupBy(groupCol)
      .agg(
        percentile(col(valueCol), lit(0.5)).as("p50"),
        percentile(col(valueCol), lit(0.9)).as("p90"),
        percentile(col(valueCol), lit(0.99)).as("p99"),
        min(col(valueCol)).as("vmin"),
        max(col(valueCol)).as("vmax"))

  val queries: Seq[Q] = Seq(
    Q("q45_dq_profile",
      (s, dir) => profileFacts(SecDerive.facts(s, dir)),
      Some(s"""${SecSql.basePrelude}
SELECT count(*) AS n_rows,
  ${Seq("fact_id", "cik", "taxonomy", "tag", "unit", "period_start",
          "period_end", "value", "filing_accession_no", "form", "filed", "frame")
        .map(c => s"CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_$c")
        .mkString(",\n  ")},
  count(DISTINCT cik) AS n_ciks,
  min(period_end) AS min_period_end,
  max(period_end) AS max_period_end,
  CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
FROM facts""")),

    Q("q44_percentiles",
      (s, dir) => percentiles(Tables.events(s, dir), "event_type", "value")
        .orderBy("event_type"),
      Some("""
SELECT event_type,
  quantile_cont(value, 0.5) AS p50,
  quantile_cont(value, 0.9) AS p90,
  quantile_cont(value, 0.99) AS p99,
  min(value) AS vmin,
  max(value) AS vmax
FROM events GROUP BY event_type ORDER BY event_type""")))
}
