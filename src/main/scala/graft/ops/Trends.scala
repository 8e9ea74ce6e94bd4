package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.sec.{SecDerive, SecSql}

/** Trend analytics over the annual-statement mart: the year-over-year /
  * moving-average layer a consumer of the reference's `statements_annual`
  * table computes next (the reference stops at point-in-time ratios,
  * compute_ratios.py:29-39 — this is the natural extension over the same
  * keys). Exercises the window surfaces the rest of the engine doesn't:
  * `lag`/`lead` offsets and an explicit ROWS-BETWEEN moving frame.
  *
  * Scale shape: ONE shuffle on cik (the mart's natural partition key — at
  * 100 TB the table is already bucketed by cik, making this exchange-free),
  * one sort per partition shared by all four window functions (same window
  * spec modulo frame, so Spark plans a single Window node pair over one
  * sort). The moving average routes its sum through DECIMAL(38,6): frame
  * sums stay order-insensitive and oracle-exact.
  */
object Trends {

  private val dec = org.apache.spark.sql.types.DecimalType(38, 6)

  /** Per (cik, fiscal_year): prior/next-year revenue (lag/lead), null/zero-
    * safe YoY growth, and the trailing-3-year moving average revenue.
    * fiscal_year is unique per cik (mart primary key, db/schema.sql:62), so
    * the window order is total — no tie-breakers needed. */
  def revenueTrends(statements: DataFrame): DataFrame = {
    val w = Window.partitionBy("cik").orderBy("fiscal_year")
    val w3 = w.rowsBetween(-2, Window.currentRow)
    statements
      .select(col("cik"), col("fiscal_year"), col("revenues"))
      .withColumn("rev_prior", lag("revenues", 1).over(w))
      .withColumn("rev_next", lead("revenues", 1).over(w))
      .withColumn("yoy_growth",
        when(col("rev_prior").isNull || col("rev_prior") === 0, lit(null))
          .otherwise((col("revenues").cast("double") - col("rev_prior").cast("double"))
            / col("rev_prior").cast("double")))
      .withColumn("rev_ma3",
        sum(col("revenues").cast(dec)).over(w3).cast("double")
          / count(col("revenues")).over(w3).cast("double"))
  }

  /** Forward-fill imputation: carry the last NON-NULL revenue forward
    * within each cik's year series (`last_value IGNORE NULLS` over a
    * running frame) — the standard time-series gap-filling pass downstream
    * models want before differencing. Same single (cik) shuffle + sort as
    * the trend windows; `filled_from` records the provenance year so the
    * imputation is auditable. */
  def forwardFill(statements: DataFrame): DataFrame = {
    val w = Window.partitionBy("cik").orderBy("fiscal_year")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    statements
      .select(col("cik"), col("fiscal_year"), col("revenues"))
      .withColumn("revenues_filled",
        last(col("revenues"), ignoreNulls = true).over(w))
      .withColumn("filled_from",
        last(when(col("revenues").isNotNull, col("fiscal_year")),
          ignoreNulls = true).over(w))
  }

  val queries: Seq[Q] = Seq(
    Q("q64_forward_fill",
      (s, dir) => forwardFill(SecDerive.statementsV3(s, dir))
        .orderBy("cik", "fiscal_year"),
      Some(s"""${SecSql.fullPrelude}
        SELECT cik, fiscal_year, revenues,
          last_value(revenues IGNORE NULLS) OVER w AS revenues_filled,
          last_value(CASE WHEN revenues IS NOT NULL THEN fiscal_year END
                     IGNORE NULLS) OVER w AS filled_from
        FROM statements
        WINDOW w AS (PARTITION BY cik ORDER BY fiscal_year
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY cik, fiscal_year""")),

    Q("q55_trend_windows",
      (s, dir) => revenueTrends(SecDerive.statementsV3(s, dir))
        .orderBy("cik", "fiscal_year"),
      Some(s"""${SecSql.fullPrelude},
        t AS (SELECT cik, fiscal_year, revenues,
                lag(revenues) OVER w AS rev_prior,
                lead(revenues) OVER w AS rev_next,
                CAST(sum(CAST(revenues AS DECIMAL(38,6))) OVER w3 AS DOUBLE)
                  / CAST(count(revenues) OVER w3 AS DOUBLE) AS rev_ma3
              FROM statements
              WINDOW w AS (PARTITION BY cik ORDER BY fiscal_year),
                     w3 AS (PARTITION BY cik ORDER BY fiscal_year
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
        SELECT cik, fiscal_year, revenues, rev_prior, rev_next,
          CASE WHEN rev_prior IS NULL OR rev_prior = 0 THEN NULL
               ELSE (CAST(revenues AS DOUBLE) - CAST(rev_prior AS DOUBLE))
                    / CAST(rev_prior AS DOUBLE) END AS yoy_growth,
          rev_ma3
        FROM t ORDER BY cik, fiscal_year""")))
}
