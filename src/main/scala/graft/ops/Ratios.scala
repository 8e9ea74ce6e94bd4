package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Annual financial ratios (/root/reference/scripts/compute_ratios.py).
  * Pure narrow projection — no shuffle; executes inside whole-stage codegen
  * fused with whatever produced `statements`.
  */
object Ratios {

  /** A7: null/zero-safe division (compute_ratios.py:5-8). Explicit guard —
    * never rely on engine `/0` conventions, which differ across Spark ANSI
    * modes and DuckDB (SURVEY §7.4). a IS NULL propagates through `/`. */
  def safeDiv(a: Column, b: Column): Column =
    when(b.isNull || b === 0, lit(null)).otherwise(a / b)

  /** A8: the 8-ratio block (compute_ratios.py:29-39). */
  def compute(statements: DataFrame): DataFrame =
    statements.select(
      col("cik"), col("fiscal_year"),
      safeDiv(col("gross_profit"), col("revenues")).as("gross_margin"),
      safeDiv(col("operating_income"), col("revenues")).as("operating_margin"),
      safeDiv(col("net_income"), col("revenues")).as("net_margin"),
      safeDiv(col("net_income"), col("total_assets")).as("roa"),
      safeDiv(col("net_income"), col("total_equity")).as("roe"),
      safeDiv(col("total_assets"), col("total_equity")).as("leverage"),
      safeDiv(col("free_cash_flow"), col("revenues")).as("fcf_margin"),
      safeDiv(col("revenues"), col("total_assets")).as("asset_turnover"))
}
