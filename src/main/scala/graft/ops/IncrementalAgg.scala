package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Q, Tables}

/** Incremental aggregate maintenance: merge a delta's PARTIAL aggregates
  * into a stored aggregate table instead of recomputing from scratch.
  *
  * The 100 TB shape: the stored agg table is tiny (one row per group), the
  * daily delta is one partition of the fact table. `partials(delta)` scans
  * only the delta (map-side combine does nearly all the work — the shuffle
  * carries one row per group per partition), and `merge` re-aggregates
  * stored ++ delta partials — a shuffle over 2×|groups| rows, i.e. free.
  * Nothing ever rescans history.
  *
  * Works exactly for the algebraic aggregates (count/sum/min/max and
  * anything derivable from them, like avg = sum/count — derive AFTER the
  * merge, never store averages); holistic aggregates (exact median) don't
  * decompose — route those through sketches (q37/q44's approx tier).
  * Sums go through DECIMAL(38,6) so merge order can't change results
  * (the same invariance that makes the stored table stable across daily
  * runs at scale).
  *
  * Mirrors the reference's nightly recompute of its ratio/statement tables
  * (/root/reference/scripts/build_statements_annual_v3.py full-table DELETE
  * + reinsert) — re-expressed as the incremental form that survives a fact
  * table 1000× the cluster's scratch space.
  */
object IncrementalAgg {

  private val dec = DecimalType(38, 6)

  /** Partial (mergeable) aggregates of `raw` per `keys`:
    * n_rows, sum_qty (decimal), min_price, max_price. */
  def partials(raw: DataFrame, keys: Seq[String]): DataFrame =
    raw.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast(dec)).as("sum_qty"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))

  /** Merge any number of partial-agg tables (stored state ++ deltas) into
    * the combined state: the combine functions of each aggregate. */
  def merge(keys: Seq[String], states: DataFrame*): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("n_rows")).as("n_rows"),
        sum(col("sum_qty")).as("sum_qty"),
        min(col("min_price")).as("min_price"),
        max(col("max_price")).as("max_price"))

  /** Derived (non-stored) measures on top of the merged state. */
  def withDerived(state: DataFrame): DataFrame =
    state.withColumn("avg_qty",
      col("sum_qty").cast("double") / col("n_rows").cast("double"))

  // ---------------------------------------------------------------------------

  val queries: Seq[Q] = {
    val keys = Seq("l_returnflag", "l_linestatus")
    Seq(
      // Stored state (history strictly before the cut) + one day's delta,
      // merged — must equal the from-scratch aggregate over everything,
      // which is exactly what the oracle computes.
      Q("q69_incremental_agg",
        (s, dir) => {
          val li = Tables.lineitem(s, dir)
          val cut = "1995-06-01"
          val stored = partials(li.filter(col("l_shipdate") < cut), keys)
          val delta = partials(li.filter(col("l_shipdate") >= cut), keys)
          // The stored state stays DECIMAL(38,6) (merge-order invariance);
          // only the comparator-facing edge casts to double. r5 adjudicated
          // the residual hash mismatch to exactly this: q69 was the suite's
          // only physical decimal128 output, and the driver's pyarrow read
          // yields Decimal reprs while its DuckDB oracle yields float64 —
          // identical values, different hashes.
          val merged = withDerived(merge(keys, stored, delta))
            .withColumn("sum_qty", col("sum_qty").cast("double"))
          merged.orderBy(merged.columns.map(col).toIndexedSeq: _*)
        },
        Some("""
          SELECT l_returnflag, l_linestatus,
                 count(*) AS n_rows,
                 CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
                 min(l_extendedprice) AS min_price,
                 max(l_extendedprice) AS max_price,
                 CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS avg_qty
          FROM lineitem
          GROUP BY l_returnflag, l_linestatus
          ORDER BY l_returnflag, l_linestatus, n_rows, sum_qty,
                   min_price, max_price, avg_qty""")))
  }
}
