package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.sec.{SecDerive, SecSql}

/** Slowly-changing dimension, type 2: version rows with validity intervals
  * [effective_from, effective_to) per key, open interval (NULL end) on the
  * current row — the point-in-time dimension shape the warehouse needs so a
  * fact can join the version that was true WHEN IT HAPPENED (the as-of join,
  * q41/q67, is the read side of this write shape).
  *
  * The reference keeps only latest-wins dimensions (filings' accession
  * upsert, schema.sql:24-31) — SCD2 is what that becomes once history must
  * survive: instead of overwriting, close the old version and append the new.
  *
  * Two forms:
  *   - `fromHistory`: one window pass over the full history — one shuffle on
  *     the key, effective_to = lead(effective_from). The rebuild path.
  *   - `applyAppend`: the incremental path at 100 TB — new versions arrive
  *     append-only; ONLY the affected keys' current rows re-window (a
  *     broadcast-sized slice), closed rows are untouched. The spec pins
  *     applyAppend == fromHistory on the combined history.
  */
object Scd {

  /** Rebuild the SCD2 dim from full history: one row per version, closed by
    * the next version's start. Ties broken by `tiebreak` for a total order
    * (same contract as every window in the engine). */
  def fromHistory(history: DataFrame, key: String, ts: String,
      tiebreak: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts).asc, col(tiebreak).asc)
    history
      .withColumn("effective_from", col(ts))
      .withColumn("effective_to", lead(col(ts), 1).over(w))
      .withColumn("is_current", col("effective_to").isNull.cast("int"))
      .drop(ts)
  }

  /** Append-only incremental maintenance: close affected current rows and
    * version the new arrivals. `changes` must be strictly later than the
    * stored history for its keys (append-only contract; enforce upstream
    * with a max(ts) guard). Untouched keys' rows pass through unchanged —
    * the work scales with |changes|, not |dim|. */
  def applyAppend(dim: DataFrame, changes: DataFrame, key: String, ts: String,
      tiebreak: String): DataFrame = {
    val affected = changes.select(key).distinct()
    // Current rows of affected keys re-enter the window with the changes;
    // everything else (closed rows, untouched keys) is already final.
    val reopened = dim.join(affected, Seq(key), "left_semi")
      .filter(col("is_current") === 1)
      .drop("effective_to", "is_current")
      .withColumnRenamed("effective_from", ts)
    val untouched = dim.join(affected, Seq(key), "left_anti")
      .unionByName(dim.join(affected, Seq(key), "left_semi")
        .filter(col("is_current") === 0))
    untouched.unionByName(
      fromHistory(reopened.unionByName(changes), key, ts, tiebreak))
  }

  // ---------------------------------------------------------------------------

  val queries: Seq[Q] = Seq(
    // The filings history as an SCD2 dimension: each accession is a version
    // of the company's filing state, valid until the next filing.
    Q("q70_scd2_filings",
      (s, dir) => fromHistory(
        SecDerive.filings(s, dir)
          .select("cik", "accession_no", "form", "filing_date"),
        key = "cik", ts = "filing_date", tiebreak = "accession_no")
        .select("cik", "accession_no", "form",
          "effective_from", "effective_to", "is_current")
        .orderBy("cik", "effective_from", "accession_no"),
      Some(s"""${SecSql.basePrelude}
        SELECT cik, accession_no, form,
               filing_date AS effective_from,
               lead(filing_date) OVER w AS effective_to,
               CAST(lead(filing_date) OVER w IS NULL AS INT) AS is_current
        FROM filings
        WINDOW w AS (PARTITION BY cik ORDER BY filing_date, accession_no)
        ORDER BY cik, effective_from, accession_no""")))
}
