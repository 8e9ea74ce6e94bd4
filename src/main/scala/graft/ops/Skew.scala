package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Skew mitigation: two-stage salted aggregation.
  *
  * A hot grouping key (one mega-filer cik, one dominant event_type) turns a
  * single-shuffle groupBy into one straggler task at 100 TB. Salting splits
  * each key into `salt` sub-keys for the first (partial) aggregation, then
  * combines the partials in a second, tiny aggregation keyed on the true key
  * — the classic two-stage combine, expressed so Catalyst plans two hash
  * aggregations with a shuffle each, the first uniformly spread.
  *
  * Only aggregations with a combine function decompose this way (sum, count,
  * min, max — not exact median). AQE's skew-join handling covers the JOIN
  * case; this covers aggregation.
  */
object Skew {

  /** Decimal-exact salted sum + count per key: deterministic results (the
    * decimal route makes addition order-insensitive) AND skew-proof. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      salt: Int = 16): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 6)
    val keyCols: Seq[Column] = keys.map(col)
    df
      // Salt = hash of ALL the row's columns: spreads hot keys like a random
      // salt but is RETRY-DETERMINISTIC — a re-executed task recomputes the
      // same salt per row (monotonically_increasing_id is not stable under
      // task retries; no query path should carry a nondeterministic
      // expression). Degenerate case: a hot key whose rows are fully
      // IDENTICAL collapses to one salt bucket — harmless, because stage 1's
      // map-side partial aggregation compresses identical-group rows to one
      // per partition before the shuffle, so no straggler can form there.
      .withColumn("__salt", pmod(hash(df.columns.toIndexedSeq.map(col): _*), lit(salt)))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(
        sum(col(valueCol).cast(dec)).as("__psum"),
        count(lit(1)).as("__pcnt"))
      .groupBy(keyCols: _*)
      .agg(
        sum(col("__psum")).cast("double").as("sum_value"),
        sum(col("__pcnt")).as("n_rows"))
  }

  /** Approximate distinct counts per event type: the HLL++ path for
    * cardinality at 100 TB (exact distinct = full shuffle of the key space;
    * the sketch is mergeable map-side state). rsd 1% keeps the estimate
    * within oracle row-count tolerance on small data; the raw estimate is
    * engine-specific, so the ORACLE-checked form is [[approxDistinctAudit]]. */
  def approxDistinct(events: DataFrame): DataFrame =
    events.groupBy("event_type")
      .agg(
        approx_count_distinct(col("user_id"), rsd = 0.01).as("approx_users"),
        count(lit(1)).as("n_events"))

  /** Oracle-checkable form of the sketch: emit the EXACT distinct count plus
    * a `within_tol` flag asserting the HLL++ estimate lands within `tol` of
    * it. DuckDB mirrors the exact counts and a constant TRUE — so the
    * estimate's accuracy contract is itself part of the hash-matched gate
    * (a drifting sketch flips within_tol to false and the row hash diverges). */
  def approxDistinctAudit(events: DataFrame, tol: Double = 0.03): DataFrame =
    // Exact distinct via explicit two-level aggregation (pre-aggregate on
    // (event_type, user_id), then count rows per event_type) instead of a
    // COUNT(DISTINCT) in the same aggregate as the sketch — both levels get
    // map-side partials and the hot-key shuffle is spread by user_id, the
    // same decomposition the salted aggregation uses. The sketch is
    // duplicate-insensitive, so feeding it the deduped pairs yields the
    // identical HLL estimate.
    events.groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("__c"))
      .groupBy("event_type")
      // count(user_id), not count(*): a NULL user_id forms its own stage-1
      // group, and SQL's COUNT(DISTINCT) semantics (the oracle) exclude it —
      // as does approx_count_distinct, so the tolerance compares like for
      // like. n_events still counts every event, null-user ones included.
      .agg(
        approx_count_distinct(col("user_id"), rsd = 0.01).as("approx_users"),
        count(col("user_id")).as("exact_users"),
        sum(col("__c")).as("n_events"))
      .select(col("event_type"), col("n_events"), col("exact_users"),
        (abs(col("approx_users").cast("double") - col("exact_users").cast("double")) /
          col("exact_users").cast("double") <= tol).as("within_tol"))

  val queries: Seq[Q] = Seq(
    Q("q37_approx_distinct",
      (s, dir) => approxDistinctAudit(Tables.events(s, dir)).orderBy("event_type"),
      Some("""
SELECT event_type, count(*) AS n_events,
  count(DISTINCT user_id) AS exact_users,
  TRUE AS within_tol
FROM events GROUP BY event_type ORDER BY event_type""")),

    // Salted two-stage aggregation == plain GROUP BY for the oracle: the
    // salt is internal plumbing, invisible in the result.
    Q("q36_salted_agg",
      (s, dir) => saltedSumCount(Tables.events(s, dir),
        Seq("event_type"), "value")
        .orderBy("event_type"),
      Some("""
SELECT event_type,
  CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
  count(*) AS n_rows
FROM events GROUP BY event_type ORDER BY event_type""")))
}
