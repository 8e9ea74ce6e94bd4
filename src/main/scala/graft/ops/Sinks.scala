package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Q
import graft.sec.{SecDerive, SecSql}

/** Sink semantics the reference gets from Postgres constraints
  * (db/schema.sql:39; ingest_facts.py:119-143; _v3.py:156-176), re-expressed
  * for an immutable columnar store:
  *
  *   - S7 insert-if-absent (`ON CONFLICT DO NOTHING`): dedup the incoming
  *     batch on its natural key, anti-join against the existing table, append.
  *     Idempotent: re-running the same batch appends zero rows.
  *   - S8 upsert (`ON CONFLICT DO UPDATE`): the reference's builders recompute
  *     every row anyway, so the faithful mapping is full recompute +
  *     overwrite (atomic directory swap). Incrementality is NOT the contract;
  *     idempotence is — same as the reference.
  *   - A10 filings dedup by accession; X10 `now()` audit columns.
  *
  * At 100 TB: the anti-join shuffles on the natural key — co-partitioned with
  * how the fact table should be bucketed anyway (by cik), and the existing
  * side prunes to only the partitions the batch touches when the table is
  * partitioned by a batch-correlated column.
  */
object Sinks {

  /** A10: keep one row per natural key within a batch. dropDuplicates picks
    * an arbitrary row among duplicates — callers needing determinism between
    * engines must ensure duplicate rows are identical (true for re-crawled
    * batches) or use Statements.latestWins with a total order. */
  def dedupBatch(batch: DataFrame, naturalKey: Seq[String]): DataFrame =
    batch.dropDuplicates(naturalKey)

  /** S7: rows of `batch` whose natural key is absent from `existing`, deduped
    * within the batch — the append set of `INSERT ... ON CONFLICT DO
    * NOTHING`. X10 audit column stamped at write. */
  def insertIfAbsent(existing: DataFrame, batch: DataFrame,
      naturalKey: Seq[String]): DataFrame =
    dedupBatch(batch, naturalKey)
      .join(existing.select(naturalKey.map(col): _*), naturalKey, "left_anti")
      .withColumn("created_at", current_timestamp())

  /** S7 materialized: append the absent rows to the parquet table at `path`.
    * Running it twice with the same batch leaves the table unchanged after
    * the first run (idempotence test in SinksSpec). */
  def appendIfAbsent(existing: DataFrame, batch: DataFrame,
      naturalKey: Seq[String], path: String): Unit =
    insertIfAbsent(existing, batch, naturalKey)
      .write.mode("append").parquet(path)

  /** S8: full-recompute upsert — overwrite the table with the freshly built
    * rows, stamping the X10 `updated_at` audit column (_v3.py:175). */
  def upsertOverwrite(recomputed: DataFrame, path: String): Unit =
    recomputed.withColumn("updated_at", current_timestamp())
      .write.mode("overwrite").parquet(path)

  // ---------------------------------------------------------------------------

  val queries: Seq[Q] = Seq(
    // S7/A10 as an oracle-checkable query: a doubled batch (simulated
    // re-ingest) deduped on the accession natural key. The duplicate copies
    // are identical rows, so dropDuplicates' arbitrary pick is deterministic.
    Q("q32_insert_if_absent",
      (s, dir) => {
        val fl = SecDerive.filings(s, dir)
        dedupBatch(fl.unionByName(fl), Seq("accession_no"))
          .orderBy("accession_no")
      },
      Some(s"""${SecSql.basePrelude}
        SELECT DISTINCT * FROM
          (SELECT * FROM filings UNION ALL SELECT * FROM filings)
        ORDER BY accession_no""")))
}
