package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Incremental alternative to [[upsertOverwrite]] (SURVEY §1.3): merge a
    * batch into the existing table keeping the best row per natural key under
    * `order` — `ON CONFLICT DO UPDATE` without recomputing untouched rows.
    * `order` must be a TOTAL order (Statements.latestWins contract), which
    * also makes the merge idempotent: re-merging the same batch is a no-op.
    * At 100 TB the union shuffles once on the key — co-partitioned with the
    * table's bucketing — and only partitions the batch touches rewrite when
    * the store supports partition overwrite. */
  def mergeLatestWins(existing: DataFrame, batch: DataFrame,
      naturalKey: Seq[String], order: Seq[Column]): DataFrame =
    Statements.latestWins(naturalKey, order)(existing.unionByName(batch))

  // ---------------------------------------------------------------------------
  // JDBC variants — the BASELINE-named approach is "Spark SQL + JDBC to
  // Postgres"; the reference upserts into Postgres (ingest_facts.py:119-143,
  // _v3.py:156-176). Same sink semantics as the parquet forms, targeting a
  // JDBC URL. Tested against embedded Derby (JdbcSinkSpec); in production the
  // URL is Postgres and the driver jar sits on the executor classpath.
  // ---------------------------------------------------------------------------

  /** Read an existing JDBC table; empty relation with `batch`'s schema if the
    * table doesn't exist yet (first load). A read failure alone must NOT be
    * taken as "table missing" — a transient connection error, a revoked
    * SELECT grant, or a lock timeout would then skip the anti-join and
    * re-append the whole batch as duplicates — so on failure the table's
    * ABSENCE is confirmed explicitly through the catalog: connect, list
    * matching tables via `DatabaseMetaData.getTables` (a catalog read that
    * needs no SELECT grant on the table itself), and only return the empty
    * frame when the catalog confirms no such table. Any other state —
    * connection refused, catalog says the table exists but the read failed —
    * rethrows the original read failure. */
  private def readJdbcOrEmpty(spark: SparkSession, url: String, table: String,
      props: java.util.Properties, like: DataFrame): DataFrame =
    try spark.read.jdbc(url, table, props)
    catch {
      case e: Exception =>
        val absent =
          try {
            Option(props.getProperty("driver")).foreach(Class.forName)
            val conn = java.sql.DriverManager.getConnection(url, props)
            try {
              // `table` may be schema-qualified; identifiers may be stored
              // folded either way (Derby/Postgres fold differently), so probe
              // the given, upper, and lower spellings.
              val parts = table.split("\\.")
              val (schemaPat, namePat) =
                if (parts.length > 1) (parts(parts.length - 2), parts.last)
                else (null: String, table)
              def exists(s: String, n: String): Boolean = {
                val rs = conn.getMetaData.getTables(null, s, n, null)
                try rs.next() finally rs.close()
              }
              val spellings = Seq[String => String](identity,
                _.toUpperCase(java.util.Locale.ROOT),
                _.toLowerCase(java.util.Locale.ROOT))
              !spellings.exists(f =>
                exists(Option(schemaPat).map(f).orNull, f(namePat)))
            } finally conn.close()
          } catch { case _: Exception => throw e } // can't confirm absence: surface the read failure
        if (absent)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], like.schema)
        else throw e // table present but unreadable: NOT a first load
    }

  /** S7 over JDBC: `INSERT ... ON CONFLICT DO NOTHING` — anti-join the batch
    * against the current table contents, append the absent rows. Idempotent
    * (JdbcSinkSpec). `batchsize` tunes the JDBC insert batching: at scale
    * each executor task holds one connection and writes its partition in
    * `batchsize`-row batches. */
  def jdbcAppendIfAbsent(spark: SparkSession, url: String, table: String,
      batch: DataFrame, naturalKey: Seq[String],
      batchsize: Int = 10000,
      props: java.util.Properties = new java.util.Properties): Unit = {
    val existing = readJdbcOrEmpty(spark, url, table, props, batch)
    dedupBatch(batch, naturalKey)
      .join(existing.select(naturalKey.map(col): _*), naturalKey, "left_anti")
      .write.mode("append")
      .option("batchsize", batchsize.toString)
      .jdbc(url, table, props)
  }

  /** S8 over JDBC: full-recompute upsert — truncate-and-reload, the JDBC
    * equivalent of the overwrite directory swap (TRUNCATE preserves the DDL
    * the reference declares in schema.sql). */
  def jdbcUpsertOverwrite(url: String, table: String, recomputed: DataFrame,
      batchsize: Int = 10000,
      props: java.util.Properties = new java.util.Properties): Unit =
    recomputed.write.mode("overwrite")
      .option("truncate", "true")
      .option("batchsize", batchsize.toString)
      .jdbc(url, table, props)

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
        ORDER BY accession_no""")),

    // The incremental latest-wins merge: a batch of amended filings (re-filed
    // 10 days later as 10-K/A for even fiscal years) merged into the existing
    // table — amendments win on filing_date, untouched keys pass through.
    Q("q47_merge_latest_wins",
      (s, dir) => {
        val fl = SecDerive.filings(s, dir)
        val amended = fl.filter(col("fiscal_year") % 2 === 0)
          .withColumn("form", lit("10-K/A"))
          .withColumn("filing_date", date_add(col("filing_date"), 10))
        mergeLatestWins(fl, amended, Seq("accession_no"),
          Seq(col("filing_date").desc_nulls_last, col("form").asc))
          .orderBy("accession_no")
      },
      Some(s"""${SecSql.basePrelude},
        amended AS (
          SELECT accession_no, cik, '10-K/A' AS form,
                 filing_date + 10 AS filing_date, report_date,
                 fiscal_year, fiscal_period
          FROM filings WHERE fiscal_year % 2 = 0),
        merged AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY accession_no
              ORDER BY filing_date DESC NULLS LAST, form ASC) AS rn
            FROM (SELECT * FROM filings UNION ALL SELECT * FROM amended))
          WHERE rn = 1)
        SELECT accession_no, cik, form, filing_date, report_date,
               fiscal_year, fiscal_period
        FROM merged ORDER BY accession_no""")))
}
