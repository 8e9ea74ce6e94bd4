package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical layout: what replaces the reference's two B-tree indexes
  * (`idx_facts_cik_tag_end`, `idx_filings_cik_date` — db/schema.sql:65-66)
  * in an immutable columnar store (SURVEY §4 "access-path selection").
  *
  *   - Hash-bucketed partition column on cik: point/company queries prune to
  *     one directory out of `nBuckets` — the moral equivalent of the index's
  *     leading column. Bucket count scales with data volume (at 100 TB,
  *     thousands of buckets keep partitions in the 100 MB - 1 GB band).
  *   - sortWithinPartitions(cik, tag, period_end): parquet row-group min/max
  *     stats become selective for the index's trailing columns, so pushed
  *     filters skip row groups the way a B-tree skips pages.
  *
  * The bucket function is the engine-portable md5-based hash (stable across
  * releases — Spark's own `hash()` is fine too but pins the layout to one
  * implementation).
  */
object Layout {

  def bucketOf(cik: org.apache.spark.sql.Column, nBuckets: Int): org.apache.spark.sql.Column =
    pmod(conv(substring(md5(cik), 1, 15), 16, 10).cast("long"), lit(nBuckets)).cast("int")

  /** Write facts partitioned by cik-bucket, row-group-sorted by
    * (cik, tag, period_end). */
  def writeFactsPartitioned(facts: DataFrame, path: String, nBuckets: Int = 16): Unit =
    facts
      .withColumn("cik_bucket", bucketOf(col("cik"), nBuckets))
      .repartition(col("cik_bucket"))
      .sortWithinPartitions("cik", "tag", "period_end")
      .write.mode("overwrite")
      .partitionBy("cik_bucket")
      .parquet(path)

  /** Point read for one company: the bucket predicate prunes partitions, the
    * cik/tag predicates push into parquet and skip row groups. */
  def factsForCik(spark: SparkSession, path: String, cik: String,
      nBuckets: Int = 16): DataFrame =
    spark.read.parquet(path)
      .filter(col("cik_bucket") === bucketOf(lit(cik), nBuckets) &&
        col("cik") === cik)

  /** Bucketed (hash-clustered) table write: two tables bucketed on the same
    * join key with the same bucket count join WITHOUT any exchange — the
    * co-located join that makes the repeated facts⋈filings shape free at
    * 100 TB (each bucket pair joins locally; only the within-bucket sort
    * remains, and sortBy at write removes even that for SMJ). */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** The ANN-side layout: embeddings written partitioned by their IVF cell
    * (graft.llm.Similarity.ivfAssign), so an nprobe search READS ONLY nprobe
    * DIRECTORIES of the corpus — the storage half of the IVF design
    * (SCALE.md: "cell id is the partition column"). At 100 TB, cells
    * subpartition by hash when a single cell outgrows the file-size band. */
  def writeEmbeddingsByCell(assigned: DataFrame, path: String): Unit =
    assigned
      .repartition(col("cell"))
      .write.mode("overwrite")
      .partitionBy("cell")
      .parquet(path)

  /** Probe-side read: `cells` travels into PartitionFilters, so the scan
    * touches only those directories — nothing outside the probed cells is
    * even opened. */
  def embeddingsInCells(spark: SparkSession, path: String,
      cells: Seq[Long]): DataFrame =
    spark.read.parquet(path).filter(col("cell").isin(cells: _*))

  /** The lexical-side serving layout: BM25 postings (doc_id, dl, term, tf)
    * written partitioned by a hash bucket of the term and row-group-sorted
    * by term — a query's scoring pass opens only its terms' bucket
    * directories (partition pruning) and, within them, only the row groups
    * whose term min/max covers a query term (pushed filter + sorted
    * row-group stats). Term itself is too high-cardinality to be the
    * partition column (millions of directories); the bucket column gives
    * bounded directory count with the same pruning effect.
    *
    * The one-shot build lands under the reserved base partition
    * `batch_id=-1` (the same convention as the IVFADC codes layout —
    * ingest batch ids are >= 0, so a later [[appendPostings]] can never
    * collide with the base), making the layout append-ready from birth. */
  def writePostings(postings: DataFrame, path: String,
      nBuckets: Int = 64): Unit = {
    writePostingsBatch(postings, path, nBuckets, batchId = -1L,
      dynamic = false)
    // geometry sidecar: the reader derives buckets from THIS, so a
    // writer/reader nBuckets mismatch cannot silently prune to the wrong
    // directories and drop postings rows
    postings.sparkSession.range(1)
      .select(lit(nBuckets).as("n_buckets"))
      .write.mode("overwrite").parquet(s"${path}_meta")
  }

  /** Ingest a doc-disjoint postings delta into a [[writePostings]] layout
    * under its own `batch_id` partitions — the lexical twin of
    * [[graft.llm.Selection.appendToIvfadcIndex]]. Exactly-once: DYNAMIC
    * partition overwrite means a re-delivered batch (driver retry after a
    * successful commit, operator re-run) rewrites its own (bucket, batch)
    * partitions byte-identically instead of appending duplicate rows.
    * Postings rows are per (doc, term), so doc-disjoint batches union into
    * exactly the one-shot build over the union corpus (spec-pinned).
    * Re-ingesting an EXISTING doc_id is NOT shadowed here (a new doc
    * version can drop terms, which latest-wins per row cannot express, and
    * the stats tables are additive) — updated docs go through the offline
    * rebuild/compaction path, same operational split as retraining the
    * IVFADC geometry. The bucket count comes from the layout's own
    * sidecar, so an append can never bucket differently than its base. */
  def appendPostings(postings: DataFrame, path: String,
      batchId: Long): Unit = {
    require(batchId >= 0,
      s"batchId must be >= 0 (negative ids are reserved for the base/" +
        s"compacted partition batch_id=-1), got $batchId")
    val nBuckets =
      postings.sparkSession.read.parquet(s"${path}_meta").head().getInt(0)
    writePostingsBatch(postings, path, nBuckets, batchId, dynamic = true)
  }

  private def writePostingsBatch(postings: DataFrame, path: String,
      nBuckets: Int, batchId: Long, dynamic: Boolean): Unit = {
    val w = postings
      .withColumn("term_bucket", bucketOf(col("term"), nBuckets))
      .withColumn("batch_id", lit(batchId))
      .repartition(col("term_bucket"))
      // partition columns FIRST: the parquet writer requires ordering on
      // the partition columns and would insert its own (not-necessarily-
      // stable) sort, which could destroy the within-file term order the
      // row-group min/max skipping depends on; sorting (bucket, batch,
      // term) satisfies the writer's required prefix and keeps term runs
      // contiguous (batch_id is constant within one write)
      .sortWithinPartitions("term_bucket", "batch_id", "term")
      .write.mode("overwrite")
      .partitionBy("term_bucket", "batch_id")
    (if (dynamic) w.option("partitionOverwriteMode", "dynamic") else w)
      .parquet(path)
  }

  // ------------------------------------------------------ batch visibility

  /** Batch-commit visibility protocol for the persisted serving layouts.
    *
    * An incremental append (appendToBm25Index / appendToIvfadcIndex) is a
    * multi-table dynamic-partition overwrite; during a re-delivered
    * batch's delete-then-commit window a concurrent read could transiently
    * miss or double-count that batch's rows. The protocol closes the
    * window with one marker file per batch at the index ROOT
    * (`_commits/batch_<id>`), covering every table of the layout at once:
    *
    *   - append = delete the batch's marker ([[beginBatchCommit]]) →
    *     rewrite the batch's partitions in every table → re-create the
    *     marker ([[finishBatchCommit]]). Marker create/delete is atomic
    *     per file, so a reader never observes a half-visible batch.
    *   - read = list `_commits` once at plan time and keep only
    *     `batch_id ∈ {-1} ∪ committed` ([[committedBatchFilter]]) — a
    *     PARTITION-column predicate, so invisibility is directory pruning,
    *     not a row filter. A replayed batch disappears as a whole until
    *     its rewrite commits, then reappears as a whole: a read PLANNED
    *     after beginBatchCommit serves a consistent per-batch snapshot
    *     (stale-but-consistent during the window). The guarantee is
    *     plan-time, not scan-time: a begin that lands between a reader's
    *     predicate resolution and its scan can still expose partially
    *     rewritten partitions — true snapshot isolation would need a
    *     manifest/rename swap (the compaction path's doctrine), which the
    *     per-request re-plan in the serving layer approximates.
    *
    * The base partition `batch_id=-1` (one-shot build / compaction fold)
    * is always visible — it is written before the root is ever served and
    * never rewritten in place. Layouts WITHOUT a `_commits` directory
    * (pre-protocol roots, standalone postings layouts) read unfiltered,
    * preserving their original semantics. The listing is driver-side and
    * bounded by the live batch count — compaction folds it back to zero. */
  def initCommitLog(spark: SparkSession, base: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(base)
    val p = new org.apache.hadoop.fs.Path(s"$base/_commits")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      fs.mkdirs(p)
      // BACKFILL on first protocol contact with a pre-protocol root: its
      // existing batch partitions are committed data (they were readable
      // unfiltered until this moment), so creating an EMPTY log here
      // would hide them from every read and drop them from compaction
      // folds. One bounded directory walk finds the live batch ids.
      collectBatchIds(fs, root, depth = 4).filter(_ >= 0)
        .foreach { id =>
          val m = new org.apache.hadoop.fs.Path(p, s"batch_$id")
          val out = fs.create(m, true)
          out.close()
        }
    }
  }

  /** Every `batch_id=N` partition value found under `p` (any table, up to
    * `depth` directory levels — batch_id nests under term_bucket= /
    * cell= / (band=, vb=) in the serving layouts). */
  private def collectBatchIds(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, depth: Int): Set[Long] =
    if (depth < 0 || !fs.exists(p)) Set.empty
    else fs.listStatus(p).toSeq.filter(_.isDirectory).flatMap { st =>
      val n = st.getPath.getName
      if (n == "_commits") Set.empty[Long]
      else if (n.startsWith("batch_id="))
        n.stripPrefix("batch_id=").toLongOption.toSet
      else collectBatchIds(fs, st.getPath, depth - 1)
    }.toSet

  /** Open a batch's rewrite window: drop its marker so readers skip the
    * batch wholesale while its partitions are being (re)written. */
  def beginBatchCommit(spark: SparkSession, base: String, batchId: Long): Unit = {
    initCommitLog(spark, base)
    val p = new org.apache.hadoop.fs.Path(s"$base/_commits/batch_$batchId")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, false)
  }

  /** Close a batch's rewrite window: every table's partitions for this
    * batch are fully written, make the batch visible atomically. */
  def finishBatchCommit(spark: SparkSession, base: String, batchId: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$base/_commits/batch_$batchId")
    val out = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .create(p, true)
    out.close()
  }

  /** The read-side visibility predicate on `batch_id` — resolved from the
    * commit log at plan time, so each request sees a consistent batch
    * snapshot. `lit(true)` for pre-protocol layouts. */
  def committedBatchFilter(spark: SparkSession, base: String)
      : org.apache.spark.sql.Column = {
    val dir = new org.apache.hadoop.fs.Path(s"$base/_commits")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) lit(true)
    else {
      // toLongOption: a stray non-numeric file in _commits (editor temp,
      // _SUCCESS, half-written name) must not throw at plan time and take
      // down every serving read of the root — skip it like collectBatchIds
      val ids = fs.listStatus(dir).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("batch_"))
        .flatMap(_.stripPrefix("batch_").toLongOption)
      if (ids.isEmpty) col("batch_id") === -1L
      else col("batch_id") === -1L || col("batch_id").isin(ids: _*)
    }
  }

  /** Driver-side twin of [[bucketOf]] — literally the same md5 arithmetic
    * (first 15 hex chars as a 60-bit int, mod nBuckets) evaluated in Scala,
    * so a LITERAL term set resolves its buckets at plan time and the bucket
    * predicate prunes partitions statically (spec-pinned equal to the
    * Column form). */
  def bucketOfLocal(s: String, nBuckets: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    (java.lang.Long.parseLong(hex.substring(0, 15), 16) % nBuckets).toInt
  }

  /** Query-side read of the postings layout: the bucket predicate (computed
    * driver-side from the literal terms, with the bucket count read from
    * the layout's own geometry sidecar — a 1-row metadata read, the moral
    * equivalent of a catalog lookup) prunes to ≤ |terms| directories; the
    * term predicate pushes into parquet and skips row groups. The scan
    * cost is the query's postings rows — independent of corpus text size. */
  def postingsForTerms(spark: SparkSession, path: String,
      terms: Seq[String],
      visibility: org.apache.spark.sql.Column = lit(true)): DataFrame = {
    val nBuckets = spark.read.parquet(s"${path}_meta").head().getInt(0)
    val buckets = terms.map(bucketOfLocal(_, nBuckets)).distinct
    spark.read.parquet(path)
      // `visibility` is the caller's batch-commit predicate
      // ([[committedBatchFilter]] over the owning index root) — another
      // partition-column conjunct, pruned with the bucket directories
      .filter(col("term_bucket").isin(buckets: _*) &&
        col("term").isin(terms: _*) && visibility)
      // batch_id is layout plumbing (append idempotence), not query
      // surface: batches are doc-disjoint by contract, so dropping it
      // cannot create colliding (doc, term) rows
      .drop("term_bucket", "batch_id")
  }

  /** Event-time layout: day-partitioned directories, the standard
    * append-only fact layout — each day's load lands in its own directory,
    * time-range predicates prune to the covered days (PartitionFilters, no
    * file even opened outside the range), and retention/compliance deletes
    * are directory drops. At 100 TB with years of history this is the
    * difference between scanning a day and scanning an archive. */
  def writeEventsByDay(events: DataFrame, path: String): Unit =
    events
      .withColumn("event_date", to_date(col("ts")))
      .repartition(col("event_date"))
      .write.mode("overwrite")
      .partitionBy("event_date")
      .parquet(path)

  /** Time-range read over the day layout: the date predicate is a partition
    * filter (directory pruning), anything else pushes into parquet. */
  def eventsBetween(spark: SparkSession, path: String,
      fromDate: String, toDate: String): DataFrame =
    spark.read.parquet(path)
      .filter(col("event_date") >= fromDate && col("event_date") <= toDate)

  /** Schema-evolution read: years of parquet written under drifting schemas
    * (columns added over time) read as ONE table — parquet's mergeSchema
    * unions the field sets; files missing a column surface nulls. The
    * operational contract: ADD columns only (a type change or rename is a
    * rewrite, not an evolution — same rule as every columnar warehouse). */
  def readEvolved(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)

  /** Small-file compaction: rewrite a parquet directory into files near
    * `targetBytes`. The operational tax of incremental pipelines (each
    * micro-batch/delta append lands its own files; a 100 TB table fed by
    * 10k daily tasks degrades into millions of kilobyte files whose open
    * cost dwarfs the scan). File count = ceil(on-disk bytes / target);
    * `coalesce` (not repartition) so compaction is a SHUFFLE-FREE read-
    * concatenate-write — each output task concatenates a set of input
    * files. Write lands in `outPath` (swap-in is the caller's move — object
    * stores rename atomically per key, so publish-by-rename or a manifest
    * flip, never in-place).
    *
    * Returns (input file count, output file count). */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    def parquetFiles(p: String): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      walk(new java.io.File(p))
    }
    val inFiles = parquetFiles(inPath)
    val totalBytes = inFiles.map(_.length()).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inPath)
      .coalesce(nOut)
      .write.mode("overwrite").parquet(outPath)
    (inFiles.size, parquetFiles(outPath).size)
  }
}
