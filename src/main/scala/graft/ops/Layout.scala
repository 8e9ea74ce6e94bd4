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

  /** The designed manifest-publish race: a second writer won the version
    * this publish targeted. The ONLY failure [[commitWithRetry]] retries —
    * an unrelated IllegalStateException (stopped SparkContext, torn
    * internal state) surfaces immediately instead of burning retry
    * attempts re-running a publish that can never succeed. */
  final class ManifestPublishConflict(msg: String)
    extends IllegalStateException(msg)

  /** A takedown's optimistic-concurrency failure: the root's manifest
    * advanced between the takedown's victim-discovery scans and its swap,
    * so a concurrent append may have delivered victim-bearing rows the
    * rewrite never saw. DISTINCT from [[ManifestPublishConflict]] on
    * purpose: the publish-only retry ([[commitWithRetry]]) must never
    * absorb it — recovery is re-running DISCOVERY against the advanced
    * manifest ([[takedownWithRetry]]), not re-publishing a stale
    * rewrite. */
  final class TakedownConcurrencyConflict(msg: String)
    extends IllegalStateException(msg)

  def bucketOf(cik: org.apache.spark.sql.Column, nBuckets: Int): org.apache.spark.sql.Column =
    pmod(conv(substring(md5(cik), 1, 15), 16, 10).cast("long"), lit(nBuckets)).cast("int")

  /** Arm parquet bloom filters on an index table's IDENTITY columns at
    * write time — the skip structure for point probes and the takedown
    * victim-discovery scans over columns the file sort does NOT cluster
    * (doc_id inside term-sorted postings, vec_id inside cell-partitioned
    * codes). Deliberately always-on at every index write because it is
    * FREE until it matters: parquet-mr writes no bloom while the column
    * chunk stays dictionary-encoded (the dictionary page is already an
    * exact row-group membership filter — measured byte-identical files
    * at the tested SFs), and materializes one exactly when the chunk
    * falls back to plain encoding at high NDV — the 100 TB shape, where
    * a row group holds ~10^6 distinct ids. Measured at the fallback
    * tier (20M unique ids, term-sorted): +3.2% file bytes, cold point
    * probe 3.4× faster (row groups skipped by bloom instead of read —
    * on an object store those are saved GETs, not just saved decode). */
  def withIdBloom[T](w: org.apache.spark.sql.DataFrameWriter[T],
      cols: String*): org.apache.spark.sql.DataFrameWriter[T] =
    cols.foldLeft(w)((acc, c) =>
      acc.option(s"parquet.bloom.filter.enabled#$c", "true"))

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
    * [[graft.llm.Selection.appendToIvfadcIndex]]. `batchId` here is the
    * PHYSICAL delivery id ([[beginBatchCommit]]'s return) when called
    * inside the manifest protocol; DYNAMIC partition overwrite keeps a
    * crashed attempt's retry (same physical id) self-healing.
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
    val wb = withIdBloom(w, "doc_id").partitionBy("term_bucket", "batch_id")
    (if (dynamic) wb.option("partitionOverwriteMode", "dynamic") else wb)
      .parquet(path)
  }

  // ------------------------------------------------------ batch visibility

  /** Batch-commit SNAPSHOT protocol for the persisted serving layouts.
    *
    * An incremental append (appendToBm25Index / appendToIvfadcIndex /
    * appendToAhashIndex) is a multi-table partition write; a re-delivered
    * batch is a rewrite of content a concurrent read may be serving. The
    * protocol gives readers true per-root snapshot isolation — the moral
    * equivalent of the reference's per-company `conn.commit()`
    * (ingest_facts.py:145: the warehouse never serves a half-committed
    * company) — with TWO rules:
    *
    *   1. **Committed data files are immutable.** A batch delivery never
    *      overwrites partitions a published snapshot references: each
    *      delivery of logical batch L writes under a fresh PHYSICAL
    *      partition id `(L+1)*GenStride + gen` (gen = delivery attempt,
    *      allocated by [[beginBatchCommit]]). The previous delivery's
    *      directories stay on disk untouched until [[vacuumLayout]].
    *   2. **Visibility is one atomic manifest swap.** The root's
    *      `_commits/manifest-<version>` file (write-temp + atomic rename;
    *      highest version wins) lists the visible `logical physical`
    *      pairs — exactly one physical per logical. [[finishBatchCommit]]
    *      publishes the next version; [[committedBatchFilter]] resolves
    *      the current one into a partition-column predicate
    *      (`batch_id ∈ {-1} ∪ physicals`), so invisibility is directory
    *      pruning, not a row filter.
    *
    * Together: a read that resolves its file listing and manifest at ANY
    * point observes a consistent snapshot through its collect — even if a
    * begin + full rewrite + finish lands between its plan resolution and
    * its action, the files it planned against still exist and the batch
    * set it resolved was some published manifest. There is no window in
    * which a batch "vanishes": a replay serves the PREVIOUS delivery
    * until the swap, then the new one (stale-but-consistent, never torn).
    *
    * Recency across deliveries: per-vector latest-wins logic (IVFADC
    * codes/reassign) must order by LOGICAL batch — [[logicalBatch]] maps
    * a physical partition id back to its logical id (`-1` base → `-1`;
    * legacy raw ids < GenStride → themselves) so a late re-delivery of an
    * old batch can never outrank a logically newer one.
    *
    * The base partition `batch_id=-1` (one-shot build / compaction fold)
    * is always visible — written before the root is ever served, never
    * rewritten in place. Layouts WITHOUT a `_commits` directory
    * (standalone postings layouts) read unfiltered, preserving their
    * original semantics; pre-manifest roots carrying old-style
    * `_commits/batch_<id>` marker files read from the markers until first
    * manifest contact folds them in. One writer per root (the append
    * contract); the manifest listing is driver-side and O(live batches) —
    * compaction folds it back to zero. */
  val GenStride = 1000000L

  /** Physical partition id → logical batch id: base/legacy ids pass
    * through, stride-encoded delivery ids map back. The recency key for
    * every latest-wins fold over `batch_id`. Base REWRITES (row-level
    * delete) deliver under negative physicals `-(2+gen)` — all of them
    * map back to logical `-1`, so a rewritten base stays the oldest
    * logical batch in every latest-wins fold, exactly like the original
    * `batch_id=-1` directory it replaced. */
  def logicalBatch(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(c < -1L, -1L)
      .when(c < GenStride, c)
      .otherwise(floor(c / GenStride).cast("long") - 1L)

  /** Driver-side twin of [[logicalBatch]]. */
  def logicalBatchLocal(p: Long): Long =
    if (p < -1L) -1L else if (p < GenStride) p else p / GenStride - 1

  /** Delivery recency WITHIN one logical batch — the "which physical is
    * newer" order vacuum and gen allocation use. For appended batches the
    * physical id itself is monotone in gen (legacy raw ids < any
    * stride-encoded delivery). The base's rewrite chain counts the other
    * way (`-1` original, then `-2`, `-3`, …), so its rank is the rewrite
    * gen: `-1 → -1`, `-(2+g) → g`. Ranks are only ever compared within
    * one logical batch. */
  private[ops] def deliveryRank(p: Long): Long =
    if (p < -1L) -2L - p else p

  private def commitsDir(base: String) =
    new org.apache.hadoop.fs.Path(s"$base/_commits")

  private def fsOf(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (version, path) of every published manifest under `_commits`. */
  private def listManifests(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Seq[(Long, org.apache.hadoop.fs.Path)] =
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq.map(_.getPath).flatMap { p =>
      val n = p.getName
      if (n.startsWith("manifest-"))
        n.stripPrefix("manifest-").toLongOption.map(_ -> p)
      else None
    }

  /** Highest-version manifest's (version, logical → physical) map, if any
    * manifest has ever been published on this root. */
  private def currentManifest(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Option[(Long, Map[Long, Long])] = {
    val ms = listManifests(fs, dir)
    if (ms.isEmpty) None
    else {
      val (v, p) = ms.maxBy(_._1)
      Some((v, readManifestFile(fs, p)))
    }
  }

  /** Parse one manifest file's `logical physical` pair lines. */
  private def readManifestFile(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Map[Long, Long] = {
    val in = fs.open(p)
    val body = try {
      val buf = new java.io.ByteArrayOutputStream()
      val arr = new Array[Byte](8192)
      var n = in.read(arr)
      while (n >= 0) { buf.write(arr, 0, n); n = in.read(arr) }
      buf.toString("UTF-8")
    } finally in.close()
    body.linesIterator.map(_.trim).filter(_.nonEmpty).flatMap { l =>
      l.split("\\s+") match {
        case Array(lg, ph) =>
          for (a <- lg.toLongOption; b <- ph.toLongOption) yield a -> b
        case _ => None
      }
    }.toMap
  }

  /** Publish manifest `version`: write the full pair list to a temp file,
    * then atomically rename into place — readers see the old complete
    * manifest or the new complete one, never a partial list. A rename
    * collision means a second writer raced this publish to the same
    * version: fail loudly — the loser's delivery stays invisible (the
    * crashed-before-finish state) and [[commitWithRetry]] is the recovery
    * recipe. The temp name is WRITER-UNIQUE (uuid), not version-keyed:
    * with a shared `.manifest-v.tmp` two racers corrupt each other's
    * staging (winner renames the file out from under the loser's write)
    * and surface as raw IO errors instead of the designed collision —
    * found by the LayoutSpec contention gate.
    *
    * ATOMICITY SCOPE: collision detection rides on rename-refuses-
    * existing-destination. HDFS guarantees that atomically server-side,
    * so cross-process writers are safe there. Local/checksum filesystems
    * implement rename as check-THEN-rename(2) — two publishers racing the
    * same version inside the check window would BOTH "succeed" with the
    * second silently clobbering the first (a lost manifest entry; the
    * LayoutSpec six-writer gate reproduced it reliably). Two serializers
    * close the window: in-process publishers take a per-root JVM lock
    * (cheap, covers tests and local[n] ingest), and the check+rename
    * itself runs under the cross-process PUBLISH LEASE
    * ([[acquirePublishLease]] — O_CREAT|O_EXCL, the one rename-adjacent
    * primitive local filesystems make atomic), so two separate DRIVER
    * processes on one local/NFS root are in contract too: the loser gets
    * the designed [[ManifestPublishConflict]] and recovers via
    * [[commitWithRetry]]. This goes one step past the Delta HDFSLogStore
    * position, which leaves bare-local multi-process out of contract. */
  private val publishLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** CROSS-PROCESS publish lease: the JVM lock serializes in-process
    * publishers, but two separate DRIVER processes on one local/NFS root
    * share nothing — their check-then-rename windows can interleave and
    * the second silently clobbers the first's manifest. The lease file
    * (`_commits/.publish_lease`) closes that window with the one
    * primitive local filesystems DO make atomic: O_CREAT|O_EXCL
    * (`java.io.File.createNewFile`; HDFS-like filesystems get
    * `create(overwrite=false)`, atomic server-side). Acquire → rename →
    * release; a holder that died mid-publish is broken after
    * [[PublishLeaseTtlMs]] (a publish is a rename — milliseconds — so
    * the TTL is 4 orders of magnitude of headroom); contention waits
    * briefly for the ms-scale hold, then surfaces the designed
    * [[ManifestPublishConflict]] for [[commitWithRetry]] to absorb. The
    * lease carries its writer's uuid, and release deletes only a lease
    * that still carries it — a writer that somehow outlived its TTL
    * cannot delete the lease a breaker re-acquired. */
  private val PublishLeaseTtlMs: Long = 60000L

  private[ops] def tryCreateExclusive(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, token: String): Boolean = fs match {
    case _: org.apache.hadoop.fs.LocalFileSystem |
         _: org.apache.hadoop.fs.RawLocalFileSystem =>
      // ChecksumFileSystem.create(overwrite=false) is exists-then-create —
      // NOT atomic; O_CREAT|O_EXCL via createNewFile is
      val f = new java.io.File(p.toUri.getPath)
      f.getParentFile.mkdirs()
      if (!f.createNewFile()) false
      else {
        val w = new java.io.FileOutputStream(f)
        try w.write(token.getBytes("UTF-8")) finally w.close()
        true
      }
    case _ =>
      try {
        val out = fs.create(p, false)
        try out.write(token.getBytes("UTF-8")) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
  }

  private def acquirePublishLease(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): (org.apache.hadoop.fs.Path, String) = {
    val lease = new org.apache.hadoop.fs.Path(dir, ".publish_lease")
    val token = java.util.UUID.randomUUID().toString
    val deadline = System.currentTimeMillis() + 2000L
    while (System.currentTimeMillis() < deadline) {
      if (tryCreateExclusive(fs, lease, token)) return (lease, token)
      val observed = try {
        Some(fs.getFileStatus(lease).getModificationTime)
      } catch { case _: java.io.FileNotFoundException => None /* released */ }
      observed match {
        case Some(m)
            if System.currentTimeMillis() - m > PublishLeaseTtlMs =>
          breakStaleLease(fs, lease, m); () // dead holder: break, then re-race
        case Some(_) => Thread.sleep(20L) // healthy holder: a publish is ms-long
        case None => () // released between create attempt and stat: re-race now
      }
    }
    throw new ManifestPublishConflict(
      s"publish lease on $dir held past the wait window — a concurrent " +
        "writer is publishing; retry against the advanced manifest " +
        "(Layout.commitWithRetry)")
  }

  /** Break a dead holder's lease WITHOUT the double-breaker race: with a
    * bare `fs.delete`, breaker A can stat a stale lease, breaker B break
    * it and RE-ACQUIRE, and A's unconditional delete then removes B's
    * fresh lease — two holders, the exact clobber window the lease closes.
    * Here the break is (1) guarded by an mtime re-check against what the
    * staleness scan observed, (2) executed as a RENAME to a breaker-unique
    * tombstone — of N concurrent breakers exactly one rename wins (the
    * source vanishes for the rest), and (3) identity-verified after the
    * rename (the delete-if-mine discipline [[releasePublishLease]]
    * follows): a tombstone whose mtime is not the observed stale lease's
    * means a break+re-acquire slipped inside the stat→rename window, and
    * the fresh lease is renamed straight back. Returns true iff THIS
    * caller retired the stale lease. */
  private[ops] def breakStaleLease(fs: org.apache.hadoop.fs.FileSystem,
      lease: org.apache.hadoop.fs.Path, observedMtime: Long): Boolean = {
    val cur = try fs.getFileStatus(lease).getModificationTime
      catch { case _: java.io.FileNotFoundException => return false }
    if (cur != observedMtime) return false // already broken + re-acquired
    val tomb = new org.apache.hadoop.fs.Path(lease.getParent,
      s"${lease.getName}.broken.${java.util.UUID.randomUUID()}")
    val renamed = try fs.rename(lease, tomb)
      catch { case _: java.io.IOException => false }
    if (!renamed) return false // another breaker won this race
    val tombM = try Some(fs.getFileStatus(tomb).getModificationTime)
      catch { case _: java.io.FileNotFoundException => None }
    if (tombM.contains(observedMtime)) { fs.delete(tomb, false); true }
    else {
      // stole a FRESH lease (break+re-acquire inside the stat→rename
      // window): restore it. If a new lease appeared at the path in the
      // meantime the restore fails — retire the tombstone then (the
      // displaced holder's verified release is already a no-op: the token
      // at the path is not its own), rather than leaving a stray lease
      // file the TTL scan would misread.
      if (!fs.rename(tomb, lease)) { fs.delete(tomb, false); () }
      false
    }
  }

  private def releasePublishLease(fs: org.apache.hadoop.fs.FileSystem,
      lease: org.apache.hadoop.fs.Path, token: String): Unit =
    try {
      val in = fs.open(lease)
      val held = try {
        // read to EOF: a single read() may legally return fewer bytes than
        // the 36-byte uuid (HDFS-like streams), which would make held !=
        // token, leave the lease behind, and stall every publisher on
        // conflict retries until the TTL break
        val buf = new java.io.ByteArrayOutputStream()
        val arr = new Array[Byte](64)
        var n = in.read(arr)
        while (n >= 0) { buf.write(arr, 0, n); n = in.read(arr) }
        buf.toString("UTF-8")
      } finally in.close()
      if (held == token) { fs.delete(lease, false); () }
    } catch { case _: java.io.IOException => () /* already broken+replaced */ }

  private[ops] def publishManifest(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path, version: Long,
      m: Map[Long, Long]): Unit = {
    fs.mkdirs(dir)
    val tmp = new org.apache.hadoop.fs.Path(dir,
      s".manifest-$version.${java.util.UUID.randomUUID()}.tmp")
    val out = fs.create(tmp, true)
    try out.write(
      m.toSeq.sorted.map { case (l, p) => s"$l $p\n" }.mkString.getBytes("UTF-8"))
    finally out.close()
    val dst = new org.apache.hadoop.fs.Path(dir, f"manifest-$version%020d")
    val lock = publishLocks.computeIfAbsent(dir.toString, _ => new Object)
    // test seam: with the JVM lock disabled, the lease is the ONLY
    // serializer — exactly a second driver process's view of this root
    def critical[T](f: => T): T =
      if (sys.props.get("graft.layout.disableJvmPublishLock")
          .contains("true")) f
      else lock.synchronized(f)
    val renamed = critical {
      val (lease, token) = acquirePublishLease(fs, dir)
      try fs.rename(tmp, dst)
      finally releasePublishLease(fs, lease, token)
    }
    if (!renamed) {
      fs.delete(tmp, false)
      throw new ManifestPublishConflict(
        s"concurrent manifest publish on $dir at version $version — " +
          "a racing writer won this version; retry against the advanced " +
          "manifest (Layout.commitWithRetry)")
    }
  }

  /** Arm the protocol on a root: ensure `_commits` exists and a manifest
    * is published. First contact with a pre-manifest root BACKFILLS its
    * existing batches — old-style marker files if present, else one
    * bounded directory walk for live `batch_id=` partitions (they were
    * readable unfiltered until this moment; an empty manifest would hide
    * them from every read and drop them from compaction folds). Multiple
    * physical deliveries of one logical batch resolve max-physical-wins. */
  def initCommitLog(spark: SparkSession, base: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(base)
    val dir = commitsDir(base)
    val fs = fsOf(spark, dir)
    fs.mkdirs(dir)
    if (currentManifest(fs, dir).isEmpty) {
      val markers = fs.listStatus(dir).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("batch_"))
        .flatMap(_.stripPrefix("batch_").toLongOption)
      val physicals =
        if (markers.nonEmpty) markers.toSet
        else collectBatchIds(fs, root, depth = 4).filter(_ >= 0)
      val m = physicals.groupBy(logicalBatchLocal)
        .map { case (l, ps) => l -> ps.max }
      publishManifest(fs, dir, version = 1L, m)
    }
  }

  /** Every `batch_id=N` partition value found under `p` (any table, up to
    * `depth` directory levels — batch_id nests under term_bucket= /
    * cell= / (band=, vb=) in the serving layouts). */
  private def collectBatchIds(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, depth: Int): Set[Long] =
    collectBatchDirs(fs, p, depth).map(_._1).toSet

  /** Retire a root's commit log — the one-shot index builders' move: a
    * full rewrite replaces the table data AND any geometry sidecars
    * (bucket counts, centroids, codebooks), so every previously published
    * manifest version describes files that no longer exist, possibly
    * under a DIFFERENT geometry. Keeping those manifests would let an
    * as_of read resolve a retired snapshot and silently decode it with
    * the new geometry (wrong candidates) or serve empty rows; deleting
    * the log makes history restart at the rewrite — old versions refuse,
    * exactly like vacuumed ones. */
  def resetCommitLog(spark: SparkSession, base: String): Unit = {
    val dir = commitsDir(base)
    val fs = fsOf(spark, dir)
    if (fs.exists(dir)) { fs.delete(dir, true); () }
    // the stream-ownership marker is state of the REPLACED index too: a
    // rebuilt (or compacted-into) root must accept a new ingest stream,
    // not refuse it on behalf of the dead stream that fed the old data
    val marker = new org.apache.hadoop.fs.Path(s"$base/_stream_marker")
    if (fs.exists(marker)) { fs.delete(marker, false); () }
  }

  /** Start a delivery of logical batch `batchId`: allocate and return the
    * PHYSICAL partition id the caller must write every table's partitions
    * under. Side-effect-free on visibility — the previous delivery (if
    * any) keeps serving until [[finishBatchCommit]] swaps the manifest.
    * Gen allocation counts from the last FINISHED delivery, so a crashed
    * attempt's never-published gen is reused and self-heals via the
    * dynamic-overwrite rewrite. */
  def beginBatchCommit(spark: SparkSession, base: String,
      batchId: Long): Long = {
    require(batchId >= -1 && batchId < GenStride - 1,
      s"logical batch id out of range [-1, ${GenStride - 1}): $batchId")
    initCommitLog(spark, base)
    val dir = commitsDir(base)
    val m = currentManifest(fsOf(spark, dir), dir).map(_._2)
      .getOrElse(Map.empty[Long, Long])
    if (batchId == -1L) {
      // BASE REWRITE (row-level delete): the base's rewrite chain lives
      // under negative physicals -(2+gen) so it can never collide with an
      // appended batch's stride-encoded ids or a legacy raw id; once the
      // manifest maps logical -1, committedBatchFilter serves the mapped
      // physical INSTEAD of the raw batch_id=-1 directories
      val gen = m.get(-1L) match {
        case Some(p) if p < -1L => deliveryRank(p) + 1
        case _ => 0L // base never rewritten
      }
      -2L - gen
    } else {
      val gen = m.get(batchId) match {
        case Some(p) if p >= GenStride => p % GenStride + 1
        case _ => 0L // never delivered, or a legacy raw-id delivery
      }
      require(gen < GenStride, s"gen counter exhausted for batch $batchId")
      (batchId + 1) * GenStride + gen
    }
  }

  /** Claim a delivery and clear any CRASHED attempt's leftovers under the
    * same physical id — the pre-write step every manifest-protocol append
    * runs between [[beginBatchCommit]] and its table writes. Dynamic
    * partition overwrite alone only rewrites partitions the new frame has
    * rows for, so a recovery delivery smaller than the crashed attempt
    * (the limiting case: an empty one) would otherwise COMMIT the torn
    * partials at [[finishBatchCommit]].
    *
    * Priced for the NO-crash case, which is every healthy append: a
    * `pending_<phys>` intent marker in `_commits` records an in-flight
    * attempt ([[finishBatchCommit]] retires it), so the directory walk
    * that hunts `batch_id=<phys>` dirs (every table, nested to the vacuum
    * walk's depth — hundreds of listStatus calls on a bucketed root, real
    * money per micro-batch on an object store) runs ONLY when a previous
    * attempt's marker proves a crash actually happened. */
  def clearPhysicalDelivery(spark: SparkSession, base: String,
      phys: Long): Unit = {
    val dir = commitsDir(base)
    val fs = fsOf(spark, dir)
    fs.mkdirs(dir)
    val marker = new org.apache.hadoop.fs.Path(dir, s"pending_$phys")
    if (fs.exists(marker)) {
      // crash evidence: a prior attempt claimed this phys and never
      // finished — its partials (if any got written) must go
      val root = new org.apache.hadoop.fs.Path(base)
      collectBatchDirs(fs, root, depth = 4)
        .filter(_._1 == phys)
        .foreach { case (_, p) => fs.delete(p, true) }
    } else {
      fs.create(marker, true).close()
    }
  }

  /** Commit a delivery: every table's partitions for `physicalId` (the
    * value [[beginBatchCommit]] returned) are fully written; publish the
    * next manifest version mapping the logical batch to this physical —
    * ONE atomic rename makes the whole multi-table delivery visible and
    * the previous delivery's directories garbage ([[vacuumLayout]]). */
  def finishBatchCommit(spark: SparkSession, base: String,
      physicalId: Long): Unit = {
    initCommitLog(spark, base)
    val dir = commitsDir(base)
    val fs = fsOf(spark, dir)
    val (v, m) = currentManifest(fs, dir).get
    publishManifest(fs, dir, v + 1,
      m + (logicalBatchLocal(physicalId) -> physicalId))
    // retire the delivery's pending marker ([[clearPhysicalDelivery]]):
    // the attempt finished, so no future replay needs the crash walk
    fs.delete(new org.apache.hadoop.fs.Path(dir, s"pending_$physicalId"),
      false)
    ()
  }

  /** Commit SEVERAL deliveries in ONE manifest version — the row-level
    * delete's swap: a takedown that rewrites N affected deliveries (the
    * batches whose partitions held the victim rows, possibly including
    * the base) must become visible atomically, or a read planned between
    * two single-batch swaps would serve a half-deleted corpus. Same
    * protocol as [[finishBatchCommit]]; the map update just carries N
    * remaps instead of one.
    *
    * `expectedVersion` is the takedown's OPTIMISTIC CONCURRENCY pin: the
    * manifest version the victim-discovery scans resolved. A swap against
    * any other version refuses ([[TakedownConcurrencyConflict]]) — an
    * append that committed between discovery and swap may have delivered
    * victim-bearing rows the rewrite never scanned, and publishing over
    * it would merge them in cleanly with nothing left to detect the leak.
    * The check composes with the publish collision: the swap publishes
    * exactly expected+1, so a racer that publishes first surfaces as the
    * designed [[ManifestPublishConflict]] even inside the read→rename
    * window. Either way recovery is [[takedownWithRetry]]'s re-discovery,
    * and the already-written rewrite deliveries stay invisible (the
    * crashed-before-finish state the protocol defines as clean). */
  def finishMultiBatchCommit(spark: SparkSession, base: String,
      physicalIds: Seq[Long], expectedVersion: Option[Long] = None): Unit = {
    require(physicalIds.nonEmpty, "nothing to commit")
    initCommitLog(spark, base)
    val dir = commitsDir(base)
    val fs = fsOf(spark, dir)
    val (v, m) = currentManifest(fs, dir).get
    expectedVersion.filter(_ != v).foreach { ev =>
      throw new TakedownConcurrencyConflict(
        s"manifest on $base advanced from version $ev to $v between " +
          "victim discovery and the takedown swap — a concurrent writer " +
          "committed rows the rewrite never scanned; re-run discovery " +
          "against the advanced manifest (Layout.takedownWithRetry)")
    }
    publishManifest(fs, dir, v + 1,
      m ++ physicalIds.map(p => logicalBatchLocal(p) -> p))
    physicalIds.foreach { p =>
      fs.delete(new org.apache.hadoop.fs.Path(dir, s"pending_$p"), false)
    }
  }

  /** Run a takedown's discovery + rewrite with the optimistic concurrency
    * loop: `body` receives the manifest version the root currently serves
    * (to pass to [[takedownRewrite]] as its `expectedVersion`) and must
    * re-derive EVERYTHING — victim scans, affected deliveries, registry
    * rows — from that snapshot, so a retry sees whatever the racing
    * writer committed. CONTRACT (spec-pinned): an append racing a
    * takedown either commits before the swap (the takedown refuses, this
    * loop re-discovers over the appended rows, and the retried rewrite
    * scrubs them too) or commits after (it probed the post-delete,
    * registry-armed index). No interleaving lets a victim-bearing row
    * survive unscanned — the quiesce requirement the r18 contract had to
    * state is now enforced, not assumed. A failed attempt's deliveries
    * self-heal through the pending markers exactly like any crashed
    * delivery. */
  def takedownWithRetry[T](spark: SparkSession, base: String,
      maxAttempts: Int = 5)(body: Option[Long] => T): T = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    var n = 0
    var out: Option[T] = None
    while (out.isEmpty) {
      // observe BEFORE body resolves its visibility predicate: a commit
      // landing between the two makes the pin conservative (refuse+retry),
      // never permissive
      val observed = manifestVersions(spark, base).lastOption
      try out = Some(body(observed))
      catch {
        case e: TakedownConcurrencyConflict =>
          n += 1; if (n >= maxAttempts) throw e
        case e: ManifestPublishConflict =>
          n += 1; if (n >= maxAttempts) throw e
      }
    }
    out.get
  }

  /** One full delivery of `batchId` with PUBLISH-RETRY — the multi-writer
    * recipe for the manifest protocol. The protocol's only cross-writer
    * contention point is the manifest rename ([[publishManifest]]): data
    * writes land under per-(logical-batch, gen) physical partitions that
    * cannot collide across DIFFERENT logical batches, so when two writers
    * race, the loser's delivery is fully written and invisible — exactly
    * the crashed-before-finish state, which the protocol already defines
    * as clean. Losing therefore needs only the PUBLISH re-attempted
    * against the advanced manifest (finishBatchCommit re-reads the
    * current version on every call); the data is never rewritten.
    * [[beginBatchCommit]] is wrapped in the same retry for the one race
    * it can hit (two writers' first contact with a pre-manifest root both
    * publishing version 1).
    *
    * CONTRACT (spec-pinned in LayoutSpec): concurrent writers on
    * DIFFERENT logical batches converge — every batch commits exactly
    * once, no torn partition ever becomes visible. Concurrent writers on
    * the SAME logical batch remain forbidden (one writer per logical
    * batch): they share a physical id, and the second's
    * [[clearPhysicalDelivery]] would read the first's pending marker as
    * crash evidence and delete its in-flight files — indistinguishable
    * from the crash recovery that marker exists to enable. Serialize
    * same-batch delivery at the scheduler (streaming's epoch ownership
    * does this for free). */
  def commitWithRetry(spark: SparkSession, base: String, batchId: Long,
      maxAttempts: Int = 5)(write: Long => Unit): Long = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    def retrying[T](f: => T): T = {
      var n = 0
      var out: Option[T] = None
      while (out.isEmpty) {
        // ONLY the designed publish collision retries; any other failure
        // (including unrelated IllegalStateExceptions) surfaces at once
        try out = Some(f)
        catch {
          case e: ManifestPublishConflict =>
            n += 1
            if (n >= maxAttempts) throw e
        }
      }
      out.get
    }
    val phys = retrying(beginBatchCommit(spark, base, batchId))
    clearPhysicalDelivery(spark, base, phys)
    write(phys)
    retrying(finishBatchCommit(spark, base, phys))
    phys
  }

  /** The read-side visibility predicate on `batch_id` — resolved from the
    * current manifest at plan time, so each request sees one published
    * snapshot. `lit(true)` for pre-protocol layouts (no `_commits`);
    * old-style marker files serve as the visible set on roots no manifest
    * has touched yet. */
  def committedBatchFilter(spark: SparkSession, base: String)
      : org.apache.spark.sql.Column =
    committedBatchFilterAt(spark, base, version = None)

  /** [[committedBatchFilter]] AS OF a manifest version — TIME TRAVEL over
    * the serving layout: every published manifest is an immutable snapshot
    * and superseded data files survive until [[vacuumLayout]], so a read
    * filtered at version V reproduces exactly what V served — the audit /
    * reproduce-a-past-answer read (`VERSION AS OF` in Delta terms).
    * Versions are listed by [[manifestVersions]]; asking for a version
    * never published throws (an audit read must not silently fall back to
    * a different snapshot). Vacuum is the retention horizon: a vacuumed
    * version's manifest is retired WITH its superseded files, so reading
    * it throws exactly like an unpublished version — it can never be
    * silently served partial/empty. */
  def committedBatchFilterAt(spark: SparkSession, base: String,
      version: Option[Long]): org.apache.spark.sql.Column = {
    val dir = commitsDir(base)
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) {
      require(version.isEmpty,
        s"$base has no commit log — no manifest versions to read AS OF")
      lit(true)
    } else {
      val entries: Map[Long, Long] = version match {
        case Some(v) =>
          val ms = listManifests(fs, dir).toMap
          val p = ms.getOrElse(v, throw new IllegalArgumentException(
            s"no manifest version $v under $dir " +
              s"(published: ${ms.keys.toSeq.sorted.mkString(", ")})"))
          // a vacuum can retire the file between the listing and this
          // read — surface the same clean refusal as a never-published
          // version, not a raw FileNotFoundException mid-plan
          try readManifestFile(fs, p) catch {
            case _: java.io.FileNotFoundException =>
              throw new IllegalArgumentException(
                s"no manifest version $v under $dir — retired by a " +
                  "concurrent vacuum between listing and read")
          }
        case None =>
          currentManifest(fs, dir) match {
            case Some((_, m)) => m
            case None =>
              // toLongOption: a stray non-numeric file in _commits (editor
              // temp, _SUCCESS, half-written name) must not throw at plan
              // time and take down every serving read of the root
              fs.listStatus(dir).toSeq.map(_.getPath.getName)
                .filter(_.startsWith("batch_"))
                .flatMap(_.stripPrefix("batch_").toLongOption)
                .map(p => p -> p).toMap
          }
      }
      val ids = entries.values.toSeq
      // once the manifest maps logical -1 (a base REWRITE — row-level
      // delete), the mapped physical IS the base: the raw batch_id=-1
      // directories are the superseded pre-delete base and must not serve
      if (entries.contains(-1L))
        col("batch_id").isin(ids: _*)
      else if (ids.isEmpty) col("batch_id") === -1L
      else col("batch_id") === -1L || col("batch_id").isin(ids: _*)
    }
  }

  /** Published manifest versions of a root, ascending — the time-travel
    * catalog ([[committedBatchFilterAt]]). */
  def manifestVersions(spark: SparkSession, base: String): Seq[Long] = {
    val dir = commitsDir(base)
    listManifests(fsOf(spark, dir), dir).map(_._1).sorted
  }

  /** One published manifest version's (logical batch → physical delivery)
    * entries — the catalog row set `DIFF LAYOUT` compares. Unknown
    * versions refuse ([[committedBatchFilterAt]]'s contract: an audit
    * read must not silently substitute a different snapshot). */
  def manifestEntriesAt(spark: SparkSession, base: String, version: Long)
      : Map[Long, Long] = {
    val dir = commitsDir(base)
    val fs = fsOf(spark, dir)
    require(fs.exists(dir), s"$base has no commit log — nothing to diff")
    val ms = listManifests(fs, dir).toMap
    val p = ms.getOrElse(version, throw new IllegalArgumentException(
      s"no manifest version $version under $dir " +
        s"(published: ${ms.keys.toSeq.sorted.mkString(", ")})"))
    try readManifestFile(fs, p) catch {
      // same vacuum race as committedBatchFilterAt: refuse cleanly
      case _: java.io.FileNotFoundException =>
        throw new IllegalArgumentException(
          s"no manifest version $version under $dir — retired by a " +
            "concurrent vacuum between listing and read")
    }
  }

  /** Manifest set difference between two published versions — one row per
    * logical batch (logical, change, physical_from, physical_to), sorted
    * by logical batch; shared by `DIFF LAYOUT` and `GET /diff`. Priced at
    * manifest size: two small files read, no table data opened. */
  def diffManifests(spark: SparkSession, base: String, v1: Long, v2: Long)
      : Seq[(Long, String, Option[Long], Option[Long])] = {
    val from = manifestEntriesAt(spark, base, v1)
    val to = manifestEntriesAt(spark, base, v2)
    val rows =
      (to.keySet -- from.keySet).toSeq.map(l =>
        (l, "added", None: Option[Long], Some(to(l)))) ++
      (from.keySet -- to.keySet).toSeq.map(l =>
        (l, "removed", Some(from(l)), None: Option[Long])) ++
      (from.keySet & to.keySet).toSeq
        .filter(l => from(l) != to(l))
        .map(l => (l, "rewritten", Some(from(l)), Some(to(l))))
    rows.sortBy(_._1)
  }

  /** Garbage-collect SUPERSEDED deliveries: delete `batch_id=<p>`
    * directories whose logical batch maps to a HIGHER physical in the
    * current manifest — i.e. deliveries a later finish replaced. Never
    * touches the base, visible physicals, or ids above the visible gen
    * (a begun-but-unfinished delivery in flight).
    *
    * `keepVersions` is the RETENTION HORIZON (the Delta `RETAIN`
    * precedent, counted in manifest versions rather than hours —
    * deterministic, so testable): every physical referenced by any of the
    * newest `keepVersions` manifests survives, so time travel
    * ([[committedBatchFilterAt]]) keeps reproducing those versions
    * exactly; only files ALL kept versions have superseded are deleted.
    * The default 1 keeps only the current snapshot's files — the original
    * all-or-nothing behavior, now a policy choice instead of the only
    * option.
    *
    * `minAgeMs` is the GRACE WINDOW against the long-running-reader race:
    * a reader that planned against version v before a superseding swap is
    * still collecting from v's files, and a vacuum that reclaims them
    * mid-collect fails the read. Version horizons can't see that reader;
    * age can bound it — and the age that bounds it is TIME SINCE
    * SUPERSESSION, not time since the delivery was written: a delivery
    * written days ago and superseded a minute ago may still be serving a
    * reader that planned seconds before the swap (the Delta RETAIN
    * precedent ages remove-action timestamps, not file creation times).
    * Supersession time is recovered from the manifests themselves: the
    * oldest surviving manifest that no longer serves the delivery was
    * published at (or after) the swap that superseded it, so its mtime
    * upper-bounds reader staleness; if every manifest that ever served
    * the delivery is already retired, the oldest surviving manifest's
    * mtime stands in (the swap predates it — conservative, and a fixed
    * timestamp, so the delivery still ages out of the window). With
    * `minAgeMs = h`, any reader that planned within the last `h` keeps
    * its files (set it above the longest query you run; the
    * version-counted horizon stays the deterministic, testable primary
    * policy). Grace DEFERS, never breaks, the refusal invariant: a
    * manifest file survives iff every physical it references survives —
    * out-of-horizon manifests referencing an age-spared delivery stay
    * readable (their vacuum completes on the next run past the window),
    * and a physical referenced by any surviving manifest is never
    * deleted, so an as-of read either reproduces its full snapshot or
    * refuses; it never silently serves partial rows. A manifest with no
    * logical `-1` entry implicitly serves the raw `batch_id=-1` base, so
    * a base superseded by a REWRITE (row-level delete) is reclaimable
    * only once every manifest that implicitly served it retires.
    * Returns the number of directories deleted. */
  def vacuumLayout(spark: SparkSession, base: String,
      keepVersions: Int = 1, minAgeMs: Long = 0L): Long = {
    require(keepVersions >= 1,
      s"KEEP must retain at least the current version, got $keepVersions")
    require(minAgeMs >= 0L, s"minAgeMs must be >= 0, got $minAgeMs")
    val dir = commitsDir(base)
    val fs = fsOf(spark, dir)
    currentManifest(fs, dir) match {
      case None => 0L
      case Some((_, m)) =>
        // one read per manifest, shared by every step below:
        // (version, path, entries, mtime), ascending by version
        val manifests = listManifests(fs, dir).sortBy(_._1).map {
          case (v, p) =>
            (v, p, readManifestFile(fs, p),
              fs.getFileStatus(p).getModificationTime)
        }
        // the physicals a manifest SERVES: its entries, plus the raw base
        // unless a base rewrite has remapped logical -1
        def served(mm: Map[Long, Long]): Set[Long] =
          mm.values.toSet + mm.getOrElse(-1L, -1L)
        val keptManifests = manifests.sortBy(-_._1).take(keepVersions)
        val keptPhysicals: Set[Long] =
          keptManifests.flatMap(t => served(t._3)).toSet
        // reclaim candidates: superseded (the current manifest maps their
        // logical batch to a NEWER delivery — deliveryRank, so the base's
        // negative rewrite chain orders correctly) and outside the keep
        // horizon
        val candidates = collectBatchDirs(fs,
            new org.apache.hadoop.fs.Path(base), depth = 4)
          .filter { case (id, _) =>
            val l = logicalBatchLocal(id)
            val cur = if (l == -1L) Some(m.getOrElse(-1L, -1L)) else m.get(l)
            cur.exists(c => deliveryRank(c) > deliveryRank(id)) &&
              !keptPhysicals.contains(id)
          }
        // supersession time of a candidate: mtime of the oldest surviving
        // manifest published at-or-after the swap that superseded it
        def supersededAt(id: Long): Long = {
          val l = logicalBatchLocal(id)
          def servesId(mm: Map[Long, Long]): Boolean =
            (if (l == -1L) Some(mm.getOrElse(-1L, -1L)) else mm.get(l))
              .contains(id)
          manifests.find(t => servesId(t._3)) match {
            case Some((v0, _, _, _)) =>
              manifests.find(t => t._1 > v0 && !servesId(t._3))
                // candidates are not served by the CURRENT manifest, so a
                // superseding version always exists; the fallback only
                // defends a concurrent publish racing this walk
                .map(_._4).getOrElse(System.currentTimeMillis())
            case None =>
              // every manifest that served it is already retired: the
              // swap predates the oldest surviving manifest
              manifests.head._4
          }
        }
        val now = System.currentTimeMillis()
        val sparedIds: Set[Long] =
          if (minAgeMs <= 0L) Set.empty
          else candidates.filter { case (id, _) =>
            now - supersededAt(id) < minAgeMs
          }.map(_._1).toSet
        // Retire the manifests OUTSIDE the keep horizon whose snapshots
        // this run breaks (with no grace: all of them — the original
        // behavior): a version whose superseded files are gone must
        // REFUSE time-travel reads (committedBatchFilterAt throws "no
        // manifest version") and drop out of manifestVersions /
        // GET /versions — otherwise an as_of read of a vacuumed snapshot
        // silently serves partial/empty rows, indistinguishable from a
        // genuinely empty version. Manifests referencing an age-spared
        // delivery survive INTACT (their physicals are excluded from
        // deletion below). Retirement runs BEFORE file deletion so a
        // crash between the two leaves conservative refusals, never a
        // serving manifest over missing files.
        val (retiring, surviving) = manifests.sortBy(-_._1)
          .splitAt(keepVersions) match {
            case (kept, rest) =>
              val (r, s) = rest.partition { case (_, _, mm, _) =>
                !served(mm).exists(sparedIds.contains)
              }
              (r, kept ++ s)
          }
        retiring.foreach { case (_, p, _, _) => fs.delete(p, false) }
        val referenced: Set[Long] =
          surviving.flatMap(t => served(t._3)).toSet
        val doomed = candidates.filter { case (id, _) =>
          !sparedIds.contains(id) && !referenced.contains(id)
        }
        doomed.foreach { case (_, p) => fs.delete(p, true) }
        doomed.size.toLong
    }
  }

  // ------------------------------------------------------ row-level delete

  /** One takedown's outcome — the `DELETE FROM LAYOUT` result row. */
  final case class TakedownReport(kind: String, nMatchedRows: Long,
      nRewrittenDeliveries: Long, nReclaimedDirs: Long)

  /** Rows of ONE delivery of a batch-partitioned table — the rewrite
    * read for row-level delete. Reads the delivery's `batch_id=<phys>`
    * directories DIRECTLY (with `basePath` so partition columns still
    * surface), for two load-bearing reasons: nothing outside the
    * delivery is listed or scanned, and the relation's root paths are
    * the partition directories rather than the table root — so the
    * rewrite can write the SAME table (a different partition) without
    * tripping Spark's same-path overwrite guard or checkpointing a
    * delivery-sized frame. `nest` is the partition-glob prefix above
    * `batch_id` (term_bucket=*, cell=*, band=* / vb=* nested, or
    * empty). None when the delivery wrote no partition in this table
    * (an empty frame under dynamic overwrite creates no directory).
    */
  def readDeliveryRows(spark: SparkSession, tablePath: String,
      nest: String, phys: Long): Option[DataFrame] = {
    val glob =
      if (nest.isEmpty) s"$tablePath/batch_id=$phys"
      else s"$tablePath/$nest/batch_id=$phys"
    val fs = fsOf(spark, new org.apache.hadoop.fs.Path(tablePath))
    val hits = fs.globStatus(new org.apache.hadoop.fs.Path(glob))
    if (hits == null || hits.isEmpty) None
    else Some(spark.read.option("basePath", tablePath).parquet(glob))
  }

  /** The takedown swap: rewrite the AFFECTED deliveries (the batches
    * whose partitions hold victim rows — possibly including the base,
    * which rewrites under the negative physical chain) and make the
    * whole multi-batch result visible in ONE manifest version, then run
    * the MANDATORY vacuum that makes the delete physical: `keepVersions
    * = 1`, no grace — a legal takedown must actually destroy the bytes,
    * so every pre-delete manifest retires (as-of reads of pre-delete
    * versions refuse, the vacuumed-version contract) and every
    * superseded delivery's files are reclaimed before this returns.
    * Crash-safe like any delivery: a crash before the swap leaves the
    * old manifest serving the old (still-un-deleted) data and the retry
    * self-heals through the pending markers; a crash between swap and
    * vacuum leaves the delete VISIBLE and the next vacuum finishes the
    * physical reclaim. Cost is proportional to the affected deliveries'
    * size, not the corpus: an appended batch's takedown rewrites that
    * batch only — the base rewrite is the expensive case, and still
    * cheaper than an index rebuild (no text re-tokenized, no signatures
    * or codes recomputed). CONTRACT BOUNDARY: the victims must be a
    * strict subset of the indexed corpus — a takedown that empties the
    * layout entirely is the root's RETIREMENT ([[resetCommitLog]] +
    * remove), not a rewrite; an all-empty parquet table cannot serve a
    * read (no schema to infer), and "delete everything" deserves the
    * louder operation anyway. Returns the number of directories the
    * vacuum reclaimed. */
  def takedownRewrite(spark: SparkSession, base: String,
      oldPhysicals: Seq[Long], extraDeliveries: Seq[Long] = Nil,
      expectedVersion: Option[Long] = None)
      (rewriteOne: (Long, Long) => Unit): Long = {
    val remaps = oldPhysicals.map { oldPhys =>
      val phys = beginBatchCommit(spark, base, logicalBatchLocal(oldPhys))
      clearPhysicalDelivery(spark, base, phys)
      rewriteOne(oldPhys, phys)
      phys
    }
    // extraDeliveries: physicals the CALLER already began and wrote (the
    // takedown REGISTRY delivery) — included in the same one-version swap
    // so the delete and its standing re-admission block publish together.
    // expectedVersion: the optimistic pin from takedownWithRetry — refuse
    // the swap if anything committed since discovery.
    finishMultiBatchCommit(spark, base, remaps ++ extraDeliveries,
      expectedVersion)
    vacuumLayout(spark, base, keepVersions = 1, minAgeMs = 0L)
  }

  /** Every `batch_id=N` partition directory found under `p` (any table,
    * up to `depth` levels), with its parsed id. NESTED layout roots are
    * foreign territory: a subdirectory carrying its OWN `_commits` (a
    * retrievalIndex-shaped root nests `ann/` under the lexical root) has
    * deliveries that answer to ITS manifest — this walk skips the whole
    * subtree, or the outer root's vacuum would read the inner root's
    * partitions against the WRONG manifest and reclaim live data (the
    * limiting case: an outer base rewrite maps logical −1, which makes
    * every nested base's raw `batch_id=-1` look superseded). */
  private def collectBatchDirs(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, depth: Int)
      : Seq[(Long, org.apache.hadoop.fs.Path)] =
    if (depth < 0 || !fs.exists(p)) Nil
    else collectFromListing(fs,
      fs.listStatus(p).toSeq.filter(_.isDirectory), depth)

  private def collectFromListing(fs: org.apache.hadoop.fs.FileSystem,
      dirs: Seq[org.apache.hadoop.fs.FileStatus], depth: Int)
      : Seq[(Long, org.apache.hadoop.fs.Path)] =
    dirs.flatMap { st =>
      val n = st.getPath.getName
      if (n == "_commits") Nil
      else if (n.startsWith("batch_id="))
        n.stripPrefix("batch_id=").toLongOption.map(_ -> st.getPath).toSeq
      else if (depth <= 0) Nil
      else {
        val sub = fs.listStatus(st.getPath).toSeq.filter(_.isDirectory)
        if (sub.exists(_.getPath.getName == "_commits")) Nil // nested root
        else collectFromListing(fs, sub, depth - 1)
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

  // ------------------------------------------- generic committed data layout

  /** Generic MANIFEST-PROTOCOL data layout — the source-of-truth shape:
    * ANY table written with `partitionCols` plus the innermost `batch_id`
    * delivery partition is governed by the same manifest law as the four
    * serving-index families, which buys it the full lifecycle the indexes
    * already have: exactly-once appends ([[appendDataLayout]]), snapshot
    * reads + as-of time travel ([[readDataLayout]]), vacuum, and — the
    * point — row-level DELETE ([[deleteFromDataLayout]]). A takedown
    * legally STARTS at the source-of-truth corpus (the day-partitioned
    * events root, a z-ordered table, the shredded landing), not at the
    * serving indexes; before this, those roots could not be scrubbed.
    * The base write lands under `batch_id=-1` (always visible), exactly
    * the index-family convention. */
  def writeDataLayout(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    resetCommitLog(spark, path)
    df.withColumn("batch_id", lit(-1L))
      .write.mode("overwrite")
      .partitionBy((partitionCols :+ "batch_id"): _*)
      .parquet(path)
    initCommitLog(spark, path)
  }

  /** Exactly-once append of one logical batch into a [[writeDataLayout]]
    * root — [[commitWithRetry]] end to end: the delivery lands under its
    * own physical partition and becomes visible in one manifest swap; a
    * replay rewrites byte-identically. Returns the physical id. */
  def appendDataLayout(df: DataFrame, path: String,
      partitionCols: Seq[String], batchId: Long): Long = {
    val spark = df.sparkSession
    commitWithRetry(spark, path, batchId) { phys =>
      df.withColumn("batch_id", lit(phys))
        .write.mode("overwrite")
        .partitionBy((partitionCols :+ "batch_id"): _*)
        .option("partitionOverwriteMode", "dynamic")
        .parquet(path)
    }
  }

  /** Snapshot read of a [[writeDataLayout]] root: one manifest
    * resolution, invisible deliveries pruned as directories, the
    * `batch_id` plumbing column dropped. `asOfVersion` time-travels with
    * the usual refusal contract. */
  def readDataLayout(spark: SparkSession, path: String,
      asOfVersion: Option[Long] = None): DataFrame =
    spark.read.parquet(path)
      .filter(committedBatchFilterAt(spark, path, asOfVersion))
      .drop("batch_id")

  /** Row-level DELETE from a generic [[writeDataLayout]] root — the same
    * recipe as the index families (victim-pushed discovery, affected-
    * delivery-only rewrite, one-manifest swap, MANDATORY vacuum so
    * pre-delete as-of versions refuse), generalized over an arbitrary
    * schema: rows whose `keyCol` is in the victim set vanish, every other
    * column and the partition layout ride through unchanged. Runs under
    * the optimistic-concurrency loop ([[takedownWithRetry]]). Derived
    * file marts (z-order envelopes, ANALYZE stats) describe files this
    * rewrite replaces — refresh them after (the zorder wrapper does).
    *
    * `reshape` re-imposes WRITE-ORDER layout on the rewritten delivery
    * (it receives the survivor frame with its new `batch_id` already
    * set): the plain rewrite preserves in-file row order but lets the
    * scan merge small files into coarser ones, which is sound but erodes
    * file-level min/max pruning — a z-ordered base would lose its
    * skipping power at every takedown until the next compaction. The
    * zorder wrapper passes its range-exchange + in-file sort here.
    *
    * Victim-set TIERS (the r18 verdict's #7): legally-typical takedown
    * sets ride the driver as pushed `isin` predicates — the victim scan
    * skips row groups and the filter stays codegen'd. Past
    * `victimFrameMaxIds` (a 10^7-victim purge — a whole-source recall,
    * not a request list) the isin literal list itself becomes the
    * bottleneck (plan size, per-row linear scan), so both the discovery
    * scan and the rewrite filter flip to JOINS against a victim
    * DataFrame: a broadcast semi/anti join over the distinct victim
    * frame — the sized-degrade recipe, identical rows (spec-pinned). */
  val DefaultVictimFrameMaxIds: Int = 100000

  def deleteFromDataLayout(spark: SparkSession, path: String,
      partitionCols: Seq[String], keyCol: String, ids: Seq[Long],
      reshape: DataFrame => DataFrame = identity,
      victimFrameMaxIds: Int = DefaultVictimFrameMaxIds)
      : TakedownReport = {
    require(ids.nonEmpty, "empty takedown set")
    val victims = ids.distinct
    val joinTier = victims.size > victimFrameMaxIds
    // the victim frame for the join tier (victim-set sized; broadcast —
    // 10^7 longs is tens of MB, inside the executor broadcast budget, and
    // the alternative was a plan LITERAL of the same size)
    lazy val victimDf = {
      import spark.implicits._
      broadcast(victims.toDF(keyCol))
    }
    def victimRows(df: DataFrame): DataFrame =
      if (joinTier) df.join(victimDf, Seq(keyCol), "left_semi")
      else df.filter(col(keyCol).isin(victims: _*))
    def survivorRows(df: DataFrame): DataFrame =
      if (joinTier) df.join(victimDf, Seq(keyCol), "left_anti")
      else df.filter(!col(keyCol).isin(victims: _*))
    takedownWithRetry(spark, path) { observed =>
      val vis = committedBatchFilter(spark, path)
      val hits = victimRows(spark.read.parquet(path).filter(vis))
        .groupBy(col("batch_id").cast("long").as("batch_id"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      if (hits.isEmpty) TakedownReport("data", 0L, 0L, 0L)
      else {
        val affected = hits.map(_._1).toSeq.sorted
        val nest = partitionCols.map(c => s"$c=*").mkString("/")
        val reclaimed = takedownRewrite(spark, path, affected,
            expectedVersion = observed) { (oldPhys, newPhys) =>
          readDeliveryRows(spark, path, nest, oldPhys).foreach { rows =>
            withIdBloom(
                reshape(survivorRows(rows)
                    .drop("batch_id").withColumn("batch_id", lit(newPhys)))
                  .write.mode("overwrite"), keyCol)
              .partitionBy((partitionCols :+ "batch_id"): _*)
              .option("partitionOverwriteMode", "dynamic")
              .parquet(path)
          }
        }
        TakedownReport("data", hits.map(_._2).sum, affected.size.toLong,
          reclaimed)
      }
    }
  }

  /** [[deleteFromDataLayout]] with the partition structure DISCOVERED
    * from the directories — the `DELETE FROM LAYOUT` SQL face for generic
    * data roots, where the statement names only the root and the key
    * column. Walks the first partition chain down to `batch_id=` (parquet
    * partition trees are uniform by construction). */
  def deleteFromDataLayoutAuto(spark: SparkSession, path: String,
      keyCol: String, ids: Seq[Long]): TakedownReport =
    deleteFromDataLayout(spark, path,
      discoverPartitionCols(fsOf(spark, new org.apache.hadoop.fs.Path(path)),
        new org.apache.hadoop.fs.Path(path)),
      keyCol, ids)

  private[ops] def discoverPartitionCols(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[String] = {
    var cols = Vector.empty[String]
    var cur = root
    while (true) {
      val part = fs.listStatus(cur).toSeq.filter(_.isDirectory)
        .map(_.getPath)
        .filter(p => p.getName != "_commits" && p.getName.contains("="))
      part.find(_.getName.startsWith("batch_id=")) match {
        case Some(_) => return cols
        case None =>
          val next = part.headOption.getOrElse(
            throw new IllegalArgumentException(
              s"$root is not a batch-committed data layout (no batch_id= " +
                "partition level found)"))
          cols :+= next.getName.takeWhile(_ != '=')
          cur = next
      }
    }
    cols
  }

  /** [[writeEventsByDay]] under the manifest protocol — day partitions
    * for pruning, `batch_id` deliveries for the lifecycle (append /
    * as-of / DELETE). */
  def writeEventsByDayCommitted(events: DataFrame, path: String): Unit =
    writeDataLayout(
      events.withColumn("event_date", to_date(col("ts")))
        .repartition(col("event_date")),
      path, Seq("event_date"))

  /** [[eventsBetween]] over the committed layout: the date predicate and
    * the visibility predicate are BOTH partition filters — invisible
    * deliveries and out-of-range days prune as directories. */
  def eventsBetweenCommitted(spark: SparkSession, path: String,
      fromDate: String, toDate: String): DataFrame =
    readDataLayout(spark, path)
      .filter(col("event_date") >= fromDate && col("event_date") <= toDate)

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
  private[ops] def parquetFiles(p: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    walk(new java.io.File(p))
  }

  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val inFiles = parquetFiles(inPath)
    val totalBytes = inFiles.map(_.length()).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inPath)
      .coalesce(nOut)
      .write.mode("overwrite").parquet(outPath)
    (inFiles.size, parquetFiles(outPath).size)
  }
}
