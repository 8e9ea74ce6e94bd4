package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Physical layout: partition pruning and filter pushdown must be visible in
  * the plan, not just hoped for. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private val facts = Seq(
    ("0000000001", "Revenues", "2020-01-01", 1.0),
    ("0000000001", "Assets", "2020-06-01", 2.0),
    ("0000000002", "Revenues", "2020-01-01", 3.0),
    ("0000000017", "Assets", "2021-01-01", 4.0)
  ).toDF("cik", "tag", "period_end", "value")

  test("partitioned write + point read: prunes partitions, pushes filters") {
    val path = Files.createTempDirectory("graft_layout").toString + "/facts"
    Layout.writeFactsPartitioned(facts, path, nBuckets = 8)
    val q = Layout.factsForCik(spark, path, "0000000001")
    assert(q.count() === 2)
    assert(singleCol[Double](q.select("value").orderBy("value")) === Seq(1.0, 2.0))

    val plan = q.queryExecution.executedPlan.toString
    // partition pruning on the bucket column (not a post-scan filter)
    assert(plan.contains("PartitionFilters") && plan.contains("cik_bucket"))
    // cik predicate pushed to the parquet reader
    assert(plan.contains("PushedFilters") && plan.contains("cik"))
    // pruned scan reads fewer files than the table has partitions
    val scanned = q.queryExecution.executedPlan.collectLeaves().head.metrics
    q.collect()
    assert(scanned("numFiles").value >= 1)
  }

  test("bucketed tables join with NO exchange (co-located join)") {
    val base = Files.createTempDirectory("graft_buckets")
    val facts = Seq(("A-1", 1.0), ("A-2", 2.0), ("A-3", 3.0))
      .toDF("accession_no", "value")
    val filings = Seq(("A-1", "10-K"), ("A-2", "10-Q"))
      .toDF("accession_no", "form")
    Layout.writeBucketed(facts, "b_facts", s"$base/facts", "accession_no", 4)
    Layout.writeBucketed(filings, "b_filings", s"$base/filings", "accession_no", 4)
    val joined = spark.table("b_facts")
      .join(spark.table("b_filings").hint("merge"), "accession_no")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected no shuffle:\n$plan")
    assert(joined.count() === 2)
    spark.sql("DROP TABLE b_facts"); spark.sql("DROP TABLE b_filings")
  }

  test("cell-partitioned embeddings: an nprobe read prunes to the probed directories") {
    val base = Files.createTempDirectory("graft_cells")
    val assigned = graft.llm.Similarity.ivfAssign(
      graft.Tables.embeddings(spark, "/root/testdata/sf0.001"), nlist = 8)
    Layout.writeEmbeddingsByCell(assigned, s"$base/emb")
    val probed = Layout.embeddingsInCells(spark, s"$base/emb", Seq(0L, 3L))
    val scan = probed.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("cell"),
      s"expected cell partition pruning:\n$scan")
    // result only holds the probed cells, and matches the assignment exactly
    val got = probed.select("vec_id").collect().map(_.getLong(0)).toSet
    val want = assigned.filter(col("cell").isin(0L, 3L))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got === want && got.nonEmpty)
  }

  test("different ciks land deterministically in stable buckets") {
    val b1 = facts.select(Layout.bucketOf(col("cik"), 8)).distinct().count()
    assert(b1 >= 1 && b1 <= 8)
    // same cik always same bucket
    val again = facts.select(col("cik"), Layout.bucketOf(col("cik"), 8).as("b"))
      .groupBy("cik").agg(countDistinct("b").as("n"))
    assert(singleCol[Long](again.select("n").distinct()) === Seq(1L))
  }

  test("day-partitioned events: a range read prunes to the covered days") {
    val path = Files.createTempDirectory("graft_layout_days").toString + "/events"
    val events = Seq(
      (1L, "2021-03-01 10:00:00", 1.0), (2L, "2021-03-02 11:00:00", 2.0),
      (3L, "2021-03-03 12:00:00", 3.0), (4L, "2021-03-08 13:00:00", 4.0))
      .toDF("event_id", "ts", "value")
      .withColumn("ts", to_timestamp(col("ts")))
    Layout.writeEventsByDay(events, path)
    val q = Layout.eventsBetween(spark, path, "2021-03-02", "2021-03-03")
    assert(singleCol[Long](q.select("event_id").orderBy("event_id")) === Seq(2L, 3L))
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("event_date"), p)
  }

  test("bucketOfLocal is the driver-side twin of bucketOf (same md5 arithmetic)") {
    val terms = Seq("hash", "join", "window", "the", "a-b_c", "Ünïcode☃", "")
    val viaColumn = terms.toDF("t")
      .select(col("t"), Layout.bucketOf(col("t"), 64).as("b"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    terms.foreach { t =>
      assert(Layout.bucketOfLocal(t, 64) === viaColumn(t),
        s"bucket mismatch for '$t'")
    }
  }

  test("postings layout: term buckets prune partitions; results match an unpruned filter") {
    val base = Files.createTempDirectory("graft_postings").toString
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val postings = graft.llm.TextAnalysis.bm25Postings(docs)
    // non-default bucket count on purpose: the reader takes NO geometry
    // parameter — it must recover nBuckets from the layout's sidecar, so a
    // writer/reader mismatch is structurally impossible
    Layout.writePostings(postings, s"$base/postings", nBuckets = 32)
    val terms = Seq("hash", "join", "window")
    val q = Layout.postingsForTerms(spark, s"$base/postings", terms)
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("term_bucket"),
      s"expected term_bucket partition pruning:\n$p")
    assert(p.contains("PushedFilters") && p.contains("In(term"),
      s"expected term pushdown:\n$p")
    // the pruned read returns exactly what an unpruned filter over the
    // original postings returns
    val got = q.select("doc_id", "term", "tf").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want = postings.filter(col("term").isin(terms: _*))
      .select("doc_id", "term", "tf").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === want && got.nonEmpty)
  }

  test("manifest contention: the losing publisher leaves zero torn state; " +
      "both recovery shapes converge") {
    val root = Files.createTempDirectory("graft_contend").toString + "/t"
    def put(phys: Long, rows: Seq[(Long, String)]): Unit =
      rows.toDF("id", "v").write.mode("overwrite")
        .parquet(s"$root/data/batch_id=$phys")
    def visible(): Set[(Long, String)] =
      spark.read.parquet(s"$root/data")
        .filter(Layout.committedBatchFilter(spark, root))
        .select("id", "v").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet

    Layout.initCommitLog(spark, root) // arm once, before any writer
    // two writers, DIFFERENT logical batches, both fully written
    val physA = Layout.beginBatchCommit(spark, root, 0L)
    Layout.clearPhysicalDelivery(spark, root, physA)
    put(physA, Seq((1L, "a")))
    val physB = Layout.beginBatchCommit(spark, root, 1L)
    Layout.clearPhysicalDelivery(spark, root, physB)
    put(physB, Seq((2L, "b")))
    // A reads the current manifest for its publish... and B's complete
    // finish lands first — the interleaving publishManifest's rename
    // collision exists to detect
    val vStale = Layout.manifestVersions(spark, root).max
    val mStale = Layout.manifestEntriesAt(spark, root, vStale)
    Layout.finishBatchCommit(spark, root, physB) // B wins
    val commits = new org.apache.hadoop.fs.Path(s"$root/_commits")
    val fs = commits.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the loser: A's stale publish attempt (same code path its
    // finishBatchCommit runs, with the pre-race inputs) fails LOUDLY...
    intercept[IllegalStateException] {
      Layout.publishManifest(fs, commits, vStale + 1,
        mStale + (0L -> physA))
    }
    // ...and leaves ZERO torn state: A stays invisible, B's delivery and
    // the manifest catalog are untouched
    assert(visible() === Set((2L, "b")))
    assert(Layout.manifestEntriesAt(spark, root,
      Layout.manifestVersions(spark, root).max) === Map(1L -> physB))
    // recovery shape 1 — publish-only retry: the data is written, finish
    // re-reads the advanced manifest and swaps cleanly
    Layout.finishBatchCommit(spark, root, physA)
    assert(visible() === Set((1L, "a"), (2L, "b")))
    assert(Layout.manifestEntriesAt(spark, root,
      Layout.manifestVersions(spark, root).max) ===
      Map(0L -> physA, 1L -> physB))
    // recovery shape 2 — the full fresh-begin replay (what a restarted
    // writer that lost its in-memory state runs): same logical batch,
    // rewrites byte-identically, exactly-once holds
    val physA2 = Layout.commitWithRetry(spark, root, 0L)(p =>
      put(p, Seq((1L, "a"))))
    assert(visible() === Set((1L, "a"), (2L, "b")))
    assert(Layout.logicalBatchLocal(physA2) === 0L)
  }

  test("commitWithRetry: six concurrent cross-batch writers all converge — " +
      "every batch exactly once, no torn partition ever visible") {
    val root = Files.createTempDirectory("graft_race").toString + "/t"
    Layout.initCommitLog(spark, root) // first contact is single-writer
    val n = 6
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    val gate = new java.util.concurrent.CyclicBarrier(n)
    try {
      val futures = (0 until n).map { b =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = {
            gate.await() // maximize publish collisions
            Layout.commitWithRetry(spark, root, b.toLong,
                maxAttempts = 4 * n) { phys =>
              Seq((b.toLong, s"w$b")).toDF("id", "v")
                .write.mode("overwrite")
                .parquet(s"$root/data/batch_id=$phys")
            }
          }
        })
      }
      val phys = futures.map(_.get(180, java.util.concurrent.TimeUnit.SECONDS))
      assert(phys.map(Layout.logicalBatchLocal).sorted ===
        (0 until n).map(_.toLong))
    } finally pool.shutdownNow()
    val got = spark.read.parquet(s"$root/data")
      .filter(Layout.committedBatchFilter(spark, root))
      .select("id", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === (0 until n).map(b => (b.toLong, s"w$b")).toSet)
    // the final manifest maps every logical batch to exactly one physical
    val m = Layout.manifestEntriesAt(spark, root,
      Layout.manifestVersions(spark, root).max)
    assert(m.keySet === (0 until n).map(_.toLong).toSet)
    // no pending markers left behind: every delivery retired its intent
    val fs = new org.apache.hadoop.fs.Path(s"$root/_commits")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pending = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/_commits"))
      .map(_.getPath.getName).filter(_.startsWith("pending_"))
    assert(pending.isEmpty, s"unretired intent markers: ${pending.toSeq}")
  }

  test("withIdBloom: dormant while dictionary-encoded (byte-identical " +
      "files), a real footer bloom at dictionary fallback; results " +
      "identical either way") {
    import scala.jdk.CollectionConverters._
    val tmp = Files.createTempDirectory("graft_bloom").toString
    val conf = spark.sparkContext.hadoopConfiguration
    def bloomOf(dir: String): Boolean = {
      val f = Layout.parquetFiles(dir).head
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
      try {
        val rg = r.getFooter.getBlocks.get(0)
        val c = rg.getColumns.asScala
          .find(_.getPath.toDotString == "doc_id").get
        r.getBloomFilterDataReader(rg).readBloomFilter(c) != null
      } finally r.close()
    }
    def sizeOf(dir: String): Long =
      Layout.parquetFiles(dir).map(_.length()).sum
    import org.apache.spark.sql.functions.{col, md5}
    // LOW-NDV tier: doc_id stays dictionary-encoded → parquet writes no
    // bloom at all; the option is free (byte-identical files)
    val small = spark.range(20000)
      .select((col("id") % 64).as("doc_id"),
        md5(col("id").cast("string")).as("term"))
      .coalesce(1).sortWithinPartitions("term")
    small.write.mode("overwrite").parquet(s"$tmp/plain")
    Layout.withIdBloom(small.write.mode("overwrite"), "doc_id")
      .parquet(s"$tmp/armed")
    assert(!bloomOf(s"$tmp/armed") && !bloomOf(s"$tmp/plain"))
    assert(sizeOf(s"$tmp/armed") === sizeOf(s"$tmp/plain"))
    // FALLBACK tier (a 1 KiB dictionary page stands in for the 100 TB
    // shape where a row group holds ~10^6 distinct ids): the chunk
    // plain-encodes and the SAME option now materializes a footer bloom
    val big = spark.range(20000)
      .select(col("id").as("doc_id"),
        md5(col("id").cast("string")).as("term"))
      .coalesce(1).sortWithinPartitions("term")
    Layout.withIdBloom(big.write.mode("overwrite"), "doc_id")
      .option("parquet.dictionary.page.size", "1024")
      .parquet(s"$tmp/fb_armed")
    big.write.mode("overwrite")
      .option("parquet.dictionary.page.size", "1024")
      .parquet(s"$tmp/fb_plain")
    assert(bloomOf(s"$tmp/fb_armed"), "fallback chunk carries no bloom")
    assert(!bloomOf(s"$tmp/fb_plain"))
    // and the skip structure never changes answers
    def probe(dir: String): Seq[Long] =
      spark.read.parquet(dir).filter(col("doc_id") === 1234L)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(probe(s"$tmp/fb_armed") === probe(s"$tmp/fb_plain"))
  }

  test("publish lease is the cross-process serializer: six writers with " +
      "the JVM lock DISABLED all converge, losers recover via " +
      "commitWithRetry, the lease is released") {
    // with the per-root JVM lock off, the O_CREAT|O_EXCL lease file is
    // the ONLY thing between check-then-rename windows — exactly what a
    // second driver process on this root would rely on
    val root = Files.createTempDirectory("graft_lease").toString + "/t"
    Layout.initCommitLog(spark, root)
    System.setProperty("graft.layout.disableJvmPublishLock", "true")
    try {
      val n = 6
      val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
      val gate = new java.util.concurrent.CyclicBarrier(n)
      try {
        val futures = (0 until n).map { b =>
          pool.submit(new java.util.concurrent.Callable[Long] {
            def call(): Long = {
              gate.await()
              Layout.commitWithRetry(spark, root, b.toLong,
                  maxAttempts = 4 * n) { phys =>
                Seq((b.toLong, s"w$b")).toDF("id", "v")
                  .write.mode("overwrite")
                  .parquet(s"$root/data/batch_id=$phys")
              }
            }
          })
        }
        val phys = futures.map(
          _.get(180, java.util.concurrent.TimeUnit.SECONDS))
        assert(phys.map(Layout.logicalBatchLocal).sorted ===
          (0 until n).map(_.toLong))
      } finally pool.shutdownNow()
      // every batch exactly once — no clobbered manifest entry
      val m = Layout.manifestEntriesAt(spark, root,
        Layout.manifestVersions(spark, root).max)
      assert(m.keySet === (0 until n).map(_.toLong).toSet)
      val got = spark.read.parquet(s"$root/data")
        .filter(Layout.committedBatchFilter(spark, root))
        .select("id", "v").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got === (0 until n).map(b => (b.toLong, s"w$b")).toSet)
      // no lease left behind
      val fs = new org.apache.hadoop.fs.Path(s"$root/_commits")
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(
        s"$root/_commits/.publish_lease")))
      // a DEAD holder's lease (older than the TTL) is broken, not waited on
      val lease = new org.apache.hadoop.fs.Path(
        s"$root/_commits/.publish_lease")
      fs.create(lease, true).close()
      fs.setTimes(lease, System.currentTimeMillis() - 120000L, -1)
      Layout.commitWithRetry(spark, root, 99L) { phys =>
        Seq((99L, "late")).toDF("id", "v").write.mode("overwrite")
          .parquet(s"$root/data/batch_id=$phys")
      }
      assert(!fs.exists(lease))
    } finally System.clearProperty("graft.layout.disableJvmPublishLock")
  }

  test("lease break is single-winner: concurrent breakers of one stale " +
      "lease race the rename, exactly one retires it") {
    val dir = Files.createTempDirectory("graft_break").toString
    val lease = new org.apache.hadoop.fs.Path(s"$dir/.publish_lease")
    val fs = lease.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(lease, true).close()
    val staleM = System.currentTimeMillis() - 120000L
    fs.setTimes(lease, staleM, -1)
    val observed = fs.getFileStatus(lease).getModificationTime
    val n = 8
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    val gate = new java.util.concurrent.CyclicBarrier(n)
    try {
      val wins = (0 until n).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = {
            gate.await()
            Layout.breakStaleLease(fs, lease, observed)
          }
        })
      }.count(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
      assert(wins === 1) // the old delete-based break let several "win"
    } finally pool.shutdownNow()
    assert(!fs.exists(lease))
  }

  test("lease break refuses a FRESH lease: a breaker holding a stale " +
      "observation cannot remove the lease a faster breaker re-acquired " +
      "(the double-breaker TOCTOU)") {
    val dir = Files.createTempDirectory("graft_break2").toString
    val lease = new org.apache.hadoop.fs.Path(s"$dir/.publish_lease")
    val fs = lease.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(lease, true).close()
    fs.setTimes(lease, System.currentTimeMillis() - 120000L, -1)
    val observed = fs.getFileStatus(lease).getModificationTime
    // breaker B: breaks the stale lease and RE-ACQUIRES with its own token
    assert(Layout.breakStaleLease(fs, lease, observed))
    assert(Layout.tryCreateExclusive(fs, lease, "token-B"))
    // breaker A now executes ITS break against the stale observation: it
    // must refuse — B's fresh lease survives byte-identically
    assert(!Layout.breakStaleLease(fs, lease, observed))
    val in = fs.open(lease)
    val held = try {
      val buf = new Array[Byte](64)
      val k = in.read(buf)
      new String(buf, 0, k, "UTF-8")
    } finally in.close()
    assert(held === "token-B")
  }

  test("takedown vs concurrent append: the swap refuses when the manifest " +
      "advanced past discovery; takedownWithRetry re-discovers and " +
      "converges — no victim row survives unscanned") {
    val root = Files.createTempDirectory("graft_tkdn_race").toString + "/t"
    def write(phys: Long, ids: Seq[Long]): Unit =
      ids.toDF("id").withColumn("batch_id", lit(phys))
        .write.mode("overwrite").partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(s"$root/data")
    Layout.commitWithRetry(spark, root, 0L)(p => write(p, Seq(1L, 7L)))
    val victim = 7L
    var attempts = 0
    Layout.takedownWithRetry(spark, root) { observed =>
      attempts += 1
      val vis = Layout.committedBatchFilter(spark, root)
      val affected = spark.read.parquet(s"$root/data").filter(vis)
        .filter(col("id") === victim)
        .select(col("batch_id").cast("long")).distinct()
        .collect().map(_.getLong(0)).toSeq.sorted
      if (attempts == 1) {
        // the racer: an append carrying ANOTHER copy of the victim lands
        // between this takedown's discovery and its swap
        Layout.commitWithRetry(spark, root, 1L)(p =>
          write(p, Seq(9L, victim)))
      }
      Layout.takedownRewrite(spark, root, affected,
          expectedVersion = observed) { (oldPhys, newPhys) =>
        Layout.readDeliveryRows(spark, s"$root/data", "", oldPhys)
          .foreach { rows =>
            rows.filter(col("id") =!= victim)
              .drop("batch_id").withColumn("batch_id", lit(newPhys))
              .write.mode("overwrite").partitionBy("batch_id")
              .option("partitionOverwriteMode", "dynamic")
              .parquet(s"$root/data")
          }
      }
    }
    // attempt 1 refused (the racer won the version); attempt 2 saw the
    // racer's delivery in discovery and scrubbed its victim copy too
    assert(attempts === 2)
    val got = spark.read.parquet(s"$root/data")
      .filter(Layout.committedBatchFilter(spark, root))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 9L))
  }

  test("vacuum grace window: young deliveries survive with their manifests " +
      "intact; a vacuum past the window completes the retirement") {
    val root = Files.createTempDirectory("graft_grace").toString + "/t"
    (1 to 3).foreach { i =>
      val p = Layout.beginBatchCommit(spark, root, 0L)
      Seq((1L, s"v$i")).toDF("id", "t").withColumn("batch_id", lit(p))
        .write.partitionBy("batch_id").mode("append").parquet(s"$root/t")
      Layout.finishBatchCommit(spark, root, p)
    }
    val versions = Layout.manifestVersions(spark, root) // init + 3
    def asOf(v: Long): Seq[String] =
      spark.read.parquet(s"$root/t")
        .filter(Layout.committedBatchFilterAt(spark, root, Some(v)))
        .select("t").collect().map(_.getString(0)).toSeq
    assert(asOf(versions(1)) === Seq("v1"))
    // a long-running reader may still be collecting from the superseded
    // deliveries: within the grace window NOTHING is reclaimed — and the
    // refusal invariant defers WITH the files (every version stays fully
    // readable, none serves partial rows)
    assert(Layout.vacuumLayout(spark, root, keepVersions = 1,
      minAgeMs = 3600L * 1000) === 0L)
    // every version whose snapshot has files survives intact; only the
    // init manifest (empty map — nothing age-spared to defer for) retires
    // on schedule
    assert(Layout.manifestVersions(spark, root) === versions.tail)
    assert(asOf(versions(1)) === Seq("v1"))
    assert(asOf(versions.last) === Seq("v3"))
    // past the window (everything here is older than 0ms): the retirement
    // completes — superseded dirs reclaimed, out-of-horizon versions refuse
    assert(Layout.vacuumLayout(spark, root, keepVersions = 1) === 2L)
    assert(Layout.manifestVersions(spark, root) === Seq(versions.last))
    intercept[IllegalArgumentException] { asOf(versions(1)) }
    assert(asOf(versions.last) === Seq("v3"))
  }

  test("schema-evolution read: added columns surface as nulls for old files") {
    val v1 = Files.createTempDirectory("graft_layout_v1").toString
    val v2 = Files.createTempDirectory("graft_layout_v2").toString
    Seq((1L, "a")).toDF("id", "text").write.mode("overwrite").parquet(v1)
    Seq((2L, "b", "en")).toDF("id", "text", "lang")
      .write.mode("overwrite").parquet(v2)
    val merged = Layout.readEvolved(spark, v1, v2)
    assert(merged.columns.toSet === Set("id", "text", "lang"))
    val byId = merged.orderBy("id").collect()
    assert(byId(0).getAs[String]("lang") === null) // v1 file: column absent
    assert(byId(1).getAs[String]("lang") === "en")
  }
}
