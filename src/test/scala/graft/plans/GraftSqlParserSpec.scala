package graft.plans

import java.nio.file.Files

import graft.SparkSpec

/** The injected parser: COMPACT PARQUET runs the compaction and reports the
  * audit row; ordinary SQL and parse errors pass through to Spark's parser
  * untouched. */
class GraftSqlParserSpec extends SparkSpec {
  import spark.implicits._

  test("COMPACT PARQUET statement compacts and returns the audit row") {
    val in = Files.createTempDirectory("graft_sqlcompact_in_").toString
    val out = Files.createTempDirectory("graft_sqlcompact_out_").toString
    (1 to 500).map(i => (i.toLong, s"d$i")).toDF("id", "t")
      .repartition(25).write.mode("overwrite").parquet(in)

    val audit = spark.sql(s"COMPACT PARQUET '$in' INTO '$out' TARGET 1048576")
    assert(audit.columns.toSeq === Seq("files_in", "files_out"))
    val r = audit.head
    assert(r.getInt(0) === 25 && r.getInt(1) === 1)
    assert(spark.read.parquet(out).count() === 500)
  }

  test("case-insensitive, default target, trailing semicolon") {
    val in = Files.createTempDirectory("graft_sqlcompact_in2_").toString
    val out = Files.createTempDirectory("graft_sqlcompact_out2_").toString
    Seq((1, "a"), (2, "b")).toDF("id", "t")
      .repartition(2).write.mode("overwrite").parquet(in)
    val r = spark.sql(s"compact parquet '$in' into '$out';").head
    assert(r.getInt(1) === 1)
  }

  test("everything else still parses through Spark's parser") {
    assert(spark.sql("SELECT 1 + 1 AS x").head.getInt(0) === 2)
    intercept[Exception](spark.sql("COMPACT NONSENSE"))
  }

  test("DELETE FROM LAYOUT sniffs the layout kind, runs the takedown, " +
      "returns the audit row; non-layout roots refuse") {
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("graft_sqldel_").toString + "/idx"
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon", "en", "s1", 30L),
      (2L, "alpha beta gamma delta epsilon", "en", "s1", 30L),
      (3L, "one two three four five six", "en", "s2", 27L),
      (4L, "completely different text entirely here", "en", "s2", 40L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    graft.llm.Dedup.writeMinhashIndex(docs, root)
    val audit = spark.sql(
      s"DELETE FROM LAYOUT '$root' WHERE doc_id IN (1, 3)")
    assert(audit.columns.toSeq === Seq("kind", "matched_rows",
      "rewritten_deliveries", "reclaimed_dirs"))
    val r = audit.head
    assert(r.getString(0) === "minhash")
    assert(r.getLong(1) === 2L && r.getLong(2) === 1L)
    // victim 1 re-elected to 2; victim 3's singleton group erased
    val left = spark.read.parquet(s"$root/members")
      .filter(graft.ops.Layout.committedBatchFilter(spark, root))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(left === Set(2L, 4L))
    // a root that is no recognized index family refuses loudly
    val plain = Files.createTempDirectory("graft_sqldel_plain_").toString
    Seq((1L, "x")).toDF("id", "t").write.mode("overwrite")
      .parquet(s"$plain/data")
    val e = intercept[Exception](spark.sql(
      s"DELETE FROM LAYOUT '$plain' WHERE doc_id IN (1)"))
    assert(e.getMessage.contains("not a recognized serving layout"))
    // ordinary DELETE still parses through Spark's parser
    Seq((1L, "x")).toDF("id", "t").createOrReplaceTempView("del_probe")
    intercept[Exception](spark.sql("DELETE FROM del_probe WHERE id = 1"))
    // QUARANTINE NEAR COPIES: parses, arms the near-copy quarantine on a
    // minhash root (the lane tables appear), and REFUSES on non-minhash
    // kinds rather than silently doing less than the statement promises
    val root2 = Files.createTempDirectory("graft_sqldel2_").toString + "/idx"
    graft.llm.Dedup.writeMinhashIndex(docs, root2)
    val r2 = spark.sql(s"DELETE FROM LAYOUT '$root2' WHERE doc_id IN (3) " +
      "QUARANTINE NEAR COPIES").head
    assert(r2.getString(0) === "minhash" && r2.getLong(1) === 1L)
    val fs = new org.apache.hadoop.fs.Path(root2)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$root2/takedowns_bands")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$root2/takedowns_shingles")))
    val evRoot = Files.createTempDirectory("graft_sqldel_ev_").toString + "/t"
    graft.ops.Layout.writeDataLayout(
      Seq((1L, "a"), (2L, "b")).toDF("event_id", "v"), evRoot, Nil)
    val qe = intercept[Exception](spark.sql(
      s"DELETE FROM LAYOUT '$evRoot' WHERE event_id IN (1) " +
        "QUARANTINE NEAR COPIES"))
    assert(qe.getMessage.contains("only supported on minhash"))
  }

  test("VACUUM LAYOUT and DESCRIBE LAYOUT drive the manifest protocol") {
    import org.apache.spark.sql.functions._
    import graft.ops.Layout
    val base = Files.createTempDirectory("graft_sqlvacuum_").toString
    def deliver(tag: String): Unit = {
      val p = Layout.beginBatchCommit(spark, base, 0L)
      Seq((1L, tag)).toDF("id", "t").withColumn("batch_id", lit(p))
        .write.partitionBy("batch_id").mode("append").parquet(s"$base/t")
      Layout.finishBatchCommit(spark, base, p)
    }
    deliver("v1"); deliver("v2")
    // DESCRIBE lists every published manifest version, oldest first:
    // init's empty v0 plus one per finished delivery
    val desc = spark.sql(s"DESCRIBE LAYOUT '$base'")
    assert(desc.columns.toSeq === Seq("version"))
    val versions = desc.collect().map(_.getLong(0)).toSeq
    assert(versions.length === 3 && versions === versions.sorted)
    // VACUUM removes exactly the superseded first delivery
    val removed = spark.sql(s"VACUUM LAYOUT '$base'").head.getLong(0)
    assert(removed === 1L)
    // the served snapshot did not move
    val served = spark.read.parquet(s"$base/t")
      .filter(Layout.committedBatchFilter(spark, base))
      .select("t").collect().map(_.getString(0)).toSeq
    assert(served === Seq("v2"))
    // idempotent: a second vacuum finds nothing
    assert(spark.sql(s"vacuum layout '$base';").head.getLong(0) === 0L)
  }

  test("VACUUM LAYOUT KEEP n VERSIONS pins the time-travel horizon") {
    import org.apache.spark.sql.functions._
    import graft.ops.Layout
    val base = Files.createTempDirectory("graft_sqlvacuumkeep_").toString
    def deliver(tag: String): Unit = {
      val p = Layout.beginBatchCommit(spark, base, 0L)
      Seq((1L, tag)).toDF("id", "t").withColumn("batch_id", lit(p))
        .write.partitionBy("batch_id").mode("append").parquet(s"$base/t")
      Layout.finishBatchCommit(spark, base, p)
    }
    deliver("v1"); deliver("v2"); deliver("v3")
    val versions = Layout.manifestVersions(spark, base) // init + 3 finishes
    assert(versions.length === 4)
    def asOf(v: Long): Seq[String] =
      spark.read.parquet(s"$base/t")
        .filter(Layout.committedBatchFilterAt(spark, base, Some(v)))
        .select("t").collect().map(_.getString(0)).toSeq

    // KEEP 2: only the delivery BOTH kept versions superseded goes
    val removed = spark
      .sql(s"VACUUM LAYOUT '$base' KEEP 2 VERSIONS").head.getLong(0)
    assert(removed === 1L)
    // inside the horizon: the superseded-but-kept version still reproduces
    assert(asOf(versions(2)) === Seq("v2"))
    assert(asOf(versions.last) === Seq("v3"))
    // outside the horizon: the manifest is RETIRED with its files, so the
    // read REFUSES — a vacuumed snapshot must be indistinguishable from an
    // unpublished one, never silently served partial/empty
    intercept[IllegalArgumentException](asOf(versions(1)))
    assert(!Layout.manifestVersions(spark, base).contains(versions(1)),
      "vacuumed version still listed in the time-travel catalog")

    // KEEP 0 refuses: the current version is not negotiable
    intercept[Exception](spark.sql(s"VACUUM LAYOUT '$base' KEEP 0 VERSIONS"))

    // plain VACUUM (keep 1) reclaims the rest; the served snapshot holds
    assert(spark.sql(s"vacuum layout '$base';").head.getLong(0) === 1L)
    assert(asOf(versions.last) === Seq("v3"))
  }

  test("DIFF LAYOUT VERSIONS reports added/rewritten/removed logical " +
      "batches from the manifests alone") {
    import org.apache.spark.sql.functions._
    import graft.ops.Layout
    val base = Files.createTempDirectory("graft_sqldiff_").toString
    def deliver(logical: Long, tag: String): Long = {
      val p = Layout.beginBatchCommit(spark, base, logical)
      Seq((1L, tag)).toDF("id", "t").withColumn("batch_id", lit(p))
        .write.partitionBy("batch_id").mode("append").parquet(s"$base/t")
      Layout.finishBatchCommit(spark, base, p)
      p
    }
    deliver(0L, "b0")            // -> version 2 (after init's 1)
    val p0b = deliver(0L, "b0'") // rewrite of logical 0 -> version 3
    val p1 = deliver(1L, "b1")   // new logical 1 -> version 4
    val vs = Layout.manifestVersions(spark, base)
    assert(vs.length === 4)

    val d = spark.sql(
      s"DIFF LAYOUT '$base' VERSIONS ${vs(1)} TO ${vs.last}")
    assert(d.columns.toSeq ===
      Seq("logical_batch", "change", "physical_from", "physical_to"))
    val rows = d.collect().map(r => (r.getLong(0), r.getString(1),
      Option(r.get(2)), Option(r.get(3)))).toSeq
    assert(rows === Seq(
      (0L, "rewritten", Some(Layout.manifestEntriesAt(spark, base, vs(1))(0L)),
        Some(p0b)),
      (1L, "added", None, Some(p1))))
    // reverse direction: the same facts read as removed / rewritten back
    val back = spark.sql(
      s"DIFF LAYOUT '$base' VERSIONS ${vs.last} TO ${vs(1)}")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(back === Seq((0L, "rewritten"), (1L, "removed")))
    // a version diffed against itself is empty; unknown versions refuse
    assert(spark.sql(
      s"DIFF LAYOUT '$base' VERSIONS ${vs.last} TO ${vs.last}").count() === 0L)
    intercept[Exception](
      spark.sql(s"DIFF LAYOUT '$base' VERSIONS 1 TO 999").collect())
  }

  test("SNAPSHOT LAYOUT registers a version-pinned view; unknown versions refuse") {
    import org.apache.spark.sql.functions._
    import graft.ops.Layout
    val base = Files.createTempDirectory("graft_sqlsnap_").toString
    def deliver(tag: String): Unit = {
      val p = Layout.beginBatchCommit(spark, base, 0L)
      Seq((1L, tag)).toDF("id", "t").withColumn("batch_id", lit(p))
        .write.partitionBy("batch_id").mode("append").parquet(s"$base/t")
      Layout.finishBatchCommit(spark, base, p)
    }
    deliver("v1"); deliver("v2")
    val versions = Layout.manifestVersions(spark, base)
    assert(versions.length === 3) // init's empty manifest + two deliveries

    // AS OF the superseded delivery's version reproduces ITS answer
    val r1 = spark.sql(s"SNAPSHOT LAYOUT '$base' TABLE 't' " +
      s"AS OF ${versions(1)} AS VIEW snap_old").head
    assert(r1.getString(0) === "snap_old" && r1.getLong(1) === versions(1))
    assert(spark.table("snap_old").select("t")
      .collect().map(_.getString(0)).toSeq === Seq("v1"))

    // no AS OF: the current snapshot, audit row carries the resolved version
    val r2 = spark.sql(
      s"snapshot layout '$base' table 't' as view snap_now;").head
    assert(r2.getLong(1) === versions.last)
    assert(spark.table("snap_now").select("t")
      .collect().map(_.getString(0)).toSeq === Seq("v2"))

    // the init manifest is empty: AS OF it sees only the (absent) base
    spark.sql(s"SNAPSHOT LAYOUT '$base' TABLE 't' " +
      s"AS OF ${versions.head} AS VIEW snap_empty")
    assert(spark.table("snap_empty").count() === 0L)

    // an unpublished version refuses — never a silent different snapshot
    intercept[IllegalArgumentException](spark.sql(
      s"SNAPSHOT LAYOUT '$base' TABLE 't' AS OF 999 AS VIEW snap_nope"))
  }

  test("ZORDER BY clause rewrites through the z-order layout; envelopes prune both dimensions") {
    import org.apache.spark.sql.functions._
    val in = Files.createTempDirectory("graft_sqlzorder_in_").toString
    val out = Files.createTempDirectory("graft_sqlzorder_out_").toString
    // a 64x64 grid hashed across input files: an unorganized layout whose
    // file envelopes cover everything — the worst case z-order must fix
    val grid = spark.range(4096)
      .select(col("id"), (col("id") % 64).as("x"), (col("id") / 64).as("y"))
    grid.repartition(16).write.mode("overwrite").parquet(in)

    // TARGET sized so the statement yields a healthy multi-file output
    // (16 input files over a 4 KB target -> tens of outputs)
    val audit = spark.sql(
      s"COMPACT PARQUET '$in' INTO '$out' TARGET 4096 ZORDER BY (x, y)")
    val r = audit.head
    assert(r.getInt(0) === 16 && r.getInt(1) > 8,
      s"expected a multi-file z-ordered output, got $r")
    // content preserved through the rewrite
    val back = spark.read.parquet(out)
    assert(back.count() === 4096 &&
      back.exceptAll(grid).isEmpty && grid.exceptAll(back).isEmpty)
    // the q154 envelope gate on the statement's output: an ~8x8 box inside
    // one Morton quadrant must NOT hit most files (the unorganized input's
    // envelopes all would); z-ordered files cover small rectangles
    val env = graft.ops.Zorder.fileEnvelopes(spark, out, col("x"), col("y"))
    val hit = env.agg(graft.ops.Zorder.hitFraction(env,
      Some(lit(8L)), Some(lit(15L)), Some(lit(8L)), Some(lit(15L)))
      .as("f")).head.getDouble(0)
    assert(hit <= 0.5, s"box hit fraction $hit — layout not z-ordered")
    // key column is layout, not schema
    assert(back.columns.toSeq === Seq("id", "x", "y"))
  }
}
