package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.Selection

/** Row-level DELETE (takedown) across the persisted serving layouts: the
  * one lifecycle operation append/compact/vacuum could not express. The
  * laws pinned here:
  *
  *   - minhash: post-delete probes == probes of an index built from
  *     scratch without the victims (rep re-election and group erasure
  *     included), and the committed admission audit survives;
  *   - bm25: post-delete search == a fresh one-shot index over the
  *     survivors (stats recomputed per delivery, never subtracted);
  *   - ivfadc / ahash: at-rest row law — rows(after) == rows(before)
  *     minus the victims' rows, geometry untouched;
  *   - protocol: the base rewrites under the negative physical chain,
  *     the whole multi-batch swap is ONE manifest version, and the
  *     mandatory vacuum makes pre-delete as-of versions REFUSE — a
  *     legal delete that stays time-travelable is not a delete;
  *   - vacuum grace ages by SUPERSESSION time (manifest mtimes), not
  *     delivery write time.
  */
class TakedownSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, text: String, source: String) =
    (id, text, "en", source, text.length.toLong)

  private val t1 = "alpha beta gamma delta epsilon zeta eta theta"
  private val t2 = "one two three four five six seven eight nine"
  private val t3 = "completely different spark engine text entirely"
  private val t4 = "unrelated takedown subject text here and now"
  private val t5 = "novel appended document text for the admitted batch"
  private val t6 = "another novel appended text sharing nothing at all"

  test("minhash takedown: rep re-election + group erasure + cross-batch " +
      "victims == fresh build without them; audit survives; pre-delete " +
      "versions refuse") {
    val base = Seq(
      doc(10L, t1, "s1"), doc(20L, t1, "s1"), doc(30L, t1, "s2"),
      doc(40L, t2, "s1"), doc(50L, t2, "s2"),
      doc(60L, t3, "s1"), doc(70L, t4, "s2")
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val admitted = Seq(doc(80L, t5, "s3"), doc(90L, t6, "s3"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val root = java.nio.file.Files.createTempDirectory("graft_tkdn_mh")
      .toString + "/idx"
    graft.llm.Dedup.writeMinhashIndex(base, root)
    graft.llm.Dedup.admitIntoMinhashIndex(spark, admitted, root,
      batchId = 0L)
    val preVersions = Layout.manifestVersions(spark, root)
    val preAudit = rows(graft.llm.Dedup.admissionLog(spark, root)
      .orderBy("batch", "source"))

    // victims: the G1 rep (10 — group survives, re-elects 20), the whole
    // G2 group (40, 50 — erased), a singleton (70), and an ADMITTED
    // batch-0 doc (80) — so both the base and the appended delivery rewrite
    val report = graft.llm.Dedup.deleteDocsFromMinhashIndex(spark, root,
      Seq(10L, 40L, 50L, 70L, 80L))
    assert(report.kind === "minhash")
    assert(report.nMatchedRows === 5L)
    assert(report.nRewrittenDeliveries === 2L) // base + batch 0
    assert(report.nReclaimedDirs > 0L)

    // the base now serves from the negative rewrite chain; the raw
    // batch_id=-1 directories are gone
    val m = Layout.manifestEntriesAt(spark, root,
      Layout.manifestVersions(spark, root).max)
    assert(m(-1L) === -2L)
    assert(Layout.logicalBatchLocal(-2L) === -1L)

    // index content: victims gone, G1 renamed to its min surviving member
    val vis = Layout.committedBatchFilter(spark, root)
    val members = spark.read.parquet(s"$root/members").filter(vis)
      .select("doc_id", "rep").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(members.keySet === Set(20L, 30L, 60L, 90L))
    assert(members(20L) === 20L && members(30L) === 20L)
    val repIds = spark.read.parquet(s"$root/shingles").filter(vis)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(repIds === Set(20L, 60L, 90L))
    assert(spark.read.parquet(s"$root/bands").filter(vis)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet ===
      Set(20L, 60L, 90L))

    // probe equality with a from-scratch index over the survivors
    val fresh = java.nio.file.Files.createTempDirectory("graft_tkdn_mh2")
      .toString + "/idx"
    graft.llm.Dedup.writeMinhashIndex(Seq(
      doc(20L, t1, "s1"), doc(30L, t1, "s2"), doc(60L, t3, "s1"),
      doc(90L, t6, "s3")).toDF("doc_id", "text", "lang", "source",
      "n_chars"), fresh)
    val delta = Seq(doc(1000L, t1, "d"), doc(1001L, t2, "d"),
      doc(1002L, t5, "d"), doc(1003L, t6, "d"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    def probe(p: String): Seq[(Long, Long, Double)] =
      graft.llm.Dedup.probeMinhashIndex(spark, delta, p, 0.8).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val got = probe(root)
    assert(got === probe(fresh))
    assert(got.map(p => (p._1, p._2)) ===
      Seq((20L, 1000L), (30L, 1000L), (90L, 1003L)))

    // the committed audit is history — the takedown does not falsify it
    assert(rows(graft.llm.Dedup.admissionLog(spark, root)
      .orderBy("batch", "source")) === preAudit)
    assert(preAudit.nonEmpty)

    // pre-delete snapshots are DESTROYED, not just superseded: every
    // pre-delete manifest version refuses after the mandatory vacuum
    preVersions.foreach { v =>
      intercept[IllegalArgumentException] {
        spark.read.parquet(s"$root/members")
          .filter(Layout.committedBatchFilterAt(spark, root, Some(v)))
          .collect()
      }
    }

    // a SECOND takedown on the same root extends the base rewrite chain
    val r2 = graft.llm.Dedup.deleteDocsFromMinhashIndex(spark, root,
      Seq(20L))
    assert(r2.nMatchedRows === 1L)
    assert(Layout.manifestEntriesAt(spark, root,
      Layout.manifestVersions(spark, root).max)(-1L) === -3L)
    val members2 = spark.read.parquet(s"$root/members")
      .filter(Layout.committedBatchFilter(spark, root))
      .select("doc_id", "rep").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(members2.keySet === Set(30L, 60L, 90L))
    assert(members2(30L) === 30L) // re-elected again
    // an unindexed doc_id is a no-op takedown (already absent — succeed)
    val r3 = graft.llm.Dedup.deleteDocsFromMinhashIndex(spark, root,
      Seq(424242L))
    assert(r3 === Layout.TakedownReport("minhash", 0L, 0L, 0L))
  }

  test("takedown registry: a re-crawled copy of deleted content is " +
      "REFUSED and audited (n_blocked); replay leaves registry and index " +
      "unmoved; a second takedown extends it; it rides compaction") {
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val base = Seq(
      doc(10L, t1, "s1"), doc(20L, t1, "s1"), // t1 group: partial takedown
      doc(40L, t2, "s1"),                     // t2 group: fully erased
      doc(60L, t3, "s2")
    ).toDF(cols: _*)
    val root = java.nio.file.Files.createTempDirectory("graft_tkdn_reg")
      .toString + "/idx"
    graft.llm.Dedup.writeMinhashIndex(base, root)
    graft.llm.Dedup.deleteDocsFromMinhashIndex(spark, root, Seq(10L, 40L))
    def regRows(p: String): Set[(String, Long)] =
      graft.llm.Dedup.takedownRegistry(spark, p).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
    val reg1 = regRows(root)
    assert(reg1.map(_._2) === Set(10L, 40L))
    // 10 and 20 share t1, so their registered key equals 20's group key;
    // 40's key is t2's
    assert(reg1.size === 2)

    // re-crawl: an exact copy of the ERASED t2, an exact copy of t1
    // (copies of which still survive as doc 20 — blocked must take
    // precedence over rejected), a fresh doc, and a shingle-less doc
    val delta = Seq(doc(100L, t2, "d"), doc(101L, t1, "d"),
      doc(102L, t5, "d"), doc(103L, "word", "d")).toDF(cols: _*)
    graft.llm.Dedup.admitIntoMinhashIndex(spark, delta, root, batchId = 0L)
    def logRows(p: String): Set[(Long, String, Long, Long, Long, Long)] =
      graft.llm.Dedup.admissionLog(spark, p).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    val log1 = logRows(root)
    assert(log1 === Set((0L, "d", 1L, 0L, 1L, 2L)))
    def memberIds(p: String): Set[Long] =
      spark.read.parquet(s"$p/members")
        .filter(Layout.committedBatchFilter(spark, p))
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val mem1 = memberIds(root)
    assert(mem1 === Set(20L, 60L, 102L)) // blocked docs never indexed

    // REPLAY the same batch: decision, log, index and registry unmoved
    graft.llm.Dedup.admitIntoMinhashIndex(spark, delta, root, batchId = 0L)
    assert(logRows(root) === log1)
    assert(memberIds(root) === mem1)
    assert(regRows(root) === reg1)

    // a SECOND takedown extends the registry (prior rows carry forward)
    graft.llm.Dedup.deleteDocsFromMinhashIndex(spark, root, Seq(60L))
    val reg2 = regRows(root)
    assert(reg2.map(_._2) === Set(10L, 40L, 60L))
    assert(reg2.intersect(reg1) === reg1)

    // the registry rides compaction: the compacted root still refuses
    val out = java.nio.file.Files.createTempDirectory("graft_tkdn_reg2")
      .toString + "/idx"
    graft.llm.Dedup.compactMinhashIndex(spark, root, out)
    assert(regRows(out) === reg2)
    graft.llm.Dedup.admitIntoMinhashIndex(spark,
      Seq(doc(200L, t3, "d2"), doc(201L, t6, "d2")).toDF(cols: _*),
      out, batchId = 0L)
    assert(logRows(out).contains((0L, "d2", 1L, 0L, 0L, 1L)))
    assert(!memberIds(out).contains(200L))
  }

  test("bm25 takedown: post-delete search and stats folds == a fresh " +
      "one-shot index over the survivors") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val tmp = java.nio.file.Files.createTempDirectory("graft_tkdn_bm25")
      .toString
    Selection.writeBm25Index(docs.filter(col("doc_id") % 3 === 0),
      s"$tmp/idx")
    Selection.appendToBm25Index(docs.filter(col("doc_id") % 3 === 1),
      s"$tmp/idx", batchId = 0L)
    Selection.appendToBm25Index(docs.filter(col("doc_id") % 3 === 2),
      s"$tmp/idx", batchId = 1L)
    val victims = docs.filter(col("doc_id") % 17 === 5)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(victims.nonEmpty &&
      victims.map(_ % 3).toSet.size === 3,
      "fixture too thin: victims must span base and both appends")
    val preVersions = Layout.manifestVersions(spark, s"$tmp/idx")
    val report = Selection.deleteDocsFromBm25Index(spark, s"$tmp/idx",
      victims)
    assert(report.kind === "bm25" && report.nMatchedRows > 0L &&
      report.nRewrittenDeliveries === 3L)

    Selection.writeBm25Index(docs.filter(col("doc_id") % 17 =!= 5),
      s"$tmp/fresh")
    val terms = Seq("hash", "join", "window")
    def search(base: String): Seq[(Long, Long)] =
      Selection.bm25SearchIndex(spark, base, terms, topK = 20).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_micro")))
        .toSeq
    val got = search(s"$tmp/idx")
    assert(got === search(s"$tmp/fresh") && got.nonEmpty)
    assert(got.map(_._1).toSet.intersect(victims.toSet).isEmpty)
    // stats fold == fresh one-shot stats (recompute-at-rest, no drift)
    def termStats(base: String) =
      Selection.bm25TermStatsRead(spark, base).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(termStats(s"$tmp/idx") === termStats(s"$tmp/fresh"))
    def corpusStats(base: String) =
      Selection.bm25CorpusStatsRead(spark, base).collect().head.toSeq
    assert(corpusStats(s"$tmp/idx") === corpusStats(s"$tmp/fresh"))
    // pre-delete versions refuse after the mandatory vacuum
    preVersions.foreach { v =>
      intercept[IllegalArgumentException] {
        Layout.committedBatchFilterAt(spark, s"$tmp/idx", Some(v))
      }
    }
  }

  test("ivfadc takedown: at-rest row law on codes+reassign, frozen " +
      "geometry untouched, incremental root search == survivor-only append") {
    val rng = new scala.util.Random(17)
    val centers = Array.fill(4)(Array.fill(64)(rng.nextGaussian() * 10))
    val vecs = Seq.tabulate(160) { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => (x + rng.nextGaussian() * 0.05).toFloat).toSeq,
        i % 4)
    }.toDF("vec_id", "embedding", "label")
    val victims = Seq(3L, 85L, 120L)
    val tmp = java.nio.file.Files.createTempDirectory("graft_tkdn_pq")
      .toString
    Selection.writeIvfadcIndex(vecs, nlist = 8, s"$tmp/full")
    // the incremental twin shares the frozen geometry; its codes arrive
    // in two appended batches
    def freeze(dst: String): Unit = {
      spark.read.parquet(s"$tmp/full/cents").write.parquet(s"$dst/cents")
      spark.read.parquet(s"$tmp/full/codebook")
        .write.parquet(s"$dst/codebook")
    }
    freeze(s"$tmp/inc")
    Selection.appendToIvfadcIndex(vecs.filter(col("vec_id") < 80),
      s"$tmp/inc", batchId = 0L)
    Selection.appendToIvfadcIndex(vecs.filter(col("vec_id") >= 80),
      s"$tmp/inc", batchId = 1L)

    def codesAt(base: String): Set[Seq[Any]] =
      spark.read.parquet(s"$base/codes")
        .filter(Layout.committedBatchFilter(spark, base))
        .select("vec_id", "m", "cell", "code").collect()
        .map(_.toSeq).toSet
    val preFull = codesAt(s"$tmp/full")
    val preInc = codesAt(s"$tmp/inc")
    val geomBefore = spark.read.parquet(s"$tmp/full/cents").collect()
      .map(_.toSeq).toSet

    // base-delivery rewrite (codes live in batch_id=-1)
    val rFull = Selection.deleteVecsFromIvfadcIndex(spark, s"$tmp/full",
      victims)
    assert(rFull.kind === "ivfadc" && rFull.nRewrittenDeliveries === 1L)
    assert(codesAt(s"$tmp/full") ===
      preFull.filterNot(r => victims.contains(r.head)))
    assert(spark.read.parquet(s"$tmp/full/cents").collect()
      .map(_.toSeq).toSet === geomBefore)

    // appended-delivery rewrite on the incremental root
    val rInc = Selection.deleteVecsFromIvfadcIndex(spark, s"$tmp/inc",
      victims)
    assert(rInc.nRewrittenDeliveries === 2L)
    assert(codesAt(s"$tmp/inc") ===
      preInc.filterNot(r => victims.contains(r.head)))
    assert(spark.read.parquet(s"$tmp/inc/reassign")
      .filter(Layout.committedBatchFilter(spark, s"$tmp/inc"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
      .intersect(victims.toSet).isEmpty)

    // searches are pure functions of (codes, geometry): the deleted
    // incremental root == a root that only ever ingested the survivors
    freeze(s"$tmp/ref")
    Selection.appendToIvfadcIndex(
      vecs.filter(col("vec_id") < 80 && !col("vec_id").isin(victims: _*)),
      s"$tmp/ref", batchId = 0L)
    Selection.appendToIvfadcIndex(
      vecs.filter(col("vec_id") >= 80 && !col("vec_id").isin(victims: _*)),
      s"$tmp/ref", batchId = 1L)
    def search(base: String) =
      Selection.ivfadcSearchIndex(spark, base,
        vecs.filter(!col("vec_id").isin(victims: _*)),
        nQueries = 4, k = 10, nprobe = 2, candidates = 64).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"),
          r.getAs[Long]("rank"))).toSet
    val inc = search(s"$tmp/inc")
    assert(inc === search(s"$tmp/ref") && inc.nonEmpty)
    assert(inc.map(_._2).intersect(victims.toSet).isEmpty)
  }

  test("ahash takedown: at-rest row law on band rows; pair scan == " +
      "pre-delete pairs minus victim pairs; pre-delete versions refuse") {
    implicit val s = spark
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val tmp = java.nio.file.Files.createTempDirectory("graft_tkdn_ah")
      .toString
    Multimodal.writeAhashIndex(corpus.filter(col("doc_id") % 2 === 0),
      s"$tmp/idx")
    Multimodal.appendToAhashIndex(corpus.filter(col("doc_id") % 2 === 1),
      s"$tmp/idx", batchId = 0L)
    def bandRows(): Set[Seq[Any]] =
      spark.read.parquet(s"$tmp/idx/bands")
        .filter(Layout.committedBatchFilter(spark, s"$tmp/idx"))
        .select("doc_id", "band", "v").collect().map(_.toSeq).toSet
    val pre = bandRows()
    val indexed = pre.map(_.head.asInstanceOf[Long]).toSeq.sorted
    // victims from both the base and the appended delivery
    val victims = (indexed.filter(_ % 2 == 0).take(3) ++
      indexed.filter(_ % 2 == 1).take(3)).toSeq
    assert(victims.size === 6)
    val prePairs = Multimodal.ahashPairsFromIndex(spark, s"$tmp/idx", 8)
      .collect().map(_.toSeq).toSet
    val preVersions = Layout.manifestVersions(spark, s"$tmp/idx")

    val report = Multimodal.deleteDocsFromAhashIndex(spark, s"$tmp/idx",
      victims)
    assert(report.kind === "ahash" && report.nMatchedRows > 0L &&
      report.nRewrittenDeliveries === 2L)
    assert(bandRows() ===
      pre.filterNot(r => victims.contains(r.head.asInstanceOf[Long])))
    assert(Multimodal.ahashPairsFromIndex(spark, s"$tmp/idx", 8)
      .collect().map(_.toSeq).toSet ===
      prePairs.filterNot(r => victims.contains(r(0).asInstanceOf[Long]) ||
        victims.contains(r(1).asInstanceOf[Long])))
    preVersions.foreach { v =>
      intercept[IllegalArgumentException] {
        Layout.committedBatchFilterAt(spark, s"$tmp/idx", Some(v))
      }
    }
  }

  test("near-copy quarantine: nearCopyBlock=true blocks a paraphrase of " +
      "taken-down content at the threshold; the default exact tier " +
      "admits it; the quarantine rides compaction") {
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val tLong = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango"
    val tNear = tLong + " extra" // 19/20 shared shingles: jaccard 0.95
    val base = Seq(doc(40L, tLong, "s1"), doc(60L, t3, "s2"))
      .toDF(cols: _*)
    val delta = Seq(doc(100L, tNear, "d"), doc(101L, t5, "d"))
      .toDF(cols: _*)
    def build(near: Boolean): String = {
      val root = java.nio.file.Files.createTempDirectory("graft_tkdn_nc")
        .toString + "/idx"
      graft.llm.Dedup.writeMinhashIndex(base, root)
      graft.llm.Dedup.deleteDocsFromMinhashIndex(spark, root, Seq(40L),
        nearCopyBlock = near)
      graft.llm.Dedup.admitIntoMinhashIndex(spark, delta, root,
        batchId = 0L)
      root
    }
    def log(p: String): Set[(Long, Long, Long, Long)] =
      rows(graft.llm.Dedup.admissionLog(spark, p)
        .select("n_admitted", "n_rejected", "n_skipped", "n_blocked"))
        .map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long],
          r(2).asInstanceOf[Long], r(3).asInstanceOf[Long])).toSet
    def members(p: String): Set[Long] =
      spark.read.parquet(s"$p/members")
        .filter(Layout.committedBatchFilter(spark, p))
        .select("doc_id").collect().map(_.getLong(0)).toSet
    // exact tier: the paraphrase's only near-dup partner was DELETED, so
    // it sails in — exactly the gap the quarantine closes
    val exact = build(near = false)
    assert(log(exact) === Set((2L, 0L, 0L, 0L)))
    assert(members(exact).contains(100L))
    // quarantine tier: the paraphrase is refused and never indexed
    val near = build(near = true)
    assert(log(near) === Set((1L, 0L, 0L, 1L)))
    assert(members(near) === Set(60L, 101L))
    // the quarantine rides compaction: the compacted root still refuses
    val out = java.nio.file.Files.createTempDirectory("graft_tkdn_nc2")
      .toString + "/idx"
    graft.llm.Dedup.compactMinhashIndex(spark, near, out)
    graft.llm.Dedup.admitIntoMinhashIndex(spark,
      Seq(doc(200L, tLong + " other", "d2")).toDF(cols: _*),
      out, batchId = 1L)
    assert(graft.llm.Dedup.admissionLog(spark, out)
      .filter(col("batch") === 1L).select("n_blocked")
      .collect().head.getLong(0) === 1L)
  }

  test("generic data-layout takedown (day-partitioned events): post-delete " +
      "read == fresh write minus victims; pre-delete versions refuse; " +
      "the SQL face sniffs kind=data") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft_tkdn_ev")
      .toString + "/t"
    Layout.writeEventsByDayCommitted(ev.filter(col("event_id") % 2 === 0),
      root)
    Layout.appendDataLayout(
      ev.filter(col("event_id") % 2 =!= 0)
        .withColumn("event_date", to_date(col("ts"))),
      root, Seq("event_date"), batchId = 0L)
    val preVersions = Layout.manifestVersions(spark, root)
    // victims span both deliveries
    val victims = Seq(4L, 7L, 100L, 101L)
    val rep = spark.sql(s"DELETE FROM LAYOUT '$root' WHERE event_id IN " +
      s"(${victims.mkString(", ")})").collect().head
    assert(rep.getString(0) === "data")
    assert(rep.getLong(1) === 4L) // matched rows
    assert(rep.getLong(2) === 2L) // both deliveries rewrote
    // post-delete == fresh committed write without the victims
    val fresh = java.nio.file.Files.createTempDirectory("graft_tkdn_ev2")
      .toString + "/t"
    Layout.writeEventsByDayCommitted(
      ev.filter(!col("event_id").isin(victims: _*)), fresh)
    def read(p: String): Set[Seq[Any]] =
      rows(Layout.readDataLayout(spark, p)
        .select("event_id", "user_id", "event_type", "value", "event_date"))
        .toSet
    assert(read(root) === read(fresh))
    assert(read(root).nonEmpty)
    // day pruning still works over the post-delete layout
    val d0 = Layout.eventsBetweenCommitted(spark, root,
      "2024-01-01", "2024-01-01")
    assert(d0.select("event_date").distinct().count() === 1L)
    // pre-delete snapshots refuse after the mandatory vacuum
    preVersions.foreach { v =>
      intercept[IllegalArgumentException] {
        Layout.readDataLayout(spark, root, Some(v)).collect()
      }
    }
    // an absent victim set is a clean no-op
    assert(Layout.deleteFromDataLayout(spark, root, Seq("event_date"),
      "event_id", Seq(424242L)) === Layout.TakedownReport("data", 0L, 0L, 0L))
  }

  test("victim-frame join tier: a takedown set past the isin budget " +
      "flips discovery and rewrite to joins — rows identical to the " +
      "isin tier") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val tmp = java.nio.file.Files.createTempDirectory("graft_tkdn_vf")
      .toString
    Layout.writeEventsByDayCommitted(ev, s"$tmp/a")
    Layout.writeEventsByDayCommitted(ev, s"$tmp/b")
    val victims = ev.filter(col("event_id") % 5 === 1)
      .select("event_id").collect().map(_.getLong(0)).toSeq
    val ra = Layout.deleteFromDataLayout(spark, s"$tmp/a",
      Seq("event_date"), "event_id", victims) // isin tier (under budget)
    val rb = Layout.deleteFromDataLayout(spark, s"$tmp/b",
      Seq("event_date"), "event_id", victims,
      victimFrameMaxIds = 1) // forced join tier
    assert(ra.nMatchedRows === rb.nMatchedRows && ra.nMatchedRows > 0L)
    assert(ra.nRewrittenDeliveries === rb.nRewrittenDeliveries)
    def read(p: String): Set[Seq[Any]] =
      rows(Layout.readDataLayout(spark, p)
        .select("event_id", "user_id", "event_type", "value")).toSet
    assert(read(s"$tmp/a") === read(s"$tmp/b"))
    assert(read(s"$tmp/a").nonEmpty)
  }

  test("z-ordered layout takedown: rows vanish, the envelope mart " +
      "refreshes, and the envelope-pruned read stays EXACT over the " +
      "post-delete files") {
    val o = graft.Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val xCol = col("o_custkey")
    val yCol = datediff(to_date(col("o_orderdate")),
      lit("1990-01-01").cast("date"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_tkdn_z")
      .toString
    val (root, env) = (s"$tmp/z", s"$tmp/env")
    Zorder.writeZorderedCommitted(o, root, xCol, yCol, nFiles = 16)
    Zorder.writeFileEnvelopes(spark, root, env, xCol, yCol)
    val victims = o.filter(col("o_orderkey") % 11 === 3)
      .select("o_orderkey").collect().map(_.getLong(0)).toSeq
    assert(victims.nonEmpty)
    val rep = Zorder.deleteFromZorderedLayout(spark, root, env, xCol, yCol,
      "o_orderkey", victims)
    assert(rep.kind === "data" && rep.nMatchedRows === victims.size.toLong)
    // rows vanished, everything else intact
    val back = Layout.readDataLayout(spark, root)
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val expect = o.filter(!col("o_orderkey").isin(victims: _*))
    assert(back.exceptAll(expect).unionByName(expect.exceptAll(back))
      .count() === 0L)
    // the refreshed envelope mart names only live files, and the pruned
    // read == the exact filter over the post-delete layout
    val bounds = o.agg(
      min(xCol.cast("long")).as("x_mn"), max(xCol.cast("long")).as("x_mx"),
      min(yCol.cast("long")).as("y_mn"), max(yCol.cast("long")).as("y_mx"))
      .collect().head
    def mid(mn: Long, mx: Long, f: Double): Long =
      mn + math.floor((mx - mn).toDouble * f).toLong
    val (xMn, xMx) = (bounds.getLong(0), bounds.getLong(1))
    val (yMn, yMx) = (bounds.getLong(2), bounds.getLong(3))
    val (rowsDf, scanned, total) = Zorder.envelopePrunedReadDist(spark,
      root, env, xCol, yCol,
      mid(xMn, xMx, 0.45), mid(xMn, xMx, 0.55),
      mid(yMn, yMx, 0.45), mid(yMn, yMx, 0.55))
    val exact = expect.filter(
      xCol.cast("long").between(mid(xMn, xMx, 0.45), mid(xMn, xMx, 0.55)) &&
        yCol.cast("long").between(mid(yMn, yMx, 0.45), mid(yMn, yMx, 0.55)))
    assert(rowsDf.select("o_orderkey").exceptAll(exact.select("o_orderkey"))
      .unionByName(exact.select("o_orderkey")
        .exceptAll(rowsDf.select("o_orderkey"))).count() === 0L)
    assert(scanned < total)
  }

  test("takedownSearchRoot: one call scrubs a full serving root — the " +
      "lexical leg and the ANN leg both drop the victims") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft_tkdn_root")
      .toString + "/serve"
    Selection.writeBm25Index(docs, root)
    // the ANN leg keyed by the SAME id space (the serving convention)
    val rng = new scala.util.Random(7)
    val vecs = docs.select("doc_id").collect().map(_.getLong(0)).toSeq
      .map(id => (id, Seq.fill(16)((rng.nextGaussian()).toFloat), 0))
      .toDF("vec_id", "embedding", "label")
    Selection.writeIvfadcIndex(vecs, nlist = 4, s"$root/ann")
    val victims = docs.filter(col("doc_id") % 17 === 5)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val reports = Selection.takedownSearchRoot(spark, root, victims)
    assert(reports.map(_.kind) === Seq("bm25", "ivfadc"))
    assert(reports.forall(_.nMatchedRows > 0L))
    // both serving legs are victim-free
    val hits = Selection.bm25SearchIndex(spark, root,
        Seq("hash", "join", "window"), topK = 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(hits.nonEmpty && hits.intersect(victims.toSet).isEmpty)
    val annIds = spark.read.parquet(s"$root/ann/codes")
      .filter(Layout.committedBatchFilter(spark, s"$root/ann"))
      .select("vec_id").distinct().collect().map(_.getLong(0)).toSet
    assert(annIds.nonEmpty && annIds.intersect(victims.toSet).isEmpty)
    // a root without an ANN leg takes the lexical-only path
    val lexOnly = java.nio.file.Files
      .createTempDirectory("graft_tkdn_root2").toString + "/serve"
    Selection.writeBm25Index(docs, lexOnly)
    assert(Selection.takedownSearchRoot(spark, lexOnly, victims)
      .map(_.kind) === Seq("bm25"))
  }

  test("geometry rebuild after takedown: retrainIvfadcAfterTakedown == a " +
      "fresh writeIvfadcIndex over corpus-minus-victims, table for table; " +
      "pre-retrain snapshots refuse") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val tmp = java.nio.file.Files.createTempDirectory("graft_tkdn_geom")
      .toString
    val (root, fresh) = (s"$tmp/idx", s"$tmp/fresh")
    Selection.writeIvfadcIndex(emb, nlist = 8, root)
    val preVersions = Layout.manifestVersions(spark, root)
    val victims = emb.filter(col("vec_id") % 13 === 2)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(victims.nonEmpty)
    Selection.retrainIvfadcAfterTakedown(spark, root, emb, victims,
      nlist = 8)
    Selection.writeIvfadcIndex(
      emb.filter(!col("vec_id").isin(victims: _*)), nlist = 8, fresh)
    def table(base: String, t: String): org.apache.spark.sql.DataFrame =
      spark.read.parquet(s"$base/$t")
    Seq("cents", "codebook", "codes").foreach { t =>
      val a = table(root, t)
      val b = table(fresh, t)
      assert(a.exceptAll(b).unionByName(b.exceptAll(a)).count() === 0L,
        s"table $t differs between retrained and fresh roots")
      assert(a.count() > 0L)
    }
    // no victim code row survived the retrain — including on disk: the
    // rebuild's static overwrite replaced every data file, so there is no
    // victim-bearing byte left for ANY read path to reach (resetCommitLog
    // restarts history at version 1 — the new v1 describes the retrained
    // snapshot, never the old one)
    assert(table(root, "codes").filter(col("vec_id").isin(victims: _*))
      .count() === 0L)
    assert(Layout.manifestVersions(spark, root) === Seq(1L))
    assert(preVersions === Seq(1L))
  }

  test("vacuum grace ages by SUPERSESSION time, not delivery write time: " +
      "an old delivery superseded a moment ago is spared; a fresh " +
      "delivery superseded long ago is reclaimed") {
    val root = java.nio.file.Files.createTempDirectory("graft_grace2")
      .toString + "/t"
    def deliver(v: String): Long = {
      val p = Layout.beginBatchCommit(spark, root, 0L)
      Seq((1L, v)).toDF("id", "t").withColumn("batch_id", lit(p))
        .write.partitionBy("batch_id").mode("append").parquet(s"$root/t")
      Layout.finishBatchCommit(spark, root, p)
      p
    }
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dayMs = 24L * 3600 * 1000

    val p1 = deliver("v1")
    // the delivery DIRECTORY is 10 days old...
    val dir1 = new org.apache.hadoop.fs.Path(s"$root/t/batch_id=$p1")
    fs.setTimes(dir1, System.currentTimeMillis() - 10 * dayMs, -1)
    // ...but it is superseded only NOW
    deliver("v2")
    // mtime-aged grace would reclaim it out from under a reader that
    // planned against v1 seconds ago; supersession-aged grace spares it
    assert(Layout.vacuumLayout(spark, root, keepVersions = 1,
      minAgeMs = 3600L * 1000) === 0L)
    assert(fs.exists(dir1), "old-mtime delivery reclaimed inside grace")

    // the mirror case: superseded LONG ago (the superseding manifest is
    // old), written recently — no live reader can still hold it, so the
    // window must not spare it forever
    val vMax = Layout.manifestVersions(spark, root).max
    val supersedingManifest = new org.apache.hadoop.fs.Path(
      s"$root/_commits", f"manifest-$vMax%020d")
    fs.setTimes(supersedingManifest,
      System.currentTimeMillis() - 10 * dayMs, -1)
    assert(Layout.vacuumLayout(spark, root, keepVersions = 1,
      minAgeMs = 3600L * 1000) === 1L)
    assert(!fs.exists(dir1))
  }

  // doc_id and doc_id+ImgTwinOffset render IDENTICAL images — the "same
  // image re-crawled under a fresh doc_id" fixture (Multimodal's doc).
  private val ImgTwinOffset = Multimodal.ImgTwinOffset

  test("media takedown registry: a re-crawled copy of a taken-down image " +
      "is refused at ingest and audited; replay decides identically; " +
      "non-victim re-crawls and fresh images ingest") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val base = (1L to 8L).map(i => doc(i, "img base text " + i, "s1"))
      .toDF(cols: _*)
    val root = java.nio.file.Files.createTempDirectory("graft_tkdn_mreg")
      .toString + "/idx"
    Multimodal.writeAhashIndex(base, root)
    val rep = Multimodal.deleteDocsFromAhashIndex(spark, root, Seq(3L, 5L))
    assert(rep.nMatchedRows > 0L)
    // registry captured the victims' fingerprints (one-way, no pixels)
    assert(singleCol[Long](Multimodal.ahashTakedownRegistry(spark, root)
      .select("doc_id").orderBy("doc_id")) === Seq(3L, 5L))
    // delta: victim re-crawl (identical image, fresh id), non-victim
    // re-crawl (image still served — an index ingests it), fresh image
    val delta = Seq(
      doc(3L + ImgTwinOffset, "img base text 3", "d"), // blocked
      doc(4L + ImgTwinOffset, "img base text 4", "d"), // ingests
      doc(1000L, "fresh image text padded out", "d"))  // ingests
      .toDF(cols: _*)
    def committedIds(p: String): Set[Long] =
      spark.read.parquet(s"$p/bands")
        .filter(Layout.committedBatchFilter(spark, p))
        .select("doc_id").collect().map(_.getLong(0)).toSet
    Multimodal.appendToAhashIndex(delta, root, batchId = 0L)
    def audit(): Seq[Seq[Any]] =
      rows(Multimodal.ahashAdmissionLog(spark, root)
        .orderBy("batch", "source"))
    assert(audit() === Seq(Seq(0L, "d", 2L, 1L)),
      s"expected (ingested=2, blocked=1): ${audit()}")
    val post = committedIds(root)
    assert(!post.contains(3L + ImgTwinOffset),
      "a re-crawled copy of taken-down content re-entered the index")
    assert(post.contains(4L + ImgTwinOffset) && post.contains(1000L))
    // replay: a re-driven delivery of the same logical batch decides and
    // lands byte-identically (the q193 invariant, media modality)
    Multimodal.appendToAhashIndex(delta, root, batchId = 0L)
    assert(audit() === Seq(Seq(0L, "d", 2L, 1L)))
    assert(committedIds(root) === post)
  }

  test("media registry near escalation + sized consult: nearCopyBlock " +
      "blocks Hamming-near fingerprints; over-budget lane flips to the " +
      "shuffled tier with the blocked set unchanged; the registry rides " +
      "compaction and rebuild, and rebuild refuses a victim-bearing corpus") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val base = (1L to 8L).map(i => doc(i, "img base text " + i, "s1"))
      .toDF(cols: _*)
    def build(near: Boolean): String = {
      val r = java.nio.file.Files.createTempDirectory("graft_tkdn_mnear")
        .toString + "/idx"
      Multimodal.writeAhashIndex(base, r)
      Multimodal.deleteDocsFromAhashIndex(spark, r, Seq(3L),
        nearCopyBlock = near)
      r
    }
    val exactRoot = build(near = false)
    val nearRoot = build(near = true)
    // fabricated probe feats: the victim's exact fingerprint, a 1-bit
    // neighbor, and a far fingerprint
    val vfp = Multimodal.ahashTakedownRegistry(spark, nearRoot)
      .select("ahash_b0", "ahash_b1", "ahash_b2", "ahash_b3")
      .head().toSeq.map(_.asInstanceOf[Long])
    val feats = Seq(
      (100L, vfp(0), vfp(1), vfp(2), vfp(3)),              // exact
      (101L, vfp(0) ^ 1L, vfp(1), vfp(2), vfp(3)),         // hamming 1
      (102L, ~vfp(0) & 0xFFFFL, ~vfp(1) & 0xFFFFL,
        ~vfp(2) & 0xFFFFL, ~vfp(3) & 0xFFFFL))             // far
      .toDF("doc_id", "ahash_b0", "ahash_b1", "ahash_b2", "ahash_b3")
    def blockedAt(p: String, budget: Long): Set[Long] =
      Multimodal.ahashRegistryBlockedIds(spark, p, feats, 3, budget)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val dflt = graft.llm.Dedup.DefaultRegistryBroadcastMaxRows
    assert(blockedAt(exactRoot, dflt) === Set(100L),
      "exact tier must block only the identical fingerprint")
    assert(blockedAt(nearRoot, dflt) === Set(100L, 101L),
      "near escalation must also block the Hamming-1 neighbor")
    // sized flip: budget 0 degrades the lane joins to the shuffled tier
    // with an identical blocked set (the Dedup strategy-flip law)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val small = Multimodal.ahashRegistryBlockedIds(spark, nearRoot,
        feats, 3, dflt)
      val big = Multimodal.ahashRegistryBlockedIds(spark, nearRoot,
        feats, 3, 0L)
      assert(small.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
      val bigPlan = big.queryExecution.executedPlan.toString
      assert(!bigPlan.contains("BroadcastHashJoin") &&
        bigPlan.contains("ShuffledHashJoin"))
      assert(big.select("doc_id").collect().map(_.getLong(0)).toSet ===
        Set(100L, 101L))
    } finally spark.conf.set(key, prev)
    // compaction carry: the compacted root still refuses
    val out = java.nio.file.Files.createTempDirectory("graft_tkdn_mcmp")
      .toString + "/idx"
    Multimodal.compactAhashIndex(spark, nearRoot, out)
    assert(blockedAt(out, dflt) === Set(100L, 101L),
      "the registry did not ride compaction")
    // rebuild carry: a clean-corpus rebuild keeps the standing block...
    val clean = base.filter(col("doc_id") =!= 3L)
    Multimodal.writeAhashIndex(clean, nearRoot)
    assert(blockedAt(nearRoot, dflt) === Set(100L, 101L),
      "the registry did not survive the rebuild")
    // ...a victim-bearing corpus REFUSES before touching the root...
    val preIds = spark.read.parquet(s"$nearRoot/bands")
      .filter(Layout.committedBatchFilter(spark, nearRoot))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val recrawl = clean.unionByName(
      Seq(doc(3L + ImgTwinOffset, "img base text 3", "s1")).toDF(cols: _*))
    intercept[IllegalArgumentException] {
      Multimodal.writeAhashIndex(recrawl, nearRoot)
    }
    assert(spark.read.parquet(s"$nearRoot/bands")
      .filter(Layout.committedBatchFilter(spark, nearRoot))
      .select("doc_id").collect().map(_.getLong(0)).toSet === preIds,
      "the refused rebuild mutated the root")
    // ...and dropTakedowns=true is the explicit end of the obligations
    Multimodal.writeAhashIndex(recrawl, nearRoot, dropTakedowns = true)
    assert(blockedAt(nearRoot, dflt) === Set.empty[Long])
  }

  test("minhash rebuild carries the takedown registry: a stale-corpus " +
      "rebuild keeps re-crawls blocked (and quarantined paraphrases " +
      "refused); a victim-bearing corpus refuses; dropTakedowns=true " +
      "explicitly ends the obligations") {
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val tLong = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango"
    val tNear = tLong + " extra"
    val base = Seq(doc(40L, tLong, "s1"), doc(60L, t3, "s2"))
      .toDF(cols: _*)
    val root = java.nio.file.Files.createTempDirectory("graft_tkdn_rbld")
      .toString + "/idx"
    graft.llm.Dedup.writeMinhashIndex(base, root)
    graft.llm.Dedup.deleteDocsFromMinhashIndex(spark, root, Seq(40L),
      nearCopyBlock = true)
    // REBUILD from a stale corpus snapshot (victim already purged): the
    // registry must carry, or the takedown silently evaporates
    val clean = Seq(doc(60L, t3, "s2"), doc(61L, t4, "s2")).toDF(cols: _*)
    graft.llm.Dedup.writeMinhashIndex(clean, root)
    val delta = Seq(
      doc(100L, tLong, "d"),  // exact re-crawl → blocked (registry)
      doc(101L, tNear, "d"),  // paraphrase → blocked (quarantine)
      doc(102L, t5, "d"))     // fresh → admitted
      .toDF(cols: _*)
    graft.llm.Dedup.admitIntoMinhashIndex(spark, delta, root, 0L)
    assert(rows(graft.llm.Dedup.admissionLog(spark, root)
      .select("n_admitted", "n_rejected", "n_skipped", "n_blocked")) ===
      Seq(Seq(1L, 0L, 0L, 2L)))
    // a victim-bearing corpus refuses, leaving the root intact
    val recrawl = clean.unionByName(
      Seq(doc(200L, tLong, "s9")).toDF(cols: _*))
    intercept[IllegalArgumentException] {
      graft.llm.Dedup.writeMinhashIndex(recrawl, root)
    }
    assert(singleCol[Long](
      graft.llm.Dedup.takedownRegistry(spark, root).select("doc_id"))
      === Seq(40L), "the refused rebuild damaged the registry")
    // the explicit acknowledgment drops the lanes; the re-crawl admits
    graft.llm.Dedup.writeMinhashIndex(recrawl, root, dropTakedowns = true)
    assert(graft.llm.Dedup.takedownRegistry(spark, root).count() === 0L)
    graft.llm.Dedup.admitIntoMinhashIndex(spark,
      Seq(doc(300L, t6, "d2")).toDF(cols: _*), root, 1L)
    assert(rows(graft.llm.Dedup.admissionLog(spark, root)
      .select("n_admitted", "n_rejected", "n_skipped", "n_blocked")) ===
      Seq(Seq(1L, 0L, 0L, 0L)))
  }
}
