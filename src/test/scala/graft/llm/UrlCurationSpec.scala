package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** URL canonicalization: hand-pinned cases for every mess the derivation
  * injects, dedup grouping, and the host-stats arithmetic. */
class UrlCurationSpec extends SparkSpec {
  import spark.implicits._

  private def canonOf(urls: String*): Seq[(String, String, String)] = {
    val df = urls.toDF("url")
    val (c, h, d) = UrlCuration.canonicalize(col("url"))
    df.select(c.as("c"), h.as("h"), d.as("d")).collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
  }

  test("canonicalize: case, www, default port, fragment, tracking params") {
    val Seq((c, h, d)) = canonOf(
      "HTTPS://WWW.Blog.Example.COM:443/a/b?utm_source=x&z=1&utm_campaign=y&a=2#frag")
    assert(c === "https://blog.example.com/a/b?a=2&z=1") // params sorted, utm_* gone
    assert(h === "blog.example.com")
    assert(d === "example.com")
  }

  test("canonicalize: no query survives -> no '?'; trailing slash trimmed") {
    val Seq((c1, _, _)) = canonOf("https://a.example.org/p/?utm_source=x")
    assert(c1 === "https://a.example.org/p")
    val Seq((c2, _, _)) = canonOf("https://a.example.org/?utm_source=x")
    // root path: the (.)/$ rule keeps a bare '/'
    assert(c2 === "https://a.example.org/")
  }

  test("canonicalize: two spellings of one resource compare equal") {
    val Seq((a, _, _), (b, _, _)) = canonOf(
      "HTTPS://WWW.site.example.net:443/d/7?utm_campaign=x&id=3&ref=home#top",
      "https://site.example.net/d/7?ref=home&id=3&utm_source=rss")
    assert(a === b)
  }

  test("urlDedup groups by canonical url with min-id keeper") {
    val docs = Seq(
      (0L, "t", "en", "src0", 10L), (100L, "t", "en", "src0", 10L),
      (1L, "t", "en", "src1", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val mart = UrlCuration.urlMart(docs)
    val out = UrlCuration.urlDedup(mart).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // docs 0 and 100 agree on every canonical residue (path %100, id %20,
    // ref parity) but differ in case/www/params-order/fragment mess
    val dupGroup = out.filter(_._2._2 == 2L)
    assert(dupGroup.size === 1 && dupGroup.head._2._1 === 0L)
    assert(out.values.count(_._2 == 1L) === 1)
  }

  test("shard-merge law: merged partials == one-shot; cross-shard dup counted once") {
    // ids 0 and 100 canonicalize to the SAME url and land in DIFFERENT
    // parity shards — the case scalar-additive distinct counts get wrong
    val docs = Seq(
      (0L, "t", "en", "src0", 10L), (100L, "t", "en", "src0", 20L),
      (1L, "t", "en", "src1", 30L), (21L, "t", "en", "src1", 40L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val oneShot = UrlCuration.hostStats(UrlCuration.urlMart(docs))
      .orderBy("domain", "host").collect().toSeq
    val shards = Seq(docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1))
      .map(d => UrlCuration.hostStatsShard(UrlCuration.urlMart(d)))
    val merged = UrlCuration.hostStatsFromShards(
      UrlCuration.mergeHostStatsShards(shards))
      .orderBy("domain", "host").collect().toSeq
    assert(merged === oneShot)
    val src0 = merged.find(_.getAs[String]("host").startsWith("src0")).get
    assert(src0.getAs[Long]("n_docs") === 2L)
    assert(src0.getAs[Long]("n_urls") === 1L) // the cross-shard dup, once
    assert(src0.getAs[Long]("dup_share_micros") === 500000L)
    assert(src0.getAs[Boolean]("blocklist_candidate"))
  }

  test("curatedCorpus: dedup, dup-share blocklist, and per-host quota each bind") {
    // host src5 (ids = 5 mod 100): four copies of ONE canonical url ->
    // dup share 750000 >= 500000, blocklisted by the dup leg.
    // host src1 (ids = 1 mod 20, distinct mod 100): four distinct urls,
    // dup share 0, kept.
    val docs = Seq(
      (5L, "t", "en", "src5", 10L), (105L, "t", "en", "src5", 10L),
      (205L, "t", "en", "src5", 10L), (305L, "t", "en", "src5", 10L),
      (1L, "t", "en", "src1", 10L), (21L, "t", "en", "src1", 10L),
      (41L, "t", "en", "src1", 10L), (61L, "t", "en", "src1", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // quota above the host size: only dedup + blocklist act
    val kept = UrlCuration.curatedCorpus(docs, hostQuota = 10)
      .collect()
    assert(kept.forall(_.getAs[String]("host").startsWith("src1")),
      "dup-share-blocklisted host leaked through the chain")
    assert(kept.length === 4)
    // quota binds: cap 2 keeps exactly 2 of the surviving host's docs
    val capped = UrlCuration.curatedCorpus(docs, hostQuota = 2).collect()
    assert(capped.length === 2 &&
      capped.forall(_.getAs[String]("host").startsWith("src1")))
    // the avg-chars leg: a min length above src1's mean empties it too
    assert(UrlCuration.curatedCorpus(docs, hostQuota = 10,
      minAvgChars = 11L).isEmpty)
  }

  test("curatedCorpusPlanned: the ANALYZE mart flips the anti-join strategy " +
      "without scanning the blocklist; rows == the hinted chain") {
    val docs = Seq(
      (5L, "t", "en", "src5", 10L), (105L, "t", "en", "src5", 10L),
      (205L, "t", "en", "src5", 10L), (305L, "t", "en", "src5", 10L),
      (1L, "t", "en", "src1", 10L), (21L, "t", "en", "src1", 10L),
      (41L, "t", "en", "src1", 10L), (61L, "t", "en", "src1", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val mart = UrlCuration.urlMart(docs)
    val blocked = UrlCuration.hostBlocklist(UrlCuration.hostStats(mart), 0L)
    // the decision must come from the MART, not the data: hand the planner
    // fabricated stats rows and watch the plan move while the blocklist
    // frame (and its true size) stays untouched
    def stats(nRows: Long) =
      Seq(("host", nRows)).toDF("column_name", "n_rows")
    def planOf(nRows: Long): String = {
      val out = UrlCuration.curatedCorpusPlanned(docs, hostQuota = 10,
        blocked, stats(nRows))
      out.queryExecution.executedPlan.toString
    }
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1") // isolate the stats decision
      assert(planOf(2L).contains("BroadcastHashJoin"),
        "small-by-stats blocklist did not broadcast")
      val big = planOf(10000000L)
      assert(!big.contains("BroadcastHashJoin") &&
        (big.contains("SortMergeJoin") || big.contains("ShuffledHashJoin")),
        "huge-by-stats blocklist still broadcast")
    } finally spark.conf.set(key, prev)
    // either strategy, the hinted chain's rows (dup-share leg blocks src5)
    val planned = UrlCuration.curatedCorpusPlanned(docs, hostQuota = 10,
        blocked, stats(2L))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val hinted = UrlCuration.curatedCorpus(docs, hostQuota = 10)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(planned === hinted && planned.nonEmpty)
  }

  test("hostStats: dup share and avg chars in exact integer micros") {
    val docs = Seq(
      (0L, "t", "en", "src0", 10L), (20L, "t", "en", "src0", 20L),
      (40L, "t", "en", "src0", 31L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = UrlCuration.hostStats(UrlCuration.urlMart(docs)).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_docs") === 3L)
    // ids 0/20/40 share id%20=0; paths are 0, 20, 40 -> 3 distinct urls...
    // except 0 and 20 only differ mod 100, so all three paths distinct
    assert(r.getAs[Long]("n_urls") === 3L)
    assert(r.getAs[Long]("dup_share_micros") === 0L)
    assert(r.getAs[Long]("avg_chars") === 61L / 3L)
    assert(!r.getAs[Boolean]("blocklist_candidate"))
  }

  test("host-stats subtract == rebuild on surviving docs; underflow " +
      "refuses; the HLL tier refuses outright with the re-fold recipe") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val victims = docs.filter(col("doc_id") % 7 === 2)
    val survivors = docs.filter(col("doc_id") % 7 =!= 2)
    val maintained = UrlCuration.hostStatsShard(UrlCuration.urlMart(docs))
    val removed = UrlCuration.hostStatsShard(UrlCuration.urlMart(victims))
    val sub = UrlCuration.hostStatsFromShards(
      UrlCuration.subtractHostStatsShards(maintained, removed))
    val rebuilt = UrlCuration.hostStats(UrlCuration.urlMart(survivors))
    assert(sub.exceptAll(rebuilt).unionByName(rebuilt.exceptAll(sub))
      .count() === 0L)
    assert(rebuilt.count() > 0L)
    // underflow: removing MORE than the mart holds refuses loudly
    val overdraft = UrlCuration.hostStatsShard(
      UrlCuration.urlMart(docs.unionByName(victims)))
    val e = intercept[Exception](UrlCuration.subtractHostStatsShards(
      maintained, overdraft).collect())
    assert(e.getMessage.contains("underflow") ||
      (e.getCause != null && e.getCause.getMessage.contains("underflow")))
    // the sketch tier has no inverse: loud refusal naming the re-fold
    val hll = UrlCuration.hostStatsShardHll(UrlCuration.urlMart(docs))
    val rf = intercept[UnsupportedOperationException](
      UrlCuration.subtractHostStatsShardsHll(hll, hll))
    assert(rf.getMessage.contains("Re-fold"))
  }
}
