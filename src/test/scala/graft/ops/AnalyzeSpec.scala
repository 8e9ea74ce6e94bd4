package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ANALYZE stats collection: exact-tier values, the native min/max fold
  * (numeric order, not lexicographic), the wide-row shard-merge law, and
  * the ANALYZE PARQUET statement face. */
class AnalyzeSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, Some("en"), "web", Some(9L)),
    (2L, Some("en"), "web", Some(10L)),
    (3L, None, "books", Some(2L)),
    (4L, Some("fr"), "web", None),
    (5L, Some("fr"), "books", Some(100L))
  ).toDF("doc_id", "lang", "source", "n_chars")

  test("exact tier: counts, NDV, native-ordered min/max, tolerance boolean") {
    val rows = Analyze.columnStatsExact(fixture).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("doc_id", "lang", "source", "n_chars"))

    val nChars = rows("n_chars")
    assert(nChars.getLong(1) === 5L)   // n_rows
    assert(nChars.getLong(2) === 1L)   // null_count
    assert(nChars.getLong(3) === 4L)   // n_distinct (nulls excluded)
    // native numeric fold: min is 2 (not lexicographic "10"), max 100
    assert(nChars.getString(4) === "2" && nChars.getString(5) === "100")
    assert(nChars.getBoolean(6))       // HLL within tolerance at this n

    val lang = rows("lang")
    assert(lang.getLong(2) === 1L && lang.getLong(3) === 2L)
    assert(lang.getString(4) === "en" && lang.getString(5) === "fr")
  }

  test("shard-merge law: 3 hash shards merged == one-shot exactly") {
    val shards = (0 until 3).map(i =>
      Analyze.statsShard(fixture.where(pmod(col("doc_id"), lit(3)) === i)))
      .reduce(_ unionByName _)
    val merged = Analyze.statsFromShards(shards).collect().toSeq
    val oneShot = Analyze.columnStats(fixture).collect().toSeq
    assert(merged === oneShot)
  }

  test("ANALYZE PARQUET statement writes the mart and returns the audit row") {
    val in = Files.createTempDirectory("graft_analyze_in_").toString
    val out = Files.createTempDirectory("graft_analyze_out_").toString
    fixture.write.mode("overwrite").parquet(in)

    val audit = spark.sql(
      s"ANALYZE PARQUET '$in' INTO '$out' COLUMNS (doc_id, lang, n_chars)")
    assert(audit.columns.toSeq === Seq("n_cols", "n_rows"))
    val r = audit.head
    assert(r.getInt(0) === 3 && r.getLong(1) === 5L)

    val mart = spark.read.parquet(out).orderBy("column_name").collect().toSeq
    val direct = Analyze
      .columnStats(spark.read.parquet(in), Seq("doc_id", "lang", "n_chars"))
      .collect().toSeq
    assert(mart === direct)
    assert(mart.map(_.getString(0)) === Seq("doc_id", "lang", "n_chars").sorted)
  }

  test("ANALYZE ... HISTOGRAM statement writes the fixed-domain mart the " +
      "banded quantile reads exactly") {
    val in = Files.createTempDirectory("graft_hist_in_").toString
    val out = Files.createTempDirectory("graft_hist_out_").toString
    fixture.write.mode("overwrite").parquet(in)

    val audit = spark.sql(
      s"ANALYZE PARQUET '$in' INTO '$out' HISTOGRAM FOR n_chars " +
        "DOMAIN 0 TO 4096")
    assert(audit.columns.toSeq === Seq("n_bins", "n_rows"))
    assert(audit.head.getLong(1) === 4L) // the null n_chars row drops out

    // the statement-produced mart IS the histogramShard frame...
    val mart = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val direct = Quality
      .histogramShard(spark.read.parquet(in), col("n_chars"), 0L, 4096L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(mart === direct)

    // ...and the banded quantile read off it is the exact rank answer
    val viaMart = Quality.quantileFromHistogram(
      spark.read.parquet(out), spark.read.parquet(in), col("n_chars"),
      0.5, 0L, 4096L)
    assert(viaMart === Quality.exactQuantileBanded(
      spark.read.parquet(in), col("n_chars"), 0.5))

    // an empty domain refuses at parse/plan time
    val e = intercept[IllegalArgumentException](spark.sql(
      s"ANALYZE PARQUET '$in' INTO '$out' HISTOGRAM FOR n_chars " +
        "DOMAIN 9 TO 9"))
    assert(e.getMessage.contains("empty histogram domain"))
  }

  test("grouped quantile from bins: NULL group values are excluded, not a " +
      "false stale-histogram throw; non-null groups exact") {
    val docs = Seq(
      (1L, "en", 10L), (2L, "en", 20L), (3L, "en", 30L),
      (4L, "fr", 100L), (5L, "fr", 200L),
      (6L, null.asInstanceOf[String], 999L) // null group: excluded
    ).toDF("doc_id", "lang", "n_chars")
    val bins = Quality
      .groupedHistogramShard(docs, "lang", col("n_chars"), 0L, 4096L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(bins.forall(_._1 != null), "null group leaked into the bins")
    val out = Quality.groupedQuantileFromBins(bins, docs, "lang",
        col("n_chars"), 0.5, 0L, 4096L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out === Map("en" -> 20L, "fr" -> 100L))
    // the defensive filter: a stray null-group bins row (older shard
    // provenance) is ignored rather than read as a stale histogram
    val out2 = Quality.groupedQuantileFromBins(
        bins :+ (null.asInstanceOf[String], 0L, 1L), docs, "lang",
        col("n_chars"), 0.5, 0L, 4096L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out2 === out)
  }

  test("joinPlannedByStats: the mart drives the join strategy, not the data") {
    val dim = Seq((1L, "en"), (2L, "fr")).toDF("k", "v")
    val fact = Seq((1L, 10L), (2L, 20L), (1L, 30L)).toDF("k", "x")
    val stats = Analyze.columnStats(dim, Seq("k", "v"))
    def planOf(maxRows: Long): String =
      Analyze.joinPlannedByStats(fact, dim, stats, Seq("k"), maxRows)
        .queryExecution.executedPlan.toString
    // isolate the STATS decision: Spark's own size-based auto-broadcast
    // would hint this tiny fixture either way
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      // stats say 2 rows: under the budget -> broadcast join
      assert(planOf(1000000L).contains("BroadcastHashJoin"))
      // budget 0: stats rule the dim too big -> the shuffle join
      val big = planOf(0L)
      assert(!big.contains("BroadcastHashJoin") &&
        (big.contains("SortMergeJoin") || big.contains("ShuffledHashJoin")))
    } finally spark.conf.set(key, prev)
    // either strategy, same rows
    val viaStats = Analyze.joinPlannedByStats(fact, dim, stats, Seq("k"))
    assert(viaStats.orderBy("k", "x").collect().toSeq ===
      fact.join(dim, Seq("k")).orderBy("k", "x").collect().toSeq)
  }

  test("multiJoinPlannedByStats: fabricated mart sizes pin the join ORDER " +
      "and per-leg strategy; rows never move") {
    val fact = Seq((1L, "a1", 10L), (2L, "a2", 20L), (1L, "a1", 30L))
      .toDF("k", "acc", "x")
    val d1 = Seq((1L, "en"), (2L, "fr")).toDF("k", "v1")
    val d2 = Seq(("a1", 100L), ("a2", 200L)).toDF("acc", "v2")
    def mart(nRows: Long) =
      Seq((nRows, "k")).toDF("n_rows", "column_name")
    def planned(n1: Long, n2: Long) =
      Analyze.multiJoinPlannedByStats(fact, Seq(
        Analyze.PlannedDim(d1, mart(n1), Seq("k")),
        Analyze.PlannedDim(d2, mart(n2), Seq("acc"))),
        maxRows = 1000L)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      // d1 tiny (broadcast, joins FIRST = deepest), d2 "huge" (shuffle,
      // joins last = printed first in the top-down plan text)
      val p1 = planned(2L, 5000000L).queryExecution.executedPlan.toString
      assert(p1.contains("BroadcastHashJoin"))
      assert(p1.contains("SortMergeJoin") || p1.contains("ShuffledHashJoin"))
      val shuffledAt1 = math.max(p1.indexOf("SortMergeJoin"),
        p1.indexOf("ShuffledHashJoin"))
      assert(shuffledAt1 < p1.indexOf("BroadcastHashJoin"),
        "the small dim did not join deepest")
      // swap the fabricated sizes: the order AND the broadcast flip legs
      val p2 = planned(5000000L, 2L).queryExecution.executedPlan.toString
      val shuffledAt2 = math.max(p2.indexOf("SortMergeJoin"),
        p2.indexOf("ShuffledHashJoin"))
      assert(shuffledAt2 < p2.indexOf("BroadcastHashJoin"))
      // the deepest (first-applied) join key follows the smaller mart:
      // the broadcast side is d1 in p1 and d2 in p2
      assert(p1.indexOf("v1") > 0 && p2.indexOf("v2") > 0)
      // both dims over budget: no broadcast anywhere
      val p3 = planned(5000L, 5000L).queryExecution.executedPlan.toString
      assert(!p3.contains("BroadcastHashJoin"))
      // rows identical under every fabricated catalog (using-joins float
      // their keys to the front, so pin the projection before comparing)
      val cols = Seq("k", "acc", "x", "v1", "v2")
      val expect = fact.join(d1, Seq("k")).join(d2, Seq("acc"))
        .select(cols.map(col): _*).orderBy("k", "x").collect().toSeq
      Seq((2L, 5000000L), (5000000L, 2L), (5000L, 5000L)).foreach {
        case (a, b) =>
          assert(planned(a, b).select(cols.map(col): _*)
            .orderBy("k", "x").collect().toSeq === expect)
      }
    } finally spark.conf.set(key, prev)
  }

  test("statement without COLUMNS audits only non-string columns — " +
      "a text blob never lands in the mart by default") {
    val in = Files.createTempDirectory("graft_analyze_in2_").toString
    val out = Files.createTempDirectory("graft_analyze_out2_").toString
    // the payload column the default MUST exclude: short NAME, multi-KB body
    fixture
      .withColumn("text", concat(lit("x" * 4096), col("doc_id").cast("string")))
      .write.mode("overwrite").parquet(in)
    val r = spark.sql(s"analyze parquet '$in' into '$out';").head
    assert(r.getInt(0) === 2 && r.getLong(1) === 5L) // doc_id, n_chars
    val audited = spark.read.parquet(out)
      .select("column_name").collect().map(_.getString(0)).toSet
    assert(audited === Set("doc_id", "n_chars"))
    // explicit naming is still the opt-in for strings
    val out2 = Files.createTempDirectory("graft_analyze_out3_").toString
    val r2 = spark.sql(
      s"analyze parquet '$in' into '$out2' columns (lang, text)").head
    assert(r2.getInt(0) === 2)
  }

  test("joinPlannedByStats: a missing/empty stats mart degrades to the " +
      "shuffle join, never a crash") {
    val dim = Seq((1L, "en"), (2L, "fr")).toDF("k", "v")
    val fact = Seq((1L, 10L), (2L, 20L)).toDF("k", "x")
    val emptyStats = Analyze.columnStats(dim, Seq("k")).where(lit(false))
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val plan = Analyze.joinPlannedByStats(fact, dim, emptyStats, Seq("k"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"))
    } finally spark.conf.set(key, prev)
    assert(Analyze.joinPlannedByStats(fact, dim, emptyStats, Seq("k"))
      .orderBy("k").collect().map(_.getAs[Long]("x")).toSeq === Seq(10L, 20L))
  }

  test("stats-mart delete tiers: table-stats shards refuse subtraction " +
      "with the re-fold recipe (maxima have no inverse); re-folding the " +
      "surviving shards equals the rebuild; histogram underflow refuses") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val survivors = docs.filter(col("doc_id") % 7 =!= 2)
    val shardA = Analyze.statsShard(survivors.filter(col("doc_id") % 2 === 0))
    val shardB = Analyze.statsShard(survivors.filter(col("doc_id") % 2 =!= 0))
    // the refusal: no silent subtract of a register-bearing mart
    val e = intercept[UnsupportedOperationException](
      Analyze.subtractStatsShards(shardA, shardB))
    assert(e.getMessage.contains("Re-fold") ||
      e.getMessage.contains("re-fold") ||
      e.getMessage.contains("statsFromShards"))
    // the prescribed delete path: re-fold surviving shards == rebuild
    val refolded = Analyze.statsFromShards(shardA.unionByName(shardB))
    val rebuilt = Analyze.columnStats(survivors)
    assert(refolded.exceptAll(rebuilt).unionByName(rebuilt.exceptAll(refolded))
      .count() === 0L)
    // histogram tier: a removed frame the mart never held refuses loudly
    val hist = Quality.histogramShard(docs, col("n_chars"), 0L, 2000L)
    val foreign = Quality.histogramShard(
      docs.unionByName(docs), col("n_chars"), 0L, 2000L)
    val he = intercept[Exception](
      Quality.subtractHistogramShard(hist, foreign).collect())
    assert(he.getMessage.contains("underflow") ||
      (he.getCause != null && he.getCause.getMessage.contains("underflow")))
    // and the sound subtract equals the rebuild (q196's law, pinned here
    // at the frame level too)
    val removedShard = Quality.histogramShard(
      docs.filter(col("doc_id") % 7 === 2), col("n_chars"), 0L, 2000L)
    val sub = Quality.subtractHistogramShard(hist, removedShard)
    val freshHist = Quality.histogramShard(survivors, col("n_chars"),
      0L, 2000L)
    assert(sub.exceptAll(freshHist).unionByName(freshHist.exceptAll(sub))
      .count() === 0L)
  }
}
