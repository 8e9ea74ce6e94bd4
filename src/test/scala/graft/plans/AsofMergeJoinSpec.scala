package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The custom as-of merge join (LogicalPlan + Strategy + SparkPlan):
  * semantics vs hand-computed truth and vs the composition spelling, plan
  * shape, and unmatched-row behavior. */
class AsofMergeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val quotes = Seq(("A", 10L, 1.0), ("A", 20L, 2.0), ("B", 15L, 9.0))
    .toDF("q_ticker", "q_t", "px")
  private val trades = Seq((1L, "A", 5L), (2L, "A", 10L), (3L, "A", 25L),
    (4L, "B", 14L), (5L, "C", 99L))
    .toDF("trade_id", "ticker", "t")

  test("latest right at-or-before left time, per key; unmatched rows null") {
    val out = AsofMerge.join(trades, quotes,
      Seq("ticker"), Seq("q_ticker"), "t", "q_t")
      .select("trade_id", "px").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L) === None)        // before any quote
    assert(out(2L) === Some(1.0))   // equal timestamp: inclusive <=
    assert(out(3L) === Some(2.0))   // latest of two
    assert(out(4L) === None)        // B's only quote is later
    assert(out(5L) === None)        // key with no right rows at all
  }

  test("mismatched key/time types are rejected at construction") {
    val datedQuotes = quotes.withColumn("q_t", to_date(lit("2020-01-01")))
    val e = intercept[IllegalArgumentException] {
      AsofMerge.join(trades, datedQuotes,
        Seq("ticker"), Seq("q_ticker"), "t", "q_t")
    }
    assert(e.getMessage.contains("time types must match"))
    val intKeyTrades = trades.withColumn("ticker", lit(1))
    val e2 = intercept[IllegalArgumentException] {
      AsofMerge.join(intKeyTrades, quotes,
        Seq("ticker"), Seq("q_ticker"), "t", "q_t")
    }
    assert(e2.getMessage.contains("key types must match"))
  }

  test("NULL times match nothing on either side (DuckDB ASOF semantics)") {
    val nullQuotes = Seq(("A", Some(10L), 1.0), ("A", None, 777.0),
      ("B", None, 888.0)).toDF("q_ticker", "q_t", "px")
    val nullTrades = Seq((1L, "A", Some(5L)), (2L, "A", Some(12L)),
      (3L, "A", None), (4L, "B", Some(20L))).toDF("trade_id", "ticker", "t")
    val out = AsofMerge.join(nullTrades, nullQuotes,
      Seq("ticker"), Seq("q_ticker"), "t", "q_t")
      .select("trade_id", "px").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L) === None)        // before A's only real quote
    assert(out(2L) === Some(1.0))   // real quote wins; null-time row ignored
    assert(out(3L) === None)        // null left time: no match even with history
    assert(out(4L) === None)        // B has only a null-time quote
  }

  test("empty right side: every left row emits with nulls") {
    val out = AsofMerge.join(trades, quotes.limit(0),
      Seq("ticker"), Seq("q_ticker"), "t", "q_t")
    assert(out.count() === 5)
    assert(out.filter(col("px").isNotNull).count() === 0)
  }

  test("duplicate left timestamps each emit (left is never deduped)") {
    import spark.implicits._
    val dupTrades = Seq((1L, "A", 10L), (2L, "A", 10L), (3L, "A", 10L))
      .toDF("trade_id", "ticker", "t")
    val out = AsofMerge.join(dupTrades, quotes,
      Seq("ticker"), Seq("q_ticker"), "t", "q_t")
    val px = out.select("trade_id", "px").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(px === Map(1L -> 1.0, 2L -> 1.0, 3L -> 1.0))
  }

  test("survives pre-shuffled inputs (exchanges re-cluster both sides)") {
    val out = AsofMerge.join(trades.repartition(7), quotes.repartition(3),
      Seq("ticker"), Seq("q_ticker"), "t", "q_t")
    assert(out.count() === 5) // every left row exactly once
    assert(out.filter(col("trade_id") === 3L).select("px").head.getDouble(0) === 2.0)
  }

  test("plans as the custom physical node with co-clustered sorted children") {
    val out = AsofMerge.join(trades, quotes,
      Seq("ticker"), Seq("q_ticker"), "t", "q_t")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("AsofMergeJoin"), s"custom node missing:\n$plan")
    assert(plan.contains("Sort") && plan.contains("Exchange hashpartitioning"),
      s"expected per-side cluster+sort:\n$plan")
  }

  test("AQE coalescing keeps both sides on ONE co-partitioning (zipPartitions-safe)") {
    // Force AQE's post-shuffle coalescing as hard as possible: if the rule
    // ever coalesced the two exchanges independently, zipPartitions would
    // throw a partition-count mismatch — this pins that either AQE keeps the
    // sides aligned or skips the custom binary node entirely.
    val forced = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "256m")
    val prev = forced.map { case (k, _) => k -> spark.conf.getOption(k) }
    forced.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dir = "/root/testdata/sf0.001"
      val facts = graft.sec.SecDerive.facts(spark, dir)
        .select("fact_id", "cik", "filed")
      val filings = graft.ops.Statements.latestWins(Seq("cik", "filing_date"),
        Seq(col("accession_no").asc))(graft.sec.SecDerive.filings(spark, dir))
        .select(col("cik").as("f_cik"), col("filing_date"), col("accession_no"))
      val out = AsofMerge.join(facts.repartition(11), filings.repartition(5),
        Seq("cik"), Seq("f_cik"), "filed", "filing_date")
      val n = out.count() // executes (and finalizes) the adaptive plan
      assert(n === facts.count())
      out.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          val node = a.executedPlan.collectFirst { case e: AsofMergeJoinExec => e }
          assert(node.isDefined, s"exec missing from final plan:\n${a.executedPlan}")
          assert(node.get.left.outputPartitioning.numPartitions ===
            node.get.right.outputPartitioning.numPartitions,
            s"sides coalesced apart:\n${a.executedPlan}")
        case p =>
          val node = p.collectFirst { case e: AsofMergeJoinExec => e }
          assert(node.isDefined, s"exec missing from final plan:\n$p")
      }
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("agrees with the composition spelling on the SEC q41 shape") {
    val dir = "/root/testdata/sf0.001"
    val facts = graft.sec.SecDerive.facts(spark, dir)
      .select("fact_id", "cik", "filed")
    val filings = graft.ops.Statements.latestWins(Seq("cik", "filing_date"),
      Seq(col("accession_no").asc))(graft.sec.SecDerive.filings(spark, dir))
      .select(col("cik").as("f_cik"), col("filing_date"), col("accession_no"))
    val viaExec = AsofMerge.join(facts, filings,
      Seq("cik"), Seq("f_cik"), "filed", "filing_date")
      .select(col("fact_id"), col("accession_no").as("asof_accession_no"),
        col("filing_date").as("asof_filing_date"))
      .orderBy("fact_id").collect().map(_.toSeq).toSeq
    val viaWindow = graft.ops.AsofJoin.asof(facts,
      filings.withColumnRenamed("f_cik", "cik"),
      Seq("cik"), "filed", "filing_date",
      Seq("accession_no", "filing_date"),
      tieBreak = Seq(col("fact_id").asc_nulls_first))
      .select(col("fact_id"), col("asof_accession_no"), col("asof_filing_date"))
      .orderBy("fact_id").collect().map(_.toSeq).toSeq
    assert(viaExec === viaWindow)
  }
}
