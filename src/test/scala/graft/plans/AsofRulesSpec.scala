package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PushLeftFilterThroughAsof: left conjuncts sink below the as-of node
  * (and on into the scan), right/mixed conjuncts stay above, results are
  * unchanged. */
class AsofRulesSpec extends SparkSpec {
  import spark.implicits._

  private val quotes = Seq(("A", 10L, 1.0), ("A", 20L, 2.0), ("B", 15L, 9.0))
    .toDF("q_ticker", "q_t", "px")
  private val trades = Seq((1L, "A", 5L), (2L, "A", 10L), (3L, "A", 25L),
    (4L, "B", 14L), (5L, "B", 16L))
    .toDF("trade_id", "ticker", "t")

  private def asof = AsofMerge.join(trades, quotes,
    Seq("ticker"), Seq("q_ticker"), "t", "q_t")

  test("left-only filter sinks below the as-of node") {
    val df = asof.filter(col("trade_id") >= 3L)
    val optimized = df.queryExecution.optimizedPlan
    // no Filter remains above the join node...
    assert(!optimized.isInstanceOf[Filter])
    // ...and the join's left child carries the pushed predicate
    val j = optimized.collectFirst { case a: AsofMergeJoinPlan => a }.get
    assert(j.left.toString.contains("trade_id"))
    assert(rows(df.orderBy("trade_id")).map(_.head) === Seq(3L, 4L, 5L))
  }

  test("right-side filter stays above (pushing would change the match)") {
    val df = asof.filter(col("px") > 1.0) // references the RIGHT output
    val optimized = df.queryExecution.optimizedPlan
    assert(optimized.isInstanceOf[Filter])
    val j = optimized.collectFirst { case a: AsofMergeJoinPlan => a }.get
    assert(!j.right.toString.contains("px > "))
    // semantics: trade 2 matched px=1.0 and is filtered OUT (not rematched)
    assert(rows(df.select("trade_id").orderBy("trade_id")).map(_.head) === Seq(3L, 5L))
  }

  test("mixed conjunction splits: left part sinks, rest stays") {
    val df = asof.filter(col("trade_id") >= 2L && col("px") > 1.0)
    val optimized = df.queryExecution.optimizedPlan
    val top = optimized.asInstanceOf[Filter]
    assert(top.condition.toString.contains("px"))
    assert(!top.condition.toString.contains("trade_id"))
    val j = optimized.collectFirst { case a: AsofMergeJoinPlan => a }.get
    assert(j.left.toString.contains("trade_id"))
  }

  test("pushed predicate reaches a parquet scan through the as-of node") {
    val dir = "/root/testdata/sf0.001"
    val facts = graft.sec.SecDerive.facts(spark, dir)
      .select("fact_id", "cik", "filed")
    val filings = graft.sec.SecDerive.filings(spark, dir)
      .select(col("cik").as("f_cik"), col("filing_date"), col("accession_no"))
    val joined = AsofMerge.join(facts, filings,
      Seq("cik"), Seq("f_cik"), "filed", "filing_date")
      .filter(col("fact_id") < 100L)
    val exec = joined.queryExecution.executedPlan.toString
    assert(exec.contains("PushedFilters: [IsNotNull(l_orderkey)")
      || exec.contains("LessThan") || exec.contains("fact_id"), exec)
    assert(joined.count() === joined.filter(col("fact_id") < 100L).count())
  }
}
