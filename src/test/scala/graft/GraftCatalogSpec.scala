package graft

import graft.sec.SecDerive

/** The SQL front door: registered views answer pure-SQL versions of the
  * API queries, matching the DataFrame operators they mirror. */
class GraftCatalogSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("the screener runs as pure SQL over the registered views") {
    GraftCatalog.registerViews(spark, dir)
    val sql = spark.sql("""
      SELECT c.ticker, c.name, r.cik, r.fiscal_year, r.roe, r.fcf_margin, r.net_margin
      FROM ratios_annual r JOIN companies c ON c.cik = r.cik
      WHERE r.roe >= 0.5 AND r.net_margin >= 0.2
      ORDER BY r.fiscal_year DESC, r.roe DESC NULLS LAST, r.cik ASC
      LIMIT 25""")
    val op = ops.Screener.screener(
      SecDerive.ratiosV3(spark, dir), SecDerive.companies(spark, dir),
      ops.Screener.ScreenerParams(minRoe = Some(0.5),
        minNetMargin = Some(0.2), limit = 25))
    assert(rows(sql) === rows(op))
  }

  test("marts and raw tables are all addressable; kernels work in the same session") {
    GraftCatalog.registerViews(spark, dir)
    assert(spark.sql("SELECT count(*) FROM statements_annual").head.getLong(0) > 0)
    assert(spark.sql("SELECT count(*) FROM documents").head.getLong(0) > 0)
    val h = spark.sql("SELECT graft_hash60('hello') AS h").head.getLong(0)
    assert(h === 419982666956583591L) // pinned cross-engine hash60 value
    // the curated-corpus view serves the q86 pipeline's output contract
    val curated = spark.sql(
      "SELECT lang, count(*) AS n FROM corpus_curated GROUP BY lang")
    assert(curated.collect().map(_.getLong(1)).sum > 0)
    assert(spark.sql("SELECT * FROM corpus_curated WHERE source = 'src1'")
      .count() === 0) // benchmark source never reaches the training corpus
  }

  test("corpus_splits view: exhaustive, disjoint, and leakage-free in pure SQL") {
    GraftCatalog.registerViews(spark, dir, withSplitsMart = true)
    // every doc gets exactly one split from the closed set
    val n = spark.sql("SELECT count(*) FROM corpus_splits").head.getLong(0)
    assert(n === spark.sql("SELECT count(*) FROM documents").head.getLong(0))
    assert(spark.sql(
      "SELECT count(*) FROM corpus_splits WHERE split NOT IN ('train','val','test')")
      .head.getLong(0) === 0L)
    // the leakage audit as a consumer would write it
    val leak = spark.sql("""
      SELECT max(nsp) FROM (
        SELECT cluster_key, count(DISTINCT split) AS nsp
        FROM corpus_splits GROUP BY cluster_key)""").head.getLong(0)
    assert(leak === 1L)
  }

  test("events view carries a real timestamp column, not raw nanos longs") {
    GraftCatalog.registerViews(spark, dir)
    val tsField = spark.table("events").schema("ts")
    assert(tsField.dataType ===
      org.apache.spark.sql.types.TimestampType, tsField)
    assert(spark.sql("SELECT count(*) FROM events WHERE ts IS NOT NULL")
      .head.getLong(0) > 0)
  }
}
