package graft

import org.apache.spark.sql.SparkSession

import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface of the native kernels: a session built with
  * GraftExtensions can call them from SQL text. (Own session — extensions
  * bind at session build time.) */
class GraftExtensionsSpec extends AnyFunSuite {

  // getOrCreate() would reuse the shared extension-less test session, so
  // temporarily clear the default, build an extended session, and restore.
  private lazy val spark: SparkSession = {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    prevDefault.foreach(SparkSession.setDefaultSession)
    prevActive.foreach(SparkSession.setActiveSession)
    s
  }

  test("native kernels callable from SQL") {
    assert(spark.sql("SELECT graft_hash60('hello')").collect().head.getLong(0) ===
      419982666956583591L)
    assert(spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))")
      .collect().head.getDouble(0) === 11.0)
    assert(spark.sql(
      "SELECT graft_sorted_isect(array(1L, 3L, 5L), array(3L, 5L, 7L))")
      .collect().head.getLong(0) === 2L)
    assert(spark.sql(
      "SELECT graft_simhash32(array(3L))").collect().head.getLong(0) === 3L)
    // kernel == the equivalent built-in spelling, from SQL text
    assert(spark.sql(
      "SELECT graft_shingle_hashes(array('a','b','c'), 2)").collect()
      .head.getSeq[Long](0) ===
      Seq("a b", "b c").map(s => spark.sql(s"SELECT graft_hash60('$s')")
        .collect().head.getLong(0)))
    assert(spark.sql(
      "SELECT graft_chargram_hashes('abc', 2)").collect()
      .head.getSeq[Long](0) ===
      Seq("ab", "bc").map(s => spark.sql(s"SELECT graft_hash60('$s')")
        .collect().head.getLong(0)))
  }

  test("kernel shape parameters must be constant (non-foldable args rejected)") {
    val e = intercept[Exception] {
      spark.sql(
        "SELECT graft_chargram_hashes('abc', CAST(rand() * 2 + 2 AS INT))").collect()
    }
    assert(e.getMessage.contains("literal"))
  }
}
