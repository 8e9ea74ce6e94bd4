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
  }
}
