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
}
