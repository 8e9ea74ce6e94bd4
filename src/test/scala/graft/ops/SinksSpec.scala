package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** S7/S8: idempotent append and recompute-overwrite upsert against real
  * parquet directories (write twice, count once). */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("appendIfAbsent is idempotent: second identical batch appends 0 rows") {
    val path = tmpDir("graft_s7") + "/facts"
    val batch = Seq((1L, "a"), (2L, "b"), (2L, "b")).toDF("id", "v") // in-batch dup
    val empty = batch.limit(0)
    Sinks.appendIfAbsent(empty, batch, Seq("id"), path)
    val after1 = spark.read.parquet(path)
    assert(after1.count() === 2) // batch-level dedup applied
    assert(after1.columns.contains("created_at")) // X10 audit col
    Sinks.appendIfAbsent(spark.read.parquet(path), batch, Seq("id"), path)
    assert(spark.read.parquet(path).count() === 2) // re-run: nothing appended
    // a genuinely new key still lands
    Sinks.appendIfAbsent(spark.read.parquet(path),
      Seq((3L, "c")).toDF("id", "v"), Seq("id"), path)
    assert(spark.read.parquet(path).count() === 3)
  }

  test("upsertOverwrite replaces the table with the recomputed rows") {
    val path = tmpDir("graft_s8") + "/statements"
    Sinks.upsertOverwrite(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), path)
    assert(spark.read.parquet(path).count() === 2)
    Sinks.upsertOverwrite(Seq((1L, 11.0)).toDF("k", "v"), path) // recompute shrinks
    val after = spark.read.parquet(path)
    assert(after.count() === 1)
    assert(singleCol[Double](after.select("v")) === Seq(11.0))
    assert(after.columns.contains("updated_at")) // X10 audit col
  }

  test("dedupBatch keeps one row per natural key") {
    val batch = Seq(("A-1", 1), ("A-1", 1), ("A-2", 2)).toDF("accession_no", "x")
    assert(Sinks.dedupBatch(batch, Seq("accession_no")).count() === 2)
  }
}
