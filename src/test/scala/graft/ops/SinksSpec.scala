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

  test("mergeLatestWins: batch wins under the order; re-merge is a no-op") {
    val order = Seq(col("ver").desc, col("v").asc)
    val existing = Seq(("k1", 1, "old"), ("k2", 1, "keep")).toDF("key", "ver", "v")
    val batch = Seq(("k1", 2, "new"), ("k3", 1, "ins")).toDF("key", "ver", "v")
    val merged = Sinks.mergeLatestWins(existing, batch, Seq("key"), order)
    val got = rows(merged.orderBy("key"))
    assert(got === Seq(Seq("k1", 2, "new"), Seq("k2", 1, "keep"), Seq("k3", 1, "ins")))
    // idempotence: merging the same batch into the merged state changes nothing
    val again = Sinks.mergeLatestWins(merged, batch, Seq("key"), order)
    assert(rows(again.orderBy("key")) === got)
  }

  // --- JDBC sink variants against embedded Derby (offline; ships with Spark) ---

  private val derbyProps = {
    val p = new java.util.Properties
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  test("jdbcAppendIfAbsent: creates, dedups, and is idempotent") {
    val url = "jdbc:derby:memory:graft_s7;create=true"
    val batch = Seq((1L, "a"), (2L, "b"), (2L, "b")).toDF("id", "v")
    Sinks.jdbcAppendIfAbsent(spark, url, "facts_t", batch, Seq("id"),
      props = derbyProps)
    def count() = spark.read.jdbc(url, "facts_t", derbyProps).count()
    assert(count() === 2) // table created, in-batch dup dropped
    Sinks.jdbcAppendIfAbsent(spark, url, "facts_t", batch, Seq("id"),
      props = derbyProps)
    assert(count() === 2) // re-run appended nothing
    Sinks.jdbcAppendIfAbsent(spark, url, "facts_t",
      Seq((3L, "c")).toDF("id", "v"), Seq("id"), props = derbyProps)
    assert(count() === 3) // new key lands
  }

  test("jdbcUpsertOverwrite replaces the table contents") {
    val url = "jdbc:derby:memory:graft_s8;create=true"
    Sinks.jdbcUpsertOverwrite(url, "stmts_t",
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), props = derbyProps)
    assert(spark.read.jdbc(url, "stmts_t", derbyProps).count() === 2)
    Sinks.jdbcUpsertOverwrite(url, "stmts_t",
      Seq((1L, 11.0)).toDF("k", "v"), props = derbyProps) // recompute shrinks
    val after = spark.read.jdbc(url, "stmts_t", derbyProps)
    assert(after.count() === 1)
    assert(singleCol[Double](after.select("v")) === Seq(11.0))
  }
}
