package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All tables are read straight from parquet so Catalyst's datasource V2
  * scan handles column pruning + predicate pushdown (verify with
  * `.explain("formatted")` — look for PushedFilters / ReadSchema).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // events needs the nanos-timestamp handling — the raw parquet read would
  // either fail ([PARQUET_TYPE_ILLEGAL]) or, with the legacy conf already
  // set session-wide, silently expose raw nanos longs instead of timestamps
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir) else loadRaw(spark, dir, name)

  private def loadRaw(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table carries TIMESTAMP(NANOS) parquet, which Spark's
    * vectorized reader rejects outright ([PARQUET_TYPE_ILLEGAL]). Read the
    * nanos as a long (legacy conf) and truncate to microseconds with integer
    * division — the same floor-truncation DuckDB applies reading the file,
    * so both engines see identical microsecond timestamps. (`div`, not `/`:
    * double division loses integer precision above 2^53 — epoch-nanos are
    * ~1.7e18.) */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    loadRaw(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Adaptive fan-out for under-split inputs: round-robin to the session's
    * shuffle parallelism ONLY when the plan arrives with fewer partitions.
    * On a real cluster a 100 TB corpus scan has thousands of splits and this
    * is a no-op (no exchange added); on the local bench a small parquet file
    * is ONE split, so every per-char/per-gram/per-vector fan-out downstream
    * of it runs single-threaded without this (measured: the q106 BPE trainer
    * spent 11.3 CPU-s at ~1.4 effective cores on a 32-core host; spreading
    * cut wall 8.1 s → 2.0 s). Call it in kernels that scan everything anyway
    * — never above a pruned point read, where the exchange would bury the
    * scan's PushedFilters. The conditional makes composition safe: once one
    * spread has run, downstream calls see >= target partitions and no-op. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame     = loadEvents(spark, dir)
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
