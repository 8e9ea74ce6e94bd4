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

  /** The events table's `ts` physical type has varied across testdata
    * generations: TIMESTAMP(NANOS) (which Spark's vectorized reader rejects
    * outright, [PARQUET_TYPE_ILLEGAL]) and plain TIMESTAMP(MICROS). Handle
    * both by schema inspection rather than assuming one generation:
    *   - nanos: read as long (legacy conf) and truncate to microseconds with
    *     integer division — the same floor-truncation DuckDB applies reading
    *     the file, so both engines see identical microsecond timestamps.
    *     (`div`, not `/`: double division loses integer precision above
    *     2^53 — epoch-nanos are ~1.7e18.)
    *   - micros: the raw read yields TIMESTAMP_NTZ (no timezone in the
    *     file's logical type); cast to TimestampType under the session's
    *     UTC zone, which keeps the stored micros integer bit-for-bit — the
    *     same wall-clock values DuckDB's naive read of the file produces.
    * The conf is set before the read so a nanos file surfaces as LongType
    * instead of failing; a micros file is unaffected by it. */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = loadRaw(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
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
    * spread has run, downstream calls see >= target partitions and no-op.
    *
    * Probing the partition count via `Dataset.rdd` is only safe on plans
    * with no exchange: under AQE, `.rdd` on a plan containing an
    * un-materialized shuffle eagerly EXECUTES every upstream stage at
    * construction time and throws the work away when the returned frame
    * re-executes. So shuffle-introducing plans (join/aggregate/window/
    * distinct/sort/repartition/global-limit anywhere in the tree) are
    * returned unchanged without touching `.rdd` — correct as well as safe,
    * because such a plan already runs at shuffle parallelism and needs no
    * fan-out. The `.rdd` probe only happens on exchange-free plans (scans,
    * localCheckpoints, narrow projections/explodes), where building the RDD
    * runs no job. Partition target comes from `sessionState.conf`, which
    * always yields an Int (the string conf can resolve to "auto"). */
  def spread(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.{logical => lp}
    // Streaming frames pass through untouched: .rdd is illegal on them, and
    // a micro-batch's parallelism is the source's concern (a kernel shared
    // by a batch query and its streaming twin reaches here both ways).
    if (df.isStreaming) return df
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    val wide = df.queryExecution.analyzed.exists {
      case r: lp.Repartition => r.shuffle // coalesce(n) is exchange-free
      case _: lp.Join | _: lp.Aggregate | _: lp.Window | _: lp.Distinct |
           _: lp.Deduplicate | _: lp.Sort | _: lp.RepartitionByExpression |
           _: lp.GlobalLimit | _: lp.MapGroups | _: lp.CoGroup |
           _: lp.Intersect | _: lp.Except => true
      case _ => false
    }
    if (wide) df
    else if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target)
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
