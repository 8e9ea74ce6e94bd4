package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Contract of [[Tables.spread]] — the adaptive fan-out for under-split
  * inputs. The conditional is the whole point: on a real cluster a 100 TB
  * scan arrives with thousands of splits and spread must add NOTHING (an
  * unconditional repartition would put a corpus-sized round-robin exchange
  * in front of every per-gram/per-char kernel); on the local bench a small
  * parquet file is one split and the fan-out is what lets a 32-core host
  * actually use its cores upstream of the first natural exchange. */
class SpreadSpec extends SparkSpec {
  import spark.implicits._

  private def target: Int =
    spark.conf.get("spark.sql.shuffle.partitions").toInt

  test("under-split input fans out to the session shuffle parallelism") {
    val one = spark.range(1000).toDF("id").coalesce(1)
    assert(one.rdd.getNumPartitions === 1)
    val s = Tables.spread(one)
    assert(s.rdd.getNumPartitions === target)
  }

  test("well-split input is returned untouched — no exchange added") {
    val wide = spark.range(1000).toDF("id").repartition(target + 2)
    val s = Tables.spread(wide)
    // the SAME plan object: no new exchange node of any kind
    val before = wide.queryExecution.sparkPlan
      .collect { case e: ShuffleExchangeExec => e }.size
    val after = s.queryExecution.sparkPlan
      .collect { case e: ShuffleExchangeExec => e }.size
    assert(after === before, "spread added an exchange to a well-split input")
    assert(s.rdd.getNumPartitions === target + 2)
  }

  test("spread composes idempotently: a second call is a no-op") {
    val once = Tables.spread(spark.range(100).toDF("id").coalesce(1))
    val twice = Tables.spread(once)
    val exchanges = twice.queryExecution.sparkPlan
      .collect { case e: ShuffleExchangeExec => e }.size
    assert(exchanges === 1, s"expected one round-robin exchange, got $exchanges")
  }

  test("shuffle-introducing plans are returned unchanged, .rdd never probed") {
    // Under AQE, Dataset.rdd on a plan containing an un-materialized
    // exchange eagerly EXECUTES every upstream stage at construction time.
    // spread must therefore hand wide plans back untouched — identically,
    // not just equivalently — without ever touching .rdd: such a plan
    // already runs at shuffle parallelism and needs no fan-out.
    val agg = spark.range(1000).toDF("id").coalesce(1)
      .groupBy((col("id") % 7).as("k")).agg(count(lit(1)).as("n"))
    assert(Tables.spread(agg) eq agg)
    val joined = spark.range(10).toDF("a")
      .join(spark.range(10).toDF("b"), col("a") === col("b"))
    assert(Tables.spread(joined) eq joined)
  }

  test("streaming frames pass through untouched (.rdd is illegal on them)") {
    val stream = spark.readStream.format("rate").load()
    assert(Tables.spread(stream) eq stream)
  }

  test("spread preserves rows exactly (round-robin moves, never drops)") {
    val df = spark.range(500).toDF("id")
      .withColumn("v", col("id") * 3)
      .coalesce(1)
    val got = Tables.spread(df).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq === (0L until 500L).map(i => (i, i * 3)))
  }
}
