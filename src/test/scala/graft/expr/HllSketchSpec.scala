package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HyperLogLog: small-range exactness (linear counting), duplicate and
  * partitioning invariance (register-max merge), accuracy at scale, and
  * the SQL-registered surface. */
class HllSketchSpec extends SparkSpec {
  import spark.implicits._

  private def estimate(values: Seq[String], parts: Int = 4): Long =
    values.toDF("v").repartition(parts)
      .agg(HllSketch(col("v")).as("e")).collect().head.getLong(0)

  test("small cardinalities are near-exact through linear counting") {
    assert(estimate(Nil) === 0L)
    assert(estimate(Seq("a")) === 1L)
    assert(estimate((1 to 5).map("u" + _)) === 5L)
    // linear counting's deterministic bias is +n^2/2m (~+1.2 here): exact
    // only below ~sqrt(2m) distinct, so pin a +-2 band at n=100
    val e100 = estimate((1 to 100).map("u" + _))
    assert(math.abs(e100 - 100L) <= 2L, s"estimate $e100")
  }

  test("duplicates do not move the estimate (set semantics)") {
    val once = estimate((1 to 50).map("d" + _))
    val tenx = estimate(Seq.fill(10)((1 to 50).map("d" + _)).flatten)
    assert(once === tenx)
  }

  test("estimate is partitioning-invariant (register-wise-max merge)") {
    val vals = (1 to 2000).map("p" + _)
    assert(estimate(vals, parts = 1) === estimate(vals, parts = 13))
  }

  test("accuracy at 50k distinct within 5% (p=12, sigma ~1.6%)") {
    val n = 50000
    val est = estimate((1 to n).map("x" + _), parts = 8)
    assert(math.abs(est - n).toDouble / n <= 0.05,
      s"estimate $est for $n distinct")
  }

  test("register face: sketch/merge/estimate compose to the direct estimate; shard merge is byte-exact") {
    val vals = (1 to 1000).map("r" + _)
    val df = vals.toDF("v")
    // direct estimate == registers -> estimate
    val direct = df.agg(HllSketch(col("v")).as("e")).collect().head.getLong(0)
    val viaRegs = df.agg(HllSketch.registers(col("v")).as("r"))
      .select(HllSketch.estimateOf(col("r")).as("e"))
      .collect().head.getLong(0)
    assert(direct === viaRegs)
    // shard-merged registers are BYTE-IDENTICAL to the one-shot vector
    // (register state is a pure function of the value set)
    val oneShot = df.agg(HllSketch.registers(col("v")).as("r"))
      .collect().head.getAs[Array[Byte]]("r")
    val shards = Seq(vals.filter(_.hashCode % 2 == 0), vals.filter(_.hashCode % 2 != 0))
      .map(s => s.toDF("v").agg(HllSketch.registers(col("v")).as("r")))
    val merged = shards.reduce(_ unionByName _)
      .agg(HllSketch.mergeRegisters(col("r")).as("r"))
      .collect().head.getAs[Array[Byte]]("r")
    assert(java.util.Arrays.equals(oneShot, merged),
      "shard-merged register vector differs from the one-shot vector")
    // SQL spellings agree with the Column API
    df.createOrReplaceTempView("hll_regs_probe")
    val sqlEst = spark.sql(
      "SELECT graft_hll_estimate(graft_hll_merge(r)) AS e FROM " +
        "(SELECT graft_hll_sketch(v) AS r FROM hll_regs_probe GROUP BY length(v))")
      .collect().head.getLong(0)
    assert(sqlEst === direct)
    // precision mismatch fails loudly, not silently wrong
    intercept[Exception] {
      df.agg(HllSketch.registers(col("v"), 12).as("r"))
        .select(HllSketch.estimateOf(col("r"), 10)).collect()
    }
  }

  test("per-group aggregation and the SQL-registered function agree") {
    val df = (1 to 300).map(i => (s"g${i % 3}", s"v${i % 37}")).toDF("g", "v")
    df.createOrReplaceTempView("hll_probe")
    val api = df.groupBy("g").agg(HllSketch(col("v")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sql = spark.sql(
      "SELECT g, graft_hll(v) AS e FROM hll_probe GROUP BY g")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(api === sql)
    // 37 distinct per group: linear counting keeps it exact
    assert(api.values.forall(_ === 37L))
  }
}
