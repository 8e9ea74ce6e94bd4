package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Misra-Gries sketch aggregate: exact when counters cover the cardinality,
  * bounded undercount + guaranteed-presence when they don't, and SQL-callable
  * through the registered function. */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  test("exact regime: k above cardinality reproduces the exact top-k") {
    val tokens = Seq.tabulate(300)(i => ("g", s"tok${i % 7}")) // tok0 most frequent
    val got = tokens.toDF("g", "t")
      .repartition(4) // force partial buffers + merges
      .groupBy("g").agg(MisraGriesTopK(col("t"), 16, 3).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.token"), col("e.n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    // 300 = 7*42 + 6: tok0..tok5 get 43, tok6 gets 42; ties break by token asc
    assert(got === Seq("tok0" -> 43L, "tok1" -> 43L, "tok2" -> 43L))
  }

  test("approx regime: heavy hitter survives with undercount <= n/(k+1)") {
    val n = 400
    val rng = new scala.util.Random(5)
    // one token at 50%, the rest spread over 40 distinct values >> k=4
    val tokens = Seq.fill(n)(
      if (rng.nextBoolean()) "heavy" else s"light${rng.nextInt(40)}")
    val got = tokens.map(("g", _)).toDF("g", "t")
      .repartition(4)
      .groupBy("g").agg(MisraGriesTopK(col("t"), 4, 4).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.token"), col("e.n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val trueHeavy = tokens.count(_ == "heavy").toLong
    assert(got.contains("heavy")) // true count > n/(k+1) -> guaranteed present
    assert(got("heavy") <= trueHeavy)
    assert(got("heavy") >= trueHeavy - n / (4 + 1))
  }

  test("tokens past writeUTF's 65535-byte limit survive shuffle serialization") {
    val huge = "x" * 70000 // would throw UTFDataFormatException via writeUTF
    val tokens = Seq.fill(5)(("g", huge)) ++ Seq.tabulate(3)(i => ("g", s"t$i"))
    val got = tokens.toDF("g", "t")
      .repartition(4) // forces serialize/deserialize of partial buffers
      .groupBy("g").agg(MisraGriesTopK(col("t"), 16, 1).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.token"), col("e.n")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(got === Array(huge -> 5L))
  }

  test("callable from SQL via the registered function") {
    Seq(("a", "x"), ("a", "x"), ("a", "y")).toDF("g", "t")
      .createOrReplaceTempView("mg_in")
    val got = spark.sql(
      "SELECT graft_mg_topk(t, 8, 1) AS top FROM mg_in GROUP BY g")
      .select(explode(col("top")).as("e"))
      .select(col("e.token"), col("e.n")).collect()
    assert(got.map(r => r.getString(0) -> r.getLong(1)).toSeq === Seq("x" -> 2L))
  }
}
