package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native hash60 must equal the hex-string formulation exactly — that
  * equality IS the DuckDB-oracle contract. */
class Hash60Spec extends SparkSpec {
  import spark.implicits._

  test("equals conv(substring(md5,1,15),16,10) on random strings") {
    val rng = new scala.util.Random(11)
    val strs = Seq.fill(500)(rng.alphanumeric.take(1 + rng.nextInt(30)).mkString) :+
      "" :+ "hello" :+ "a b c" :+ "ünïcödé ÿ"
    val df = strs.toDF("s")
    val out = df.select(
      Hash60(col("s")).as("native"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("hex")).collect()
    out.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("known value: 'hello' matches the verified cross-engine constant") {
    val out = Seq("hello").toDF("s").select(Hash60(col("s"))).collect()
    assert(out.head.getLong(0) === 419982666956583591L)
  }
}
