package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-Min sketch: the one-sided guarantee (never an undercount),
  * collision-free exactness at small vocabulary, the byte-identical
  * counter-sum merge law, partitioning invariance, shape-mismatch
  * refusal, and the SQL-registered surface. */
class CmsSketchSpec extends SparkSpec {
  import spark.implicits._

  private def freqFixture: Seq[String] =
    (1 to 100).flatMap(i => Seq.fill(i % 7 + 1)(s"tok$i"))

  test("small vocabulary: estimates are exact (no collisions at width 2048)") {
    val df = freqFixture.toDF("v").repartition(5)
    val sk = df.agg(Cms.sketch(col("v")).as("sk"))
    val est = df.distinct().crossJoin(sk)
      .select(col("v"), Cms.estimateOf(col("sk"), col("v")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = freqFixture.groupBy(identity).view.mapValues(_.size.toLong)
    exact.foreach { case (k, n) =>
      assert(est(k) === n, s"estimate for $k: ${est(k)} != $n")
    }
    // an unseen key reads 0 (or a collision's count — here, 0)
    val miss = spark.range(1).crossJoin(sk)
      .select(Cms.estimateOf(col("sk"), lit("never-inserted")))
      .head.getLong(0)
    assert(miss === 0L)
  }

  test("one-sided: estimates never undercount, even at forced collisions") {
    // width 16 over 400 distinct keys — collisions everywhere
    val vals = (1 to 400).map(i => s"k$i")
    val df = vals.toDF("v")
    val sk = df.agg(Cms.sketch(col("v"), 4, 16).as("sk"))
    val ests = df.crossJoin(sk)
      .select(Cms.estimateOf(col("sk"), col("v")).as("e"))
      .collect().map(_.getLong(0))
    assert(ests.forall(_ >= 1L), "an estimate undercounted")
  }

  test("merge law: doc-disjoint shard sketches fold byte-identical to one-shot") {
    val df = freqFixture.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val oneShot = df.agg(Cms.sketch(col("v")).as("sk"))
      .collect().head.getAs[Array[Byte]]("sk")
    val merged = Seq(0, 1)
      .map(p => df.filter(col("id") % 2 === p)
        .agg(Cms.sketch(col("v")).as("sk")))
      .reduce(_ unionByName _)
      .agg(Cms.merge(col("sk")).as("sk"))
      .collect().head.getAs[Array[Byte]]("sk")
    assert(java.util.Arrays.equals(oneShot, merged),
      "merged sketch differs from the one-shot sketch")
  }

  test("partitioning invariance: 1 partition == 13 partitions, byte-exact") {
    val df = freqFixture.toDF("v")
    def sk(parts: Int) = df.repartition(parts)
      .agg(Cms.sketch(col("v")).as("sk"))
      .collect().head.getAs[Array[Byte]]("sk")
    assert(java.util.Arrays.equals(sk(1), sk(13)))
  }

  test("subtract law: removing a contained sub-multiset is byte-identical " +
      "to sketching the survivors; underflow and shape mismatch refuse") {
    val df = freqFixture.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val all = df.agg(Cms.sketch(col("v")).as("sk"))
    val removedRows = df.filter(col("id") % 3 === 0)
    val removed = removedRows.agg(Cms.sketch(col("v")).as("sk"))
    val survivors = df.filter(col("id") % 3 =!= 0)
      .agg(Cms.sketch(col("v")).as("sk"))
      .collect().head.getAs[Array[Byte]]("sk")
    val subtracted = all.crossJoin(
        removed.withColumnRenamed("sk", "rm"))
      .select(Cms.subtractOf(col("sk"), col("rm")).as("sk"))
      .collect().head.getAs[Array[Byte]]("sk")
    assert(java.util.Arrays.equals(subtracted, survivors),
      "subtracted sketch differs from the survivors' one-shot sketch")
    // removing something the corpus never held: loud refusal, not a
    // clamped sketch that matches no corpus
    val foreign = Seq("never_sketched_token_zzz", "never_sketched_token_zzz")
      .toDF("v").agg(Cms.sketch(col("v")).as("rm"))
    val e = intercept[Exception] {
      all.crossJoin(foreign)
        .select(Cms.subtractOf(col("sk"), col("rm"))).collect()
    }
    assert(e.getMessage.contains("underflow") ||
      e.getCause != null && e.getCause.getMessage.contains("underflow"))
    // geometry mismatch refuses like the merge does
    val other = Seq("x").toDF("v").agg(Cms.sketch(col("v"), 4, 64).as("rm"))
    intercept[Exception] {
      all.crossJoin(other)
        .select(Cms.subtractOf(col("sk"), col("rm"))).collect()
    }
  }

  test("shape mismatch fails loudly, not silently wrong") {
    val a = Seq("x").toDF("v").agg(Cms.sketch(col("v"), 4, 64).as("sk"))
    val b = Seq("x").toDF("v").agg(Cms.sketch(col("v"), 4, 128).as("sk"))
    intercept[Exception] {
      a.unionByName(b).agg(Cms.merge(col("sk"))).collect()
    }
  }

  test("SQL spellings agree with the Column API") {
    val df = freqFixture.toDF("v")
    df.createOrReplaceTempView("cms_probe")
    val apiEst = df.agg(Cms.sketch(col("v")).as("sk"))
      .select(Cms.estimateOf(col("sk"), lit("tok7")))
      .head.getLong(0)
    val sqlEst = spark.sql(
      """SELECT graft_cms_estimate(graft_cms_sketch(v), 'tok7')
         FROM cms_probe""").head.getLong(0)
    assert(apiEst === sqlEst && apiEst === 1L)
  }
}
