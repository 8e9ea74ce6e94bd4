package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deterministic hash sampling/splitting: disjoint+exhaustive splits, run-
  * and table-independent assignment, per-stratum rate uniformity. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (1L to 2000L)
    .map(i => (i, if (i % 4 == 0) "es" else "en"))
    .toDF("doc_id", "lang")

  test("assignSplit: disjoint, exhaustive, and roughly proportional") {
    val s = Sampling.assignSplit(docs, "doc_id", trainPct = 80, valPct = 10)
    assert(s.count() === 2000L) // exhaustive: every row assigned
    val byn = s.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byn.keySet === Set("train", "val", "test")) // disjoint labels only
    assert(byn("train") > 1400 && byn("train") < 1800) // ~80% of 2000
    assert(byn("val") > 100 && byn("val") < 300)       // ~10%
  }

  test("assignment is deterministic and independent of the carrying table") {
    val a = Sampling.assignSplit(docs, "doc_id").select("doc_id", "split")
    // a different table (different columns, order, partitioning), same keys
    val other = docs.repartition(7).withColumn("extra", lit(1))
    val b = Sampling.assignSplit(other, "doc_id").select("doc_id", "split")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("hashSample: same rows every run; strata sampled at the same rate") {
    val s1 = Sampling.hashSample(docs, "doc_id", 10)
    val s2 = Sampling.hashSample(docs, "doc_id", 10)
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
    val rates = docs.groupBy("lang").count()
      .join(s1.groupBy("lang").count().withColumnRenamed("count", "kept"), "lang")
      .select(col("lang"), col("kept").cast("double") / col("count"))
      .collect().map(_.getDouble(1))
    assert(rates.forall(r => r > 0.05 && r < 0.15)) // each stratum ~10%
  }

  test("assignSplit is a pure narrow projection (no exchange, no shuffle)") {
    val p = Sampling.assignSplit(docs, "doc_id")
      .queryExecution.sparkPlan.toString
    assert(!p.contains("Exchange"), s"split must fuse with the scan:\n$p")
  }

  test("weightedMixture: strata land at their weights; copies indexed; 0% drops") {
    val m = Sampling.weightedMixture(docs, "lang",
      Map("en" -> 250, "es" -> 0), defaultPct = 50)
    val byLang = m.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byLang.contains("es")) // weight 0 removes the stratum
    assert(byLang("en") > 1500 * 2.3 && byLang("en") < 1500 * 2.7) // ~250% of the 1500 en docs
    // each doc's replicas are 1..n with distinct copy indices
    val copies = m.filter(col("lang") === "en").groupBy("doc_id")
      .agg(count(lit(1)).as("n"), countDistinct("copy").as("d"),
        max("copy").as("mx"))
    assert(copies.filter(col("n") =!= col("d") || col("mx") =!= col("n")).isEmpty)
    // deterministic: same call, same multiset
    val m2 = Sampling.weightedMixture(docs, "lang",
      Map("en" -> 250, "es" -> 0), defaultPct = 50)
    assert(m.exceptAll(m2).isEmpty && m2.exceptAll(m).isEmpty)
  }

  test("shuffleShards: deterministic, balanced-ish, contiguous positions per shard") {
    val s1 = Sampling.shuffleShards(docs, "doc_id", 4)
    val s2 = Sampling.shuffleShards(docs, "doc_id", 4)
    assert(s1.exceptAll(s2).isEmpty) // repeatable run to run
    // positions are 1..n_shard with no gaps
    val bad = s1.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1L)
    assert(bad.isEmpty)
    // the shard order is NOT doc_id order (it actually shuffles)
    val firstShard = s1.filter(col("shard") === s1.select(min("shard")).as[Int].head)
      .orderBy("pos").select("doc_id").as[Long].collect().toSeq
    assert(firstShard !== firstShard.sorted)
  }

  test("different salts draw independent splits") {
    val a = Sampling.hashSample(docs, "doc_id", 50, salt = "a")
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.hashSample(docs, "doc_id", 50, salt = "b")
      .select("doc_id").as[Long].collect().toSet
    val overlap = (a & b).size.toDouble / a.size
    assert(overlap > 0.3 && overlap < 0.7) // ~independent 50% draws
  }

  test("temperatureMixture: alpha=1/2 flattens a 4:1 head to 2:1 targets") {
    // A holds 400 docs, B holds 100 — natural shares 80/20. sqrt scaling:
    // s_A = 20e6, s_B = 10e6, st = 30e6 → targets (100·20/30, 100·10/30)
    // = (66, 33): B is upsampled 1.67× over its natural share, exactly the
    // hand-derivable α=1/2 rule, with floor leaving 1 doc unallocated.
    val mix = (1L to 400L).map(i => (i, "A")) ++ (401L to 500L).map(i => (i, "B"))
    val df = mix.toDF("doc_id", "source")
    val out = Sampling.temperatureMixture(df, 100L).collect()
    val bySrc = out.groupBy(_.getAs[String]("source"))
    assert(bySrc("A").length === 66 && bySrc("B").length === 33)
    assert(out.forall(r => r.getAs[Long]("rk") <= r.getAs[Long]("target")))
    // ranks contiguous from 1 within each source
    bySrc.foreach { case (s, rs) =>
      val rks = rs.map(_.getAs[Long]("rk")).sorted
      assert(rks === (1L to rks.length).toArray, s"ranks not contiguous in $s")
    }
    // deterministic draw
    assert(Sampling.temperatureMixture(df, 100L)
      .exceptAll(Sampling.temperatureMixture(df, 100L)).isEmpty)
  }
}
