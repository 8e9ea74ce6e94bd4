package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Curation operators on synthetic data where every rule BINDS: caps
  * exceeded, repetitive docs present, re-crawled content to drop. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def runQ(name: String, dir: String) =
    Curation.queries.find(_.name == name).get.run(spark, dir)

  test("quota sample keeps at most K per stratum, deterministically") {
    val k = 20
    val docs = Seq.tabulate(100)(i =>
      (i.toLong, s"text $i", if (i < 80) "en" else "de", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang", "source")
      .orderBy(TextOps.hash60(concat(col("doc_id").cast("string"),
        lit("|quota"))), col("doc_id"))
    val sampled = docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).select("doc_id", "lang")
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") === k.toLong) // 80 candidates capped to 20
    assert(byLang("de") === k.toLong) // exactly at cap
    // deterministic: same selection on re-run
    val again = docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).select("doc_id", "lang")
    assert(sampled.exceptAll(again).isEmpty)
  }

  test("repetition rules flag looping text and pass varied text") {
    val docs = Seq(
      (1L, Seq.fill(50)("spam spam").mkString(" "), "en", "web"), // one 2-gram
      (2L, (1 to 60).map(i => s"w$i").mkString(" "), "en", "web")) // all unique
      .toDF("doc_id", "text", "lang", "source")
    docs.createOrReplaceTempView("curation_docs_tmp")
    val grams = docs.select(col("doc_id"),
      explode(TextOps.shingleHashSeq(TextOps.toks(col("text")), 2)).as("gh"))
    val counts = grams.groupBy("doc_id", "gh").agg(count(lit(1)).as("c"))
    val m = counts.groupBy("doc_id").agg(
      sum("c").as("n_grams"), count(lit(1)).as("n_distinct"),
      max("c").as("top_count"))
    val flags = m.withColumn("rep",
      (lit(1.0) - col("n_distinct").cast("double") / col("n_grams").cast("double") > 0.5)
        || (col("top_count").cast("double") / col("n_grams").cast("double") > 0.2))
      .select("doc_id", "rep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags(1L))   // "spam spam spam…" is one repeated gram
    assert(!flags(2L))  // 60 distinct words: every gram unique
  }

  test("registered queries run against testdata with sane shapes") {
    val dir = "/root/testdata/sf0.001"
    // quota: never more than K per stratum
    val quota = runQ("q77_quota_sample", dir)
      .groupBy("lang", "source").count()
    assert(quota.filter(col("count") > 20).count() === 0)
    // repetition: output covers every doc with >= 1 gram, flags are 0/1
    val rep = runQ("q78_repetition_rules", dir)
    assert(rep.filter(col("is_repetitive").isin(0, 1) === false).count() === 0)
    assert(rep.filter(col("dup_frac") < 0 || col("dup_frac") > 1).count() === 0)
    // snapshot delta: no surviving arrival shares content with standing
    val delta = runQ("q79_snapshot_delta", dir)
    assert(delta.count() > 0)
    assert(delta.filter(col("doc_id") >= 1000000000000L).count() === 0) // re-crawls dropped
    // histogram: shares per lang sum to 1
    val hist = runQ("q80_length_histogram", dir)
      .groupBy("lang").agg(sum("lang_share").as("s"))
    assert(hist.filter(abs(col("s") - 1.0) > 1e-9).count() === 0)
    // mixture weights: sum(weight * n_docs) == total/n_langs * n_langs = total
    val mw = runQ("q81_mixture_weights", dir)
    val total = mw.agg(sum("n_docs")).head.getLong(0)
    val weighted = mw.agg(sum(col("weight") * col("n_docs"))).head.getDouble(0)
    assert(math.abs(weighted - total.toDouble) < 1e-6)
  }

  /** Synthetic documents table on disk so the REGISTERED queries (which read
    * `Tables.documents(dir)`) run end-to-end against fixture content. */
  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_docs").toString
    rows.map { case (id, text, lang, source) =>
      (id, text, lang, source, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("boilerplate strip drops cross-doc segments per source, keeps unique ones") {
    val seg = (1 to 8).map(i => s"h$i").mkString(" ") // one full shared segment
    val dir = docsDir(Seq(
      (1L, seg + " " + (1 to 8).map(i => s"a$i").mkString(" "), "en", "s1"),
      (2L, seg + " " + (1 to 8).map(i => s"b$i").mkString(" "), "en", "s1"),
      (3L, seg + " " + (1 to 8).map(i => s"c$i").mkString(" "), "en", "s2")))
    val out = runQ("q83_boilerplate_strip", dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) === ((2L, 1L, (1 to 8).map(i => s"a$i").mkString(" "))))
    assert(out(2L) === ((2L, 1L, (1 to 8).map(i => s"b$i").mkString(" "))))
    // same header in a DIFFERENT source: frequency is per-source, all kept
    assert(out(3L)._2 === 2L)
    assert(out(3L)._3.startsWith("h1 h2"))
  }

  test("pii scrub masks injected and naturally-present identifiers") {
    val dir = docsDir(Seq(
      (1L, "plain text with no identifiers", "en", "s1"),
      (2L, "write bob@mail.example.org today", "en", "s1"),
      (5L, "gets the synthetic injection", "en", "s1")))
    val out = runQ("q84_pii_scrub", dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) === ((0L, 0L, "plain text with no identifiers")))
    assert(out(2L) === ((1L, 0L, "write <EMAIL> today")))
    assert(out(5L)._1 === 1L && out(5L)._2 === 1L)
    assert(out(5L)._3.contains("<EMAIL>") && out(5L)._3.contains("<PHONE>"))
    assert(!out(5L)._3.contains("@") && !out(5L)._3.contains("555-"))
  }

  test("approx robust outliers agree with the exact tier within the sketch rank bound") {
    // Discrete-exact reference stats, computed in plain Scala: median =
    // smallest value whose cumulative weight reaches ceil(0.5 * n) — the
    // sketch's own query rule, so in the no-compaction regime the two MUST
    // be bit-identical.
    def discMedian(xs: Array[Double]): Double =
      xs.sorted.apply(math.max(1L, math.ceil(0.5 * xs.length).toLong).toInt - 1)
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    val bySource = docs.select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1).toDouble))
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2) }
    val exact = bySource.map { case (s, xs) =>
      val med = discMedian(xs)
      s -> (med, discMedian(xs.map(x => math.abs(x - med))))
    }

    // Regime 1 — capacity above every group size (no compaction): stats and
    // per-doc flags are EXACTLY the discrete tier's.
    val stats = Curation.robustStatsApprox(docs, k = 4096).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(stats === exact)
    val flags = Curation.robustOutliersApprox(docs, k = 4096).collect()
      .map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    val docRows = docs.select("doc_id", "source", "n_chars").collect()
    docRows.foreach { r =>
      val (med, mad) = exact(r.getString(1))
      val want = mad > 0.0 && math.abs(r.getLong(2).toDouble - med) > 3.0 * mad
      assert(flags(r.getLong(0)) === want, s"doc ${r.getLong(0)}")
    }

    // Regime 2 — k=16 forces compaction (~100 docs/source): each sketched
    // estimate's true rank stays within the geometry's bound (L/k ≈ 0.19
    // at this size; 0.25 leaves slack without losing the teeth).
    val eps = 0.25
    def rankWindow(xs: Array[Double], est: Double): (Double, Double) =
      (xs.count(_ < est).toDouble / xs.length,
        xs.count(_ <= est).toDouble / xs.length)
    val statsC = Curation.robustStatsApprox(docs, k = 16).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    for ((src, xs) <- bySource) {
      val (medA, madA) = statsC(src)
      val (loM, hiM) = rankWindow(xs, medA)
      assert(loM - eps <= 0.5 && 0.5 <= hiM + eps, s"$src med=$medA")
      // MAD's bound is against deviations about the APPROX median — the
      // distribution the second sketch actually summarizes.
      val adevs = xs.map(x => math.abs(x - medA))
      val (loD, hiD) = rankWindow(adevs, madA)
      assert(loD - eps <= 0.5 && 0.5 <= hiD + eps, s"$src mad=$madA")
    }
  }

  test("source overlap counts shared distinct grams with containment") {
    val dir = docsDir(Seq(
      (1L, "t1 t2 t3 t4", "en", "a"),   // grams {t1t2t3, t2t3t4}
      (2L, "t2 t3 t4 t5", "en", "b"))) // grams {t2t3t4, t3t4t5}
    val out = runQ("q85_source_overlap", dir).collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getString(0), r.getString(1)) === (("a", "b")))
    assert(r.getLong(2) === 1L && r.getLong(3) === 2L && r.getLong(4) === 2L)
    assert(r.getDouble(5) === 0.5)
  }

  test("source overlap df ceiling prunes only ubiquitous grams; totals stay exact") {
    // gram "u1 u2 u3" appears in all three sources (df=3); "r1 r2 r3" only
    // in a and b (df=2). cap=2 must drop the ubiquitous gram from SHARED
    // counts while per-source totals are unchanged.
    val dir = docsDir(Seq(
      (1L, "u1 u2 u3 x1 x2 r1 r2 r3", "en", "a"),
      (2L, "u1 u2 u3 y1 y2 r1 r2 r3", "en", "b"),
      (3L, "u1 u2 u3 z1 z2", "en", "c")))
    def byPair(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val docs = graft.Tables.documents(spark, dir)
    val exact = byPair(Curation.sourceOverlap(docs, None))
    val capped = byPair(Curation.sourceOverlap(docs, Some(2)))
    // every capped shared count is a lower bound; totals identical
    for ((k, (sharedC, ga, gb)) <- capped) {
      assert(sharedC <= exact(k)._1)
      assert((ga, gb) === ((exact(k)._2, exact(k)._3)))
    }
    // the (a, b) pair keeps its rare overlap after the ubiquitous head drops
    assert(capped(("a", "b"))._1 < exact(("a", "b"))._1)
    assert(capped(("a", "b"))._1 >= 1L)
    // pairs whose ONLY overlap was ubiquitous vanish from the capped matrix
    assert(!capped.contains(("a", "c")) && exact.contains(("a", "c")))
  }
}
