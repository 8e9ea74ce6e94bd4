package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** n-gram benchmark decontamination: overlap detection, zero-hit inclusion,
  * and the filter form. */
class DecontamSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  private val bench = docs(100L -> "the quick brown fox jumps over lazy dogs")

  test("contaminationReport counts distinct shared 3-grams; zero-hit docs kept") {
    val train = docs(
      1L -> "we saw the quick brown fox yesterday evening", // shares 2 trigrams
      2L -> "completely unrelated text about spark plans here", // clean
      3L -> "hi there") // <3 tokens: no shingles at all
    val got = Decontam.contaminationReport(train, bench)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got(1L) === ((2L, true))) // "the quick brown", "quick brown fox"
    assert(got(2L) === ((0L, false)))
    assert(got(3L) === ((0L, false))) // present despite having no shingles
  }

  test("decontaminate drops exactly the contaminated docs") {
    val train = docs(
      1L -> "we saw the quick brown fox yesterday evening",
      2L -> "completely unrelated text about spark plans here")
    val kept = Decontam.decontaminate(train, bench)
    assert(singleCol[Long](kept.select("doc_id")) === Seq(2L))
  }

  test("contamination is case/whitespace-normalized like the tokenizer") {
    val train = docs(1L -> "  THE   Quick BROWN fox  ")
    val got = Decontam.contaminationReport(train, bench).collect().head
    assert(got.getBoolean(2)) // matches despite case and spacing differences
  }

  test("bloom path output equals the exact broadcast path (no false negatives survive)") {
    val train = docs(
      1L -> "we saw the quick brown fox yesterday evening",
      2L -> "completely unrelated text about spark plans here",
      3L -> "the quick brown fox jumps over lazy dogs",
      4L -> "hi there")
    val exact = Decontam.contaminationReport(train, bench)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val bloom = Decontam.bloomContaminationReport(train, bench)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(bloom === exact)
  }

  test("cms prefilter output equals the exact path; zero estimate proves absence") {
    val train = docs(
      1L -> "we saw the quick brown fox yesterday evening",
      2L -> "completely unrelated text about spark plans here",
      3L -> "the quick brown fox jumps over lazy dogs",
      4L -> "hi there")
    val exact = Decontam.contaminationReport(train, bench)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val cms = Decontam.cmsContaminationReport(train, bench)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(cms === exact)
    // the one-sided law the prefilter leans on: a key never inserted can
    // collide UP (false positive) but a zero estimate is PROOF of absence —
    // insert disjoint keys and check every inserted key scores >= its count
    import graft.expr.Cms
    val sk = (1 to 50).map(i => s"present$i").toDF("k")
      .agg(Cms.sketch(col("k")).as("sk"))
    val est = (1 to 50).map(i => s"present$i").toDF("k")
      .crossJoin(sk)
      .select(Cms.estimateOf(col("sk"), col("k")).as("e"))
      .collect().map(_.getLong(0))
    assert(est.forall(_ >= 1L), "CMS undercounted an inserted key")
  }

  test("bloom path leaks no temp views and interleaved calls don't clobber") {
    val before = spark.catalog.listTables().count()
    val trainA = docs(1L -> "we saw the quick brown fox yesterday evening")
    val trainB = docs(9L -> "hi there totally clean")
    // build BOTH lazily before collecting EITHER: fixed view names would
    // make the second registration clobber the first call's inputs
    val a = Decontam.bloomContaminationReport(trainA, bench)
    val b = Decontam.bloomContaminationReport(trainB, bench)
    assert(a.filter("doc_id = 1").collect().head.getBoolean(2))
    assert(!b.filter("doc_id = 9").collect().head.getBoolean(2))
    assert(spark.catalog.listTables().count() === before)
  }
}
