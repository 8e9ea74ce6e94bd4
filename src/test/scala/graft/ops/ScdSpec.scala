package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SCD2: interval invariants of the rebuild, and the incremental apply's
  * equivalence with rebuilding from the combined history. */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def hist(rows: (String, String, String, String)*): DataFrame =
    rows.toDF("cik", "accession_no", "form", "filing_date")

  private val h1 = hist(
    ("c1", "a1", "10-K", "2020-01-01"), ("c1", "a2", "10-Q", "2020-06-01"),
    ("c2", "b1", "10-K", "2021-03-01"))
  private val h2 = hist(
    ("c1", "a3", "10-K", "2021-01-01"), // new version for existing key
    ("c3", "d1", "10-Q", "2022-02-02")) // brand-new key

  private def canon(df: DataFrame): Seq[Seq[Any]] =
    rows(df.select("cik", "accession_no", "form", "effective_from",
      "effective_to", "is_current")
      .orderBy("cik", "effective_from", "accession_no"))

  private def build(h: DataFrame): DataFrame =
    Scd.fromHistory(h, "cik", "filing_date", "accession_no")

  test("intervals chain: each version closed by the next; one current per key") {
    val dim = build(h1)
    assert(canon(dim) === Seq(
      Seq("c1", "a1", "10-K", "2020-01-01", "2020-06-01", 0),
      Seq("c1", "a2", "10-Q", "2020-06-01", null, 1),
      Seq("c2", "b1", "10-K", "2021-03-01", null, 1)))
  }

  test("applyAppend == rebuild from combined history") {
    val incremental = Scd.applyAppend(build(h1), h2,
      "cik", "filing_date", "accession_no")
    val rebuilt = build(h1.unionByName(h2))
    assert(canon(incremental) === canon(rebuilt))
  }

  test("applyAppend touches only affected keys' current rows") {
    val dim = build(h1)
    val out = Scd.applyAppend(dim, h2, "cik", "filing_date", "accession_no")
    // c2 was untouched: its row must be byte-identical to the stored dim
    assert(canon(out.filter(col("cik") === "c2")) ===
      canon(dim.filter(col("cik") === "c2")))
    // c1's old current (a2) is now closed by a3's start
    val a2 = out.filter(col("accession_no") === "a2").head
    assert(a2.getAs[String]("effective_to") === "2021-01-01")
    assert(a2.getAs[Int]("is_current") === 0)
  }
}
