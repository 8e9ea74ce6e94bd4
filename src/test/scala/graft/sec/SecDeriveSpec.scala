package graft.sec

import graft.SparkSpec

/** The derived warehouse tables: shape invariants + the typed facts edge
  * (encoding over nullable columns must not throw). */
class SecDeriveSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("factsTyped encodes nullable columns as Options") {
    val facts = SecDerive.factsTyped(spark, dir)
    val stock = facts.filter(f => f.period_start.isEmpty).head()
    assert(stock.period_end.nonEmpty)
    assert(stock.value.nonEmpty)
    assert(stock.cik.length === 10)
  }

  test("fact_id is unique (injective over the lineitem natural key)") {
    val facts = SecDerive.facts(spark, dir)
    assert(facts.count() === facts.select("fact_id").distinct().count())
  }

  test("companies: 37 ciks, zero-padded, ticker derived") {
    val c = SecDerive.companies(spark, dir).collect()
    assert(c.length === 37)
    assert(c.forall(_.getAs[String]("cik").length == 10))
    assert(c.forall(_.getAs[String]("ticker").startsWith("TKR")))
  }
}
