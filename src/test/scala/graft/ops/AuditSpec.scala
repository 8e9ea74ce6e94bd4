package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** observe()-based DQ metrics: values match direct aggregation, arrive from
  * the job's own pass (CollectMetrics in the plan, no extra scan), and
  * reconciliation sees both sides of a transform. */
class AuditSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1, Some("a"), Some(1.0)), (2, None, Some(2.0)),
    (3, Some("c"), None), (4, None, None))
    .toDF("id", "s", "v")

  test("n_rows and per-column null counts match direct aggregation") {
    val (observed, obs) = Audit.withDqMetrics(df, Seq("s", "v"))
    observed.write.format("noop").mode("overwrite").save()
    val m = obs.get
    assert(m("n_rows") === 4L)
    assert(m("nulls_s") === 2L)
    assert(m("nulls_v") === 2L)
  }

  test("metrics ride the existing pass: CollectMetrics in plan, result unchanged") {
    val (observed, _) = Audit.withDqMetrics(df, Seq("s"), name = "dq2")
    assert(observed.queryExecution.analyzed.toString.contains("CollectMetrics"))
    assert(rows(observed.orderBy("id")) === rows(df.orderBy("id")))
  }

  test("reconcile reports input and output counts of a transform") {
    val (out, inObs, outObs) =
      Audit.reconcile(df, _.filter(col("v").isNotNull))
    out.write.format("noop").mode("overwrite").save()
    assert(inObs.get("n_rows") === 4L)
    assert(outObs.get("n_rows") === 2L)
  }
}
