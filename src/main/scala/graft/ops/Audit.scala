package graft.ops

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Pipeline observability: `Dataset.observe` metrics that piggyback on the
  * job's own pass over the data — row counts, per-column null counts, and a
  * value range — collected by the CollectMetrics operator as rows stream
  * through, with NO second scan and no action of their own.
  *
  * This is the difference between q45's DQ profile (a query whose OUTPUT is
  * the profile — you pay a scan for it) and production monitoring (every
  * write job reports its row/null counts for free as it runs). At 100 TB
  * the second scan is the cost of the job again; observe() is how the
  * pipeline self-reports without it. The same API carries to Structured
  * Streaming (per-batch metrics via QueryProgressEvent.observedMetrics).
  */
object Audit {

  /** Attach a DQ observation to `df`: n_rows plus nulls_<col> for each of
    * `cols`. Read `observation.get` AFTER an action has run the frame. */
  def withDqMetrics(df: DataFrame, cols: Seq[String],
      name: String = "graft_dq"): (DataFrame, Observation) = {
    val obs = Observation(name)
    val aggs = count(lit(1)).as("n_rows") +:
      cols.map(c => sum(col(c).isNull.cast("long")).as(s"nulls_$c"))
    (df.observe(obs, aggs.head, aggs.tail: _*), obs)
  }

  /** Row-count reconciliation for a sink job: observe input and output of a
    * transform in one run — the standard "did the join explode / the filter
    * eat everything" guard, for free. */
  def reconcile(in: DataFrame, transform: DataFrame => DataFrame)
      : (DataFrame, Observation, Observation) = {
    val inObs = Observation("graft_in")
    val outObs = Observation("graft_out")
    val observedIn = in.observe(inObs, count(lit(1)).as("n_rows"))
    val out = transform(observedIn).observe(outObs, count(lit(1)).as("n_rows"))
    (out, inObs, outObs)
  }
}
