package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway component-timing probe for the optimization round (not part of
  * the bench/verify contract). Times individual building blocks of the
  * heaviest queries so the expensive subtree can be localized. */
object ProfileParts {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      })
    def time(name: String)(f: => DataFrame): Unit = {
      for (i <- 1 to 2) {
        jobs.set(0)
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        val w = (System.nanoTime() - t0) / 1e9
        Thread.sleep(100)
        println(f"$name%-40s run$i $w%7.3f s jobs=${jobs.get}%3d")
      }
    }

    // q142 band-bucket distribution at this SF (VERDICT r19 item #6):
    // per (band, value) bucket, how many DISTINCT fingerprints collide —
    // the candidate rep-pair space is sum over buckets of C(k, 2).
    val feats = graft.ops.Multimodal.audioFpMartProbe(spark, sfDir)
    val groups = feats.groupBy((0 to 3).map(i => col(s"afp_b$i")): _*)
      .agg(count(lit(1)).as("members"))
    val nG = groups.count()
    val nD = feats.count()
    println(s"docs=$nD distinctFp=$nG dupFactor=${nD.toDouble / nG}")
    val bands = groups.select(posexplode(
      array((0 to 3).map(i => col(s"afp_b$i")): _*)).as(Seq("band", "v")))
    val dist = bands.groupBy("band", "v").agg(count(lit(1)).as("k"))
    dist.groupBy("band").agg(count(lit(1)).as("buckets"),
        max("k").as("max_k"),
        sum(col("k") * (col("k") - 1) / 2).as("cand_pairs"))
      .orderBy("band").show(10, false)
    println("top buckets:")
    dist.orderBy(col("k").desc).show(12, false)

    // wall check: the banded pair kernel at this SF
    val q142 = graft.ops.Multimodal.queries
      .find(_.name == "q142_audio_neardup").get
    println("q142 output rows = " + q142.run(spark, sfDir).count())
    time("q142 bandedPairs")(q142.run(spark, sfDir))
    val q144 = graft.ops.Multimodal.queries
      .find(_.name == "q144_audio_neardup_recall").get
    time("q144 recall")(q144.run(spark, sfDir))
    spark.stop()
  }
}
