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
    spark.read.parquet(s"$sfDir/region.parquet").groupBy("r_regionkey").count()
      .write.format("noop").mode("overwrite").save()

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      })
    def time(name: String)(f: => DataFrame): Unit = {
      // twice, report both (JIT/codegen warm)
      for (i <- 1 to 2) {
        jobs.set(0)
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        val w = (System.nanoTime() - t0) / 1e9
        Thread.sleep(100)
        println(f"$name%-40s run$i $w%7.3f s jobs=${jobs.get}%3d")
      }
    }

    import graft.llm.{Similarity, Selection}
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val nlist = Similarity.adaptiveNlist(n)
    println(s"n=$n nlist=$nlist")

    // isolate: fold assign vs 64-sum means
    val dec = org.apache.spark.sql.types.DecimalType(38, 6)
    val seeds = Similarity.seedCentroids(emb, nlist)
    time("assign(fold) only")(Similarity.ivfAssignWith(emb, seeds))
    time("means explode(old)")(Similarity.ivfAssignWith(emb, seeds)
      .select(col("cell"), posexplode(col("embedding").cast("array<double>"))
        .as(Seq("dim", "v")))
      .groupBy("cell", "dim")
      .agg((sum(col("v").cast(dec)).cast("double") /
        count(lit(1)).cast("double")).as("centroid")))
    time("means 64-sum(new)")(Similarity.kmeansStepWith(emb, seeds))
    time("means 64-sum double-probe")(Similarity.ivfAssignWith(emb, seeds)
      .select(col("cell"), col("embedding").cast("array<double>").as("v"))
      .groupBy("cell")
      .agg(count(lit(1)).as("__n"), (0 until 64).map(d =>
        sum(element_at(col("v"), d + 1)).as(s"__s$d")): _*))
    spark.stop()
  }
}
