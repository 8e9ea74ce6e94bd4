package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Oracle-gate marker: queries whose generated oracle SQL is pinned to a
    // specific geometry (q34's R=6 LSH) assert their resolved geometry
    // matches when this is set, so divergence is a loud failure instead of
    // a silent hash mismatch.
    System.setProperty("graft.oracle.active", "true")
    new java.io.File(outDir).mkdirs()
    // Debug dumps live OUTSIDE outDir: the driver parquet-scans every
    // outDir entry, and r5's in-tree `_debug` txts produced a spurious
    // error row in CORRECTNESS_r05. Keyed on the sanitized outDir tail + an
    // md5 of the full path + the pid (SecDerive.pathKey) — not a 32-bit
    // hashCode, which can collide across distinct outDirs and interleave
    // two runs' adjudication artifacts, and not the bare sanitized path,
    // which collides for paths differing only in sanitized-out characters
    // (and can exceed the 255-byte filename limit).
    val debugDir = "/tmp/graft_debug_" + graft.sec.SecDerive.pathKey(outDir)
    new java.io.File(debugDir).mkdirs()
    System.err.println(s"[verify] debug dumps at $debugDir")
    // Local-iteration filter (unset in the driver env → all queries).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // Adjudication artifact (r4's q69 hash-mismatched in the driver
        // env only): re-read the parquet EXACTLY as the comparator will
        // (post-write row order) and dump small results verbatim, so a
        // driver-side red can be diffed against the oracle row-by-row.
        // Best-effort in its OWN try: a debug-dump failure must not log
        // "[verify] failed" for a query whose comparator input was written.
        try {
          val back = spark.read.parquet(s"$outDir/$name")
          val rows = back.limit(65).collect()
          if (rows.length <= 64) {
            val cols = back.columns
            val lines = rows.map { r =>
              cols.indices.map(i => s"${cols(i)}=${r.get(i)}").mkString("|")
            }
            Files.writeString(Paths.get(s"$debugDir/$name.txt"),
              lines.mkString("", "\n", "\n"))
            if (name.startsWith("q69"))
              lines.foreach(l => System.err.println(s"[verify-rows] $name $l"))
          }
        } catch { case e: Throwable =>
          System.err.println(s"[verify-debug] $name dump skipped: ${e.getMessage}")
        }
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
