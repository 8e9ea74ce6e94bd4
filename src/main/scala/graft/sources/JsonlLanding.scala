package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.SparkSession

/** Deterministic JSONL landing file for the ticker map, derived from the
  * `companies` dim — the stand-in for the reference's driver-side fetch of
  * company_tickers.json to a landing directory (SURVEY §3.3: the polite
  * single-host fetch stays on the driver; the CLUSTER's job is the parse,
  * which `graft-jsonl` fans out). Collect is bounded by the dim's size
  * (thousands of tickers at most, by construction of the SEC ticker map).
  *
  * Written once per (tmpdir, sfDir) via temp-file + atomic move, so
  * concurrent suites converge on one complete file.
  */
object JsonlLanding {
  def ensure(spark: SparkSession, dir: String): String = synchronized {
    val key = java.lang.Integer.toHexString(dir.hashCode)
    val target = Paths.get(sys.props("java.io.tmpdir"), s"graft_tickers_$key.jsonl")
    if (!Files.exists(target)) {
      val mapper = new ObjectMapper
      val maxRows = 1000000 // driver-side fetch: a dim, never a fact table
      val fetched = graft.sec.SecDerive.companies(spark, dir)
        .select("cik", "ticker", "name").limit(maxRows + 1).collect()
      require(fetched.length <= maxRows,
        s"JsonlLanding.ensure collects the companies dim to the driver; " +
          s"got >$maxRows rows — not a dimension, refusing to collect")
      val rows = fetched
        .sortBy(_.getString(1)) // by ticker: byte-stable across reruns
      val sb = new StringBuilder
      rows.foreach { r =>
        val node = mapper.createObjectNode()
        node.put("cik_str", r.getString(0))
        node.put("ticker", r.getString(1))
        node.put("title", r.getString(2))
        sb.append(mapper.writeValueAsString(node)).append('\n')
      }
      val tmp = Files.createTempFile(target.getParent, "graft_tickers_", ".tmp")
      Files.write(tmp, sb.toString.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
    target.toString
  }
}
