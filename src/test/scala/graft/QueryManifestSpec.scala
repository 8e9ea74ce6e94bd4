package graft

import org.scalatest.funsuite.AnyFunSuite

import scala.io.Source

/** Pins the registered-query surface to a COMMITTED manifest so coverage can
  * never shrink silently again.
  *
  * Round 8 proved the failure mode: the testdata's events parquet moved to
  * micros timestamps, the loader broke, the whole events family quietly
  * dropped out of `SparkEntry.allQueries` registration, and the correctness
  * report went 113 → 105 entries with every REMAINING row green — a smaller
  * suite was indistinguishable from a healthy one. With this spec, removing
  * (or renaming) a query fails the build unless
  * `src/test/resources/query_manifest.txt` is edited in the same commit —
  * which is exactly the deliberate act the driver's report can then show.
  */
class QueryManifestSpec extends AnyFunSuite {

  private def manifest: Seq[String] = {
    val in = getClass.getResourceAsStream("/query_manifest.txt")
    assert(in != null, "src/test/resources/query_manifest.txt missing")
    try Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty).toList
    finally in.close()
  }

  test("registered queries match the committed manifest exactly") {
    val registered = SparkEntry.allQueries.map(_.name).sorted
    val pinned = manifest.sorted
    val missing = pinned.diff(registered)
    val unpinned = registered.diff(pinned)
    assert(missing.isEmpty && unpinned.isEmpty,
      s"""query surface drifted from query_manifest.txt —
         |  registered but not pinned (add to the manifest): $unpinned
         |  pinned but not registered (a loader/registration broke, or the
         |  removal is deliberate and the manifest must change too): $missing
         |""".stripMargin)
  }

  test("query names are unique") {
    val names = SparkEntry.allQueries.map(_.name)
    val dupes = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dupes.isEmpty, s"duplicate query names: $dupes")
  }

  test("every registered query carries a DuckDB oracle") {
    // The driver's hash gate only checks queries that ship SQL; a query
    // registered without an oracle silently downgrades to rows-only. Keep
    // that a deliberate, spec-edited decision rather than an accident.
    val noOracle = SparkEntry.allQueries.filter(_.oracle.isEmpty).map(_.name)
    assert(noOracle.isEmpty,
      s"queries without oracle SQL (add one, or amend this spec with the " +
        s"documented reason): $noOracle")
  }
}
