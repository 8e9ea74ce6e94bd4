package graft.sources

/** S2: the SEC-companyfacts client discipline
  * (/root/reference/src/sec_xbrl_finwarehouse/sec_client.py:27-50),
  * transport-agnostic: retry-on-throttle with exponential backoff, fixed
  * inter-request pacing, mandatory identifying headers. The reference pins
  * retries=3, backoff 1.6^attempt seconds on HTTP 429/500/502/503/504,
  * 0.2 s pacing, 30 s timeout.
  *
  * Ingestion stays DRIVER-side code by design (SURVEY §3.3): fetch documents
  * to a landing directory, then `spark.read.json(landing)` fans the parsing
  * out to executors. A polite external API is a rate-limited, per-host
  * resource — hammering it from 1000 executors is an outage, not
  * parallelism; the cluster's job is the flatten, not the fetch.
  *
  * The transport (`fetch`) and clock (`sleep`) are injected so the policy is
  * testable without a network (this container has zero egress).
  */
object RetryingClient {

  /** Outcome of one transport attempt. */
  sealed trait Attempt
  final case class Ok(body: String) extends Attempt
  /** Retryable per the reference's RETRY_STATUSES (sec_client.py:7). */
  final case class Throttled(status: Int) extends Attempt
  final case class Fatal(status: Int, msg: String) extends Attempt

  val RetryStatuses: Set[Int] = Set(429, 500, 502, 503, 504)
  val DefaultRetries = 3
  val BackoffBase = 1.6
  val PacingMillis = 200L

  final case class GiveUp(lastStatus: Int, attempts: Int)
    extends RuntimeException(s"gave up after $attempts attempts (status $lastStatus)")

  /** One paced, retried fetch. Mirrors sec_client.get_json's loop:
    * attempt; on retryable status sleep backoff^attempt seconds and retry up
    * to `retries` times; on success sleep `pacingMillis` (politeness pacing
    * AFTER a successful call, sec_client.py:36) and return. */
  def fetchWithRetry(
      url: String,
      fetch: String => Attempt,
      sleep: Long => Unit,
      retries: Int = DefaultRetries,
      backoffBase: Double = BackoffBase,
      pacingMillis: Long = PacingMillis): String = {
    var attempt = 0
    var lastStatus = -1
    while (attempt <= retries) {
      fetch(url) match {
        case Ok(body) =>
          sleep(pacingMillis)
          return body
        case Throttled(status) =>
          lastStatus = status
          sleep((math.pow(backoffBase, attempt) * 1000).toLong)
          attempt += 1
        case Fatal(status, msg) =>
          throw new RuntimeException(s"fatal HTTP $status for $url: $msg")
      }
    }
    throw GiveUp(lastStatus, attempt)
  }

  /** Sequential landing-zone fetch (the reference ingests one company at a
    * time, ingest_facts.py:106 — pacing makes parallel fetch pointless):
    * writes one JSON file per key, returns the landing dir for
    * `spark.read.json`. */
  def fetchAllToLanding(
      keys: Seq[String],
      urlFor: String => String,
      fetch: String => Attempt,
      sleep: Long => Unit,
      landingDir: java.nio.file.Path): java.nio.file.Path = {
    java.nio.file.Files.createDirectories(landingDir)
    keys.foreach { key =>
      val body = fetchWithRetry(urlFor(key), fetch, sleep)
      java.nio.file.Files.writeString(landingDir.resolve(s"$key.json"), body)
    }
    landingDir
  }
}
