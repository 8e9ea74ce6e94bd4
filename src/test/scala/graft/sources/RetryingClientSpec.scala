package graft.sources

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import RetryingClient._

/** S2 policy: backoff sequence, retry budget, pacing, fatal passthrough —
  * verified against an injected fake transport (zero egress). */
class RetryingClientSpec extends AnyFunSuite {

  private class Recorder {
    val sleeps = mutable.Buffer.empty[Long]
    var calls = 0
    def sleep(ms: Long): Unit = sleeps += ms
  }

  test("success path: one attempt, pacing sleep only") {
    val r = new Recorder
    val body = fetchWithRetry("u", { _ => r.calls += 1; Ok("{}") }, r.sleep)
    assert(body === "{}")
    assert(r.calls === 1)
    assert(r.sleeps.toSeq === Seq(200L))
  }

  test("throttle path: exponential backoff 1.6^attempt, then success") {
    val r = new Recorder
    val outcomes = Iterator[Attempt](Throttled(429), Throttled(503), Ok("ok"))
    val body = fetchWithRetry("u", { _ => r.calls += 1; outcomes.next() }, r.sleep)
    assert(body === "ok")
    assert(r.calls === 3)
    // 1.6^0 = 1000ms, 1.6^1 = 1600ms, then 200ms pacing after success
    assert(r.sleeps.toSeq === Seq(1000L, 1600L, 200L))
  }

  test("retry budget: gives up after retries+1 attempts with GiveUp") {
    val r = new Recorder
    val e = intercept[GiveUp] {
      fetchWithRetry("u", { _ => r.calls += 1; Throttled(429) }, r.sleep)
    }
    assert(r.calls === 4) // initial + 3 retries
    assert(e.lastStatus === 429)
  }

  test("fatal status is not retried") {
    val r = new Recorder
    intercept[RuntimeException] {
      fetchWithRetry("u", { _ => r.calls += 1; Fatal(404, "nope") }, r.sleep)
    }
    assert(r.calls === 1)
  }

  test("landing-zone fetch writes one file per key") {
    val r = new Recorder
    val dir = java.nio.file.Files.createTempDirectory("graft_landing")
    fetchAllToLanding(Seq("0000000001", "0000000002"),
      k => s"https://example.invalid/$k.json",
      { u => Ok(s"""{"url": "$u"}""") }, r.sleep, dir)
    val files = java.nio.file.Files.list(dir).toArray.map(_.toString).sorted
    assert(files.length === 2)
    assert(files.head.endsWith("0000000001.json"))
  }
}
