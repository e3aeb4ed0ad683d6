package graft.streaming

import graft.SparkSpec
import graft.model.{MockData, NotificationResponse}

/** §2.9 — async enrichment stage: KO containment, retry with backoff,
  * duplicate pass-through, bundle-flush (all results present).
  */
class AsyncEnrichSpec extends SparkSpec {
  import spark.implicits._

  private val quique = MockData.notSentDebitQuique
  private val abuela = MockData.notSentDebitAbuela

  test("SENT records get the echo response; DUPs pass through untouched") {
    val ds = spark.createDataset(Seq(
      Marked(quique.idempotentKey, quique, Marked.Sent),
      Marked(quique.idempotentKey, quique, Marked.Dup),
      Marked(abuela.idempotentKey, abuela, Marked.Dup)))
    val out = AsyncEnrich.enrich(ds,
      AsyncEnrich.Config(clientId = "spec-basic", backoffMillis = 1L),
      () => new AsyncEnrich.StubClient()).collect().toSeq

    assert(out.size == 3) // every input yields an output (bundle flush)
    val sent = out.filter(_.response.id == 101)
    assert(sent.size == 1)
    // success enrichment mirrors newEventRecordWithSuccess (P4)
    assert(sent.head.record.notification.nhubSuccess.contains(true))
    assert(sent.head.record.notification.successDescr.contains("SUCESSFUL PUSH"))
    assert(out.count(_.response == NotificationResponse.SentOrDuplicated) == 2)
  }

  test("transient failures are retried with incremented retries (P5)") {
    val ds = spark.createDataset(Seq(
      Marked(quique.idempotentKey, quique, Marked.Sent))).repartition(1)
    val out = AsyncEnrich.enrich(ds,
      AsyncEnrich.Config(clientId = "spec-retry", maxRetries = 3, backoffMillis = 1L),
      () => new AsyncEnrich.StubClient(failFirstN = 2)).collect().toSeq
    assert(out.size == 1)
    assert(out.head.response.id == 101)
    // two failures → third attempt succeeds; retries None→0→1
    assert(out.head.record.notification.retries.contains(1))
  }

  test("exhausted retries are contained as KO results, never thrown") {
    val ds = spark.createDataset(Seq(
      Marked(quique.idempotentKey, quique, Marked.Sent))).repartition(1)
    val out = AsyncEnrich.enrich(ds,
      AsyncEnrich.Config(clientId = "spec-ko", maxRetries = 1, backoffMillis = 1L),
      () => new AsyncEnrich.StubClient(failFirstN = 99)).collect().toSeq
    assert(out.size == 1)
    assert(!out.head.response.isSuccess)
    assert(out.head.record.notification.nhubSuccess.contains(false))
  }

  test("circuit breaker: opens after consecutive transport failures, " +
    "short-circuits without touching the endpoint, half-open probe closes it") {
    val records = (0 until 8).map(_ =>
      Marked(quique.idempotentKey, quique, Marked.Sent))
    // maxConcurrency=1 serializes dispatch, so by record 3 the first two
    // post-retry failures have tripped the threshold deterministically
    BreakerProbe.calls.set(0)
    val cfg = AsyncEnrich.Config(clientId = "spec-breaker", maxRetries = 0,
      backoffMillis = 1L, maxConcurrency = 1,
      breakerThreshold = 2, breakerCooldownMillis = 60000L)
    val out = AsyncEnrich.enrich(
      spark.createDataset(records).repartition(1), cfg,
      () => new CountingClient(failFirstN = 99)).collect().toSeq
    assert(out.size == 8 && out.forall(!_.response.isSuccess))
    assert(BreakerProbe.calls.get() == 2,
      s"open breaker must stop hammering the endpoint, saw ${BreakerProbe.calls.get()} calls")
    assert(out.count(_.response.body.contains("circuit open")) == 6)

    // half-open after cooldown: a healthy endpoint closes the breaker.
    // The breaker (and client) are per-clientId, so run the transition on
    // a fresh id with a short cooldown.
    BreakerProbe.calls.set(0)
    val cfg2 = cfg.copy(clientId = "spec-breaker-2", breakerCooldownMillis = 300L)
    val first = AsyncEnrich.enrich(
      spark.createDataset(records.take(3)).repartition(1), cfg2,
      () => new CountingClient(failFirstN = 2)).collect().toSeq
    assert(first.count(_.response.body.contains("circuit open")) == 1)
    Thread.sleep(600) // past the cooldown → half-open
    val second = AsyncEnrich.enrich(
      spark.createDataset(records.take(2)).repartition(1), cfg2,
      () => new CountingClient(failFirstN = 0)).collect().toSeq
    assert(second.forall(_.response.isSuccess),
      "probe after cooldown must reach the now-healthy endpoint and close the breaker")
  }

  test("breaker cache keys on settings: a re-configured clientId is honored") {
    val records = (0 until 4).map(_ =>
      Marked(quique.idempotentKey, quique, Marked.Sent))
    // trip and hold open a breaker under this clientId
    val armed = AsyncEnrich.Config(clientId = "spec-rekey", maxRetries = 0,
      backoffMillis = 1L, maxConcurrency = 1,
      breakerThreshold = 1, breakerCooldownMillis = 600000L)
    // failFirstN=1: the one failure trips threshold=1; the breaker then
    // short-circuits the rest, so the CACHED per-clientId client (reused
    // below) has consumed its failure budget and will succeed
    val first = AsyncEnrich.enrich(
      spark.createDataset(records).repartition(1), armed,
      () => new AsyncEnrich.StubClient(failFirstN = 1)).collect().toSeq
    assert(first.count(_.response.body.contains("circuit open")) == 3,
      "armed breaker should be open for records after the first failure")
    // SAME clientId, breaker now DISABLED: the stale open breaker cached
    // under the id must not short-circuit these sends
    val disabled = armed.copy(breakerThreshold = 0)
    val second = AsyncEnrich.enrich(
      spark.createDataset(records).repartition(1), disabled,
      () => new AsyncEnrich.StubClient(failFirstN = 1)).collect().toSeq
    assert(second.forall(_.response.isSuccess),
      "disabled-breaker config must reach the endpoint, not the stale open breaker")
  }

  test("throughput: sustains the reference's >200K/min rate against a local stub") {
    // BASELINE.md: >200,000 notifications/min (~3,333/s) on Dataflow with
    // a real HTTPS endpoint. Hermetic analogue: 20k sends through the full
    // dispatch machinery (semaphore, token bucket, retry wrapper, bundle
    // flush) against the instant stub.
    val n = 20000
    val recs = (1 to n).map { i =>
      val r = quique.copy(event = quique.event.copy(transactionId = Some(s"tp$i")))
      Marked(r.idempotentKey, r, Marked.Sent)
    }
    val ds = spark.createDataset(recs).repartition(4)
    val t0 = System.nanoTime()
    val out = AsyncEnrich.enrich(ds,
      AsyncEnrich.Config(clientId = "spec-tput", maxConcurrency = 256,
        ratePerSec = 1000000, burst = 1000000, backoffMillis = 1L),
      () => new AsyncEnrich.StubClient()).count()
    val secs = (System.nanoTime() - t0) / 1e9
    val rate = n / secs
    info(f"stub throughput: $rate%.0f sends/s over $n records")
    assert(out == n)
    assert(rate >= 3333.0, f"only $rate%.0f sends/s — below the 3,333/s baseline")
  }

  test("many records complete under bounded concurrency") {
    val recs = (1 to 200).map { i =>
      val r = quique.copy(event = quique.event.copy(transactionId = Some(s"tx$i")))
      Marked(r.idempotentKey, r, Marked.Sent)
    }
    val out = AsyncEnrich.enrich(spark.createDataset(recs),
      AsyncEnrich.Config(clientId = "spec-many", maxConcurrency = 8,
        ratePerSec = 100000, backoffMillis = 1L),
      () => new AsyncEnrich.StubClient()).collect()
    assert(out.length == 200)
    assert(out.forall(_.response.id == 101))
  }
}

/** File-scope so the enrich factory closure stays serializable (an inner
  * class would capture the spec); the counter is static — local[*] tests
  * run in one JVM. */
private object BreakerProbe {
  val calls = new java.util.concurrent.atomic.AtomicInteger(0)
}

private class CountingClient(failFirstN: Int)
    extends AsyncEnrich.NotificationClient {
  private val inner = new AsyncEnrich.StubClient(failFirstN = failFirstN)
  override def send(req: graft.model.HttpRequest)(
      implicit ec: scala.concurrent.ExecutionContext)
      : scala.concurrent.Future[graft.model.NotificationResponse] = {
    BreakerProbe.calls.incrementAndGet()
    inner.send(req)
  }
}
