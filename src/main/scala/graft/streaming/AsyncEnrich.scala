package graft.streaming

import graft.model.{HttpRequest, MyEventRecord, NotificationResponse, SendResult}
import org.apache.spark.sql.{Dataset, Encoder, Encoders}

import java.util.concurrent.{ConcurrentHashMap, Executors, Semaphore, TimeUnit}
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future, Promise}
import scala.util.control.NonFatal

/**
 * §2.9 — the async side-effecting enrichment stage: per SENT record, fire an
 * async request with bounded concurrency, rate limiting, fixed-backoff retry
 * and KO containment; DUPLICATE records pass straight through as
 * SENT_OR_DUPLICATED results. All futures are awaited before the partition
 * ends — the exact bundle-flush semantics of the reference's @FinishBundle
 * (StateBaseAsyncDoFn.java:48-65), with micro-batch/task = bundle. Task
 * retry ⇒ possible re-send: at-least-once, same policy as the reference's
 * suppressed-error design (mediation/README.md:63-92).
 *
 * Scale posture: the client is a per-executor-JVM singleton
 * (= DoFnWithResource PER_CLASS, StateAsyncParDoWithHttpHandler.scala:48-50),
 * concurrency and rate are bounded PER TASK so a 1000-executor cluster
 * applies cluster-wide pressure = tasks × rate — size `ratePerSec`
 * accordingly (the reference throttles 1000 req/s per worker,
 * AkkaHttpClient.scala:62).
 */
object AsyncEnrich {

  /** Pluggable client (= AbstractHttpClient.sendPushWithFutureResponse,
    * mediation/http/clients/AbstractHttpClient.scala:5-7). Implementations
    * are constructed lazily per executor via the serializable factory.
    */
  trait NotificationClient {
    def send(req: HttpRequest)(implicit ec: ExecutionContext): Future[NotificationResponse]
    def close(): Unit = ()
  }

  /** Retry/throttle knobs; defaults mirror the reference
    * (3 retries / 10 s backoff: StateAsyncParDoWithHttpHandler.scala:36-37;
    * rate 1000/s burst 1000: application.conf:28-30; pool 20000:
    * application.conf:23-24 → here per-task `maxConcurrency`).
    */
  final case class Config(
      maxConcurrency: Int = 256,
      ratePerSec: Int = 1000,
      burst: Int = 1000,
      maxRetries: Int = 3,
      backoffMillis: Long = 10000L,
      clientId: String = "default",
      // circuit breaker (0 = disabled): after `breakerThreshold`
      // consecutive TRANSPORT failures (post-retry; application-level KO
      // bodies are endpoint answers and do not count) the breaker opens
      // and records short-circuit to KO("circuit open") WITHOUT touching
      // the endpoint for `breakerCooldownMillis` — the
      // hammering-a-down-dependency guard every production dispatcher
      // carries. After the cooldown the next sends probe through
      // (half-open); one success closes it, a failure re-opens a full
      // cooldown. Per-clientId per-executor state, same scope as the
      // client itself.
      breakerThreshold: Int = 0,
      breakerCooldownMillis: Long = 30000L)

  // ── per-JVM (= per-executor) shared resources ──────────────────────────
  private val clients = new ConcurrentHashMap[String, NotificationClient]()
  private lazy val scheduler = Executors.newScheduledThreadPool(2, r => {
    val t = new Thread(r, "graft-async-retry"); t.setDaemon(true); t
  })
  private lazy val ioPool = ExecutionContext.fromExecutorService(
    Executors.newCachedThreadPool(r => {
      val t = new Thread(r, "graft-async-io"); t.setDaemon(true); t
    }))

  private def clientFor(id: String, factory: () => NotificationClient): NotificationClient =
    clients.computeIfAbsent(id, _ => factory())

  /** Consecutive-transport-failure circuit breaker (see Config). The
    * open-state check is advisory under concurrency (in-flight sends
    * race the trip), which is the standard contract — the breaker bounds
    * sustained hammering, not the last in-flight bundle. */
  private final class Breaker(threshold: Int, cooldownMillis: Long) {
    private val consecutiveFails = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile private var openUntilNanos: Long = 0L
    def isOpen: Boolean =
      threshold > 0 && System.nanoTime() < openUntilNanos
    def onSuccess(): Unit = if (threshold > 0) {
      consecutiveFails.set(0); openUntilNanos = 0L
    }
    def onFailure(): Unit = if (threshold > 0) {
      if (consecutiveFails.incrementAndGet() >= threshold)
        openUntilNanos = System.nanoTime() + cooldownMillis * 1000000L
    }
  }
  // keyed on (clientId, threshold, cooldown), not clientId alone: a later
  // Config reusing a clientId with different breaker settings (including
  // threshold=0 = disabled) must get a breaker honoring ITS settings, not
  // the first-seen ones cached under the id
  private val breakers =
    new ConcurrentHashMap[(String, Int, Long), Breaker]()
  private def breakerFor(cfg: Config): Breaker =
    breakers.computeIfAbsent(
      (cfg.clientId, cfg.breakerThreshold, cfg.breakerCooldownMillis),
      k => new Breaker(k._2, k._3))

  /** Simple token bucket (refill-on-demand), the Spark-side stand-in for
    * akka's throttle(rate, burst, Shaping) (AkkaHttpClient.scala:62). */
  private final class TokenBucket(ratePerSec: Int, burst: Int) {
    private var tokens: Double = burst.toDouble
    private var last: Long = System.nanoTime()
    def acquire(): Unit = synchronized {
      while (true) {
        val now = System.nanoTime()
        tokens = math.min(burst.toDouble, tokens + (now - last) * ratePerSec / 1e9)
        last = now
        if (tokens >= 1.0) { tokens -= 1.0; return }
        val waitMs = ((1.0 - tokens) / ratePerSec * 1000).toLong + 1
        Thread.sleep(waitMs)
      }
    }
  }

  private def delay(ms: Long): Future[Unit] = {
    if (ms <= 0) Future.successful(())
    else {
      val p = Promise[Unit]()
      scheduler.schedule(new Runnable { def run(): Unit = p.success(()) }, ms, TimeUnit.MILLISECONDS)
      p.future
    }
  }

  /** Fixed-backoff retry (ZIO Schedule.fixed && recurs equivalent,
    * StateAsyncParDoWithHttpHandler.scala:56-58), counting attempts on the
    * record like P5 (retries = null→0, n→n+1). */
  private def withRetry[T](attemptsLeft: Int, backoffMillis: Long)(
      op: Int => Future[T])(implicit ec: ExecutionContext): Future[T] = {
    def go(attempt: Int): Future[T] =
      op(attempt).recoverWith {
        case NonFatal(_) if attempt < attemptsLeft =>
          delay(backoffMillis).flatMap(_ => go(attempt + 1))
      }
    go(0)
  }

  /**
   * Drive the enrichment over a (typed) dataset of dedup-marked records.
   * Works identically on batch Datasets and inside streaming foreachBatch.
   */
  def enrich(ds: Dataset[Marked], cfg: Config,
      factory: () => NotificationClient): Dataset[SendResult] = {
    implicit val enc: Encoder[SendResult] = Encoders.product[SendResult]
    ds.mapPartitions { it =>
      implicit val ec: ExecutionContext = ioPool
      val client = clientFor(cfg.clientId, factory)
      val limiter = new Semaphore(cfg.maxConcurrency)
      val bucket = new TokenBucket(cfg.ratePerSec, cfg.burst)

      val breaker = breakerFor(cfg)
      val futures = it.map { m =>
        if (m.status == Marked.Dup)
          Future.successful(SendResult(m.record, NotificationResponse.SentOrDuplicated))
        else {
          limiter.acquire() // backpressure: bounds in-flight sends per task
          if (breaker.isOpen) {
            // short-circuit: a tripped breaker contains the failure storm
            // without burning retries (or rate tokens) against a down
            // endpoint. Checked AFTER the permit, i.e. at dispatch time —
            // under maxConcurrency=1 the previous outcome has always
            // landed, so the trip is observed deterministically.
            limiter.release()
            Future.successful(SendResult(
              m.record.withSuccess(success = false, "ko: circuit open"),
              NotificationResponse.ko("circuit open")))
          } else {
          bucket.acquire()
          withRetry(cfg.maxRetries, cfg.backoffMillis) { attempt =>
            val rec = (0 until attempt).foldLeft(m.record)((r, _) => r.incRetries)
            client.send(HttpRequest.from(rec)).map { resp =>
              breaker.onSuccess() // endpoint answered — transport is healthy
              SendResult(
                rec.withSuccess(resp.isSuccess, if (resp.isSuccess) "SUCESSFUL PUSH" else resp.body),
                resp)
            }
          }(ec).recover {
            // error containment: failures become KO results, never stall the
            // pipeline (StateBaseAsyncDoFn.java:118-147, errors suppressed)
            case NonFatal(e) =>
              breaker.onFailure() // post-retry transport failure
              SendResult(m.record.withSuccess(success = false, s"ko: ${e.getMessage}"),
                NotificationResponse.ko(String.valueOf(e.getMessage)))
          }.andThen { case _ => limiter.release() }
          }
        }
      }.toVector // dispatch everything in this bundle

      // bundle flush: await ALL before the task may commit (@FinishBundle)
      val results = Await.result(Future.sequence(futures), Duration.Inf)
      results.iterator
    }
  }

  /** Hermetic stub client echoing the jsonplaceholder contract the
    * reference's e2e test pins (POST → id=101 echo,
    * MediationServiceSpec.scala:73-81; test.conf:44-46) — tests must NOT
    * call the real public endpoint. `failFirstN` > 0 simulates transient
    * failures to exercise the retry path.
    */
  final class StubClient(failFirstN: Int = 0) extends NotificationClient {
    private val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    def callCount: Int = calls.get()
    override def send(req: HttpRequest)(implicit ec: ExecutionContext): Future[NotificationResponse] = {
      val n = calls.incrementAndGet()
      if (n <= failFirstN) Future.failed(new RuntimeException(s"transient #$n"))
      else Future.successful(NotificationResponse(101, req.title, req.body, req.userId))
    }
  }

  /** mTLS material loader — the public-API equivalent of the reference's
    * Secret-Manager-distributed SSL config
    * (streaming/utils/dofn/ssl/SslConfigHelper.scala:24-48,
    * mediation/http/clients/akka/AkkaSSLContextFromSecretManager.scala:16-56):
    * PKCS12 keystore (client identity for mutual TLS) + truststore (server
    * CA pinning) from worker-local paths → an `SSLContext` to hand to
    * [[JdkHttpClient]]. Either side is optional: keystore-only = client
    * cert with default trust; truststore-only = pinned server, no client
    * cert.
    */
  object SslMaterial {
    import java.io.FileInputStream
    import java.security.KeyStore
    import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManagerFactory}

    def contextFrom(keystorePath: Option[String] = None,
        keystorePassword: String = "",
        truststorePath: Option[String] = None,
        truststorePassword: String = ""): SSLContext = {
      def load(path: String, pass: String): KeyStore = {
        val ks = KeyStore.getInstance("PKCS12")
        scala.util.Using.resource(new FileInputStream(path))(
          ks.load(_, pass.toCharArray))
        ks
      }
      val kms = keystorePath.map { p =>
        val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
        kmf.init(load(p, keystorePassword), keystorePassword.toCharArray)
        kmf.getKeyManagers
      }.orNull
      val tms = truststorePath.map { p =>
        val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
        tmf.init(load(p, truststorePassword))
        tmf.getTrustManagers
      }.orNull
      val ctx = SSLContext.getInstance("TLS")
      ctx.init(kms, tms, null)
      ctx
    }
  }

  /** Real HTTP client over the JDK's async HttpClient (public API, no extra
    * deps): JSON POST, response body parsed leniently — a non-2xx or
    * error-ish body yields a KO response (MyHttpResponse.scala:19-27).
    * `sslContext` plugs in [[SslMaterial]] for mTLS endpoints (I4).
    */
  final class JdkHttpClient(endpoint: java.net.URI,
      timeoutMillis: Long = 30000L,
      sslContext: Option[javax.net.ssl.SSLContext] = None) extends NotificationClient {
    private val http = {
      val b = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(timeoutMillis))
      sslContext.foreach(b.sslContext)
      b.build()
    }

    private def esc(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }

    override def send(req: HttpRequest)(implicit ec: ExecutionContext): Future[NotificationResponse] = {
      val body = s"""{"title":"${esc(req.title)}","body":"${esc(req.body)}","userId":${req.userId}}"""
      val request = java.net.http.HttpRequest.newBuilder(endpoint)
        .timeout(java.time.Duration.ofMillis(timeoutMillis))
        .header("Content-Type", "application/json; charset=utf-8")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
        .build()
      val p = Promise[NotificationResponse]()
      http.sendAsync(request, java.net.http.HttpResponse.BodyHandlers.ofString())
        .whenComplete { (resp, err) =>
          if (err != null) p.failure(err)
          else if (resp.statusCode() / 100 != 2)
            p.success(NotificationResponse.ko(s"http ${resp.statusCode()}"))
          else {
            // lenient parse: echo contract gives {"id":N,...}; fall back to 101
            val id = "\"id\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(resp.body())
              .map(_.group(1).toInt).getOrElse(101)
            p.success(NotificationResponse(id, req.title, req.body, req.userId))
          }
        }
      p.future
    }
  }
}
