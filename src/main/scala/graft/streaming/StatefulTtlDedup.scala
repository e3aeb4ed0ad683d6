package graft.streaming

import graft.model.MyEventRecord
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A record tagged with its dedup outcome — D3's one-output-per-input
  * contract (every arrival yields a row, SENT or SENT_OR_DUPLICATED;
  * mediation/http/StateAsyncParDoWithHttpHandler.scala:105-131 and the
  * multiset assertion in MediationServiceSpec.scala:73-81).
  */
final case class Marked(key: String, record: MyEventRecord, status: String)

object Marked {
  val Sent = "SENT"
  val Dup = "SENT_OR_DUPLICATED"
}

/** Per-key dedup state: wall-clock millis at which the key's dedup window
  * expires (Long.MaxValue = no expiry). Top-level (not nested in the
  * operator object) so the product encoder's generated code needs no outer
  * instance — nested case classes break Janino codegen for the state
  * (de)serializer.
  */
final case class SeenState(expiresAtMs: Long)

/**
 * D3 — stateful TTL dedup (SURVEY §2.5/§2.9): per idempotent key, the first
 * arrival within the TTL window is SENT; every later same-key arrival while
 * the key is live in state emits SENT_OR_DUPLICATED. INITIAL_LOAD-tagged
 * records load state WITHOUT a send (bootstrap,
 * StateAsyncParDoWithHttpHandler.scala:133-145). TTL is last-write-wins per
 * key: re-armed on every non-duplicate arrival (:127,147-153); once expired
 * the next arrival is SENT again (StateBaseAsyncDoFn.java:156-166).
 *
 * Spark mapping: `groupByKey(idempotentKey).flatMapGroupsWithState` —
 * flatMap (not map) because the reference emits one output per INPUT, not
 * per key (SURVEY §7.3 hard-part #1). State is hash-partitioned on the key
 * across the state store, identical to Beam's keyed state at any scale.
 *
 * **Expiry is evaluated on the data path** (batch processing-time vs the
 * stored deadline), not only in the timer callback: a Spark query with
 * ProcessingTimeTimeout re-triggers no-data micro-batches forever to fire
 * timers (FlatMapGroupsWithStateExec.shouldRunAnotherBatch), which both
 * burns cluster cycles at trigger=0 and makes processAllAvailable() hang in
 * tests. The timer exists purely as state-store GC — semantics never depend
 * on when (or whether) it fires. `timerCleanup=false` drops the timer
 * entirely (expired entries then linger until touched — fine for tests and
 * bounded key spaces; keep it on for unbounded production streams).
 */
object StatefulTtlDedup {

  /** `ttlMillis <= 0` disables expiry (global-window semantics, W2).
    * `clockMs` overrides the processing-time clock — Beam's TestStream
    * controls processing time implicitly; Spark's is wall-clock, so TTL
    * determinism in tests needs an injectable clock (SURVEY §7.3 #3). The
    * closure must be serializable (capture an `object`, not test state).
    */
  def apply(ds: Dataset[MyEventRecord], ttlMillis: Long,
      timerCleanup: Boolean = true,
      clockMs: Option[() => Long] = None): Dataset[Marked] = {
    implicit val stateEnc: Encoder[SeenState] = Encoders.product[SeenState]
    implicit val outEnc: Encoder[Marked] = Encoders.product[Marked]
    implicit val keyEnc: Encoder[String] = Encoders.STRING

    val useTimer = ttlMillis > 0 && timerCleanup
    val timeoutConf =
      if (useTimer) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout

    ds.groupByKey(_.idempotentKey)
      .flatMapGroupsWithState[SeenState, Marked](OutputMode.Append, timeoutConf) {
        (key: String, records: Iterator[MyEventRecord], state: GroupState[SeenState]) =>
          if (state.hasTimedOut) {
            // GC: clear the bag (StateBaseAsyncDoFn.java:156-166)
            state.remove()
            Iterator.empty
          } else {
            val nowMs = clockMs.map(_.apply())
              .getOrElse(state.getCurrentProcessingTimeMs())
            val seenAtStart = state.exists && nowMs < state.get.expiresAtMs
            var seen = seenAtStart
            val out = records.map { r =>
              val status =
                if (r.isInitialLoad) {
                  // bootstrap: remember the key, never send
                  seen = true
                  Marked.Dup
                } else if (seen) Marked.Dup
                else {
                  seen = true
                  Marked.Sent
                }
              Marked(key, r, status)
            }.toVector // materialize before touching state (iterator is lazy)
            if (seen && !seenAtStart) {
              // TTL armed only on the bag-empty→occupied transition:
              // duplicates do NOT extend the window — the reference's timer
              // is set by non-dup elements only (:91-94,127,147-153); a dup
              // hit emits its marker without touching state
              val deadline =
                if (ttlMillis > 0) nowMs + ttlMillis else Long.MaxValue
              state.update(SeenState(deadline))
              if (useTimer) state.setTimeoutDuration(ttlMillis)
            }
            out.iterator
          }
      }
  }
}
