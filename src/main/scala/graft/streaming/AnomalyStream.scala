package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One flagged observation: the value, the history size it was scored
  * against, and its z-score in micro-units. */
case class Anomaly(key: String, value: Long, n_history: Long, z_micro: Long)

/** Exact per-key running moments (n, Σv, Σv²) — integer-valued, so state
  * is replay-identical; mean/std derive on demand. */
case class MomentState(n: Long, s: Long, ss: Long)

/**
 * Streaming per-key anomaly detection: each observation is scored against
 * its key's RUNNING history (population mean/std from exact integer
 * moment sums held in `ValueState` — the streaming twin of
 * [[graft.ops.Stats.zscoreOutliers]], whose batch gate pins the same
 * formula) and flagged when |v − μ| > z·σ; the observation then joins the
 * history either way. No emission until a key has `minHistory`
 * observations (a cold start has no distribution to violate), and σ = 0
 * histories (constant so far) flag any differing value with z pinned to
 * ±∞ → emitted as ±10⁹ micro.
 *
 * State per key is three longs — constant, no window buffer — so key
 * cardinality is the only scale dimension (RocksDB provider holds it
 * off-heap). Scoring precedes the state update, so a burst of identical
 * outliers flags EVERY burst member rather than absorbing them.
 */
class AnomalyProcessor(z: Double, minHistory: Long)
    extends StatefulProcessor[String, (String, Long), Anomaly] {

  @transient private var st: ValueState[MomentState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[MomentState]("moments",
      Encoders.product[MomentState], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(String, Long)],
      timerValues: TimerValues): Iterator[Anomaly] = {
    var cur = if (st.exists()) st.get() else MomentState(0L, 0L, 0L)
    val out = scala.collection.mutable.ArrayBuffer.empty[Anomaly]
    rows.foreach { case (_, v) =>
      if (cur.n >= minHistory) {
        val n = cur.n.toDouble
        val mean = cur.s.toDouble / n
        val std = math.sqrt((cur.ss.toDouble - (cur.s.toDouble * cur.s.toDouble) / n) / n)
        if (std == 0.0) {
          if (v.toDouble != mean)
            out += Anomaly(key, v, cur.n,
              if (v > mean) 1000000000L else -1000000000L)
        } else {
          val zs = (v.toDouble - mean) / std
          if (math.abs(zs) > z)
            out += Anomaly(key, v, cur.n, math.round(zs * 1e6))
        }
      }
      cur = MomentState(cur.n + 1L, cur.s + v, cur.ss + v * v)
    }
    st.update(cur)
    out.iterator
  }
}

object AnomalyStream {
  /** `ds` rows are (key, integer-scaled value); emits [[Anomaly]] rows in
    * append mode. Requires the RocksDB state store provider (as all
    * transformWithState ops here). */
  def apply(ds: Dataset[(String, Long)], z: Double = 3.0,
      minHistory: Long = 20L): Dataset[Anomaly] = {
    implicit val outEnc: Encoder[Anomaly] = Encoders.product[Anomaly]
    ds.groupByKey(_._1)(Encoders.STRING)
      .transformWithState(new AnomalyProcessor(z, minHistory),
        TimeMode.None(), OutputMode.Append)
  }
}
