package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One finalized ranking row: item's count and rank within its window. */
case class WindowTopK(window_start_ms: Long, item: String, n: Long, rank: Int)

/**
 * Streaming per-window top-k heavy hitters on `transformWithState`:
 * grouped by tumbling-window start, a `MapState[item, count]` accumulates
 * exact counts as batches arrive, and a single EVENT-TIME timer at window
 * end emits the final ranking exactly once (when the watermark passes the
 * window) and clears the window's state — the streaming twin of the batch
 * `Sketches.heavyHitters` gate, with per-window state lifetime instead of
 * a global sketch.
 *
 * Determinism: ranking is (count desc, item asc) — ties are stable — and
 * emission is watermark-driven append, so replays from a checkpoint
 * produce identical rows.
 *
 * Scale posture: state per open window is the window's distinct-item map,
 * bounded by `maxItemsPerWindow` (admission-capped: once a window has that
 * many distinct items, NEW items are dropped — existing items keep
 * counting; size the cap to the real key cardinality, or pre-aggregate
 * with `Sketches.countMin` when item cardinality is genuinely unbounded).
 * The top-k selection walks the map once with a k-bounded heap — no sort
 * of the full map. RocksDB provider recommended (off-heap state).
 */
class TopKProcessor(windowMs: Long, k: Int, maxItemsPerWindow: Int)
    extends StatefulProcessor[Long, (Long, String), WindowTopK] {

  @transient private var counts: MapState[String, Long] = _
  @transient private var nItems: ValueState[Long] = _
  @transient private var armed: ValueState[Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    counts = getHandle.getMapState[String, Long]("counts",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    nItems = getHandle.getValueState[Long]("nItems",
      Encoders.scalaLong, TTLConfig.NONE)
    armed = getHandle.getValueState[Boolean]("armed",
      Encoders.scalaBoolean, TTLConfig.NONE)
  }

  override def handleInputRows(windowStart: Long,
      rows: Iterator[(Long, String)],
      timerValues: TimerValues): Iterator[WindowTopK] = {
    if (!armed.exists()) {
      // event-time timer: fires when the watermark passes window end
      getHandle.registerTimer(windowStart + windowMs)
      armed.update(true)
    }
    var size = if (nItems.exists()) nItems.get() else 0L
    rows.foreach { case (_, item) =>
      if (counts.containsKey(item)) {
        counts.updateValue(item, counts.getValue(item) + 1L)
      } else if (size < maxItemsPerWindow) {
        counts.updateValue(item, 1L)
        size += 1L
      } // else: admission cap — new item dropped, documented approximation
    }
    nItems.update(size)
    Iterator.empty
  }

  override def handleExpiredTimer(windowStart: Long,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[WindowTopK] = {
    // k-bounded selection: heap ordered worst-first so the head is the
    // current loser; final ranking re-sorted (count desc, item asc)
    val worstFirst = Ordering.by[(String, Long), (Long, String)] {
      case (item, n) => (-n, item)
    }
    val heap = scala.collection.mutable.PriorityQueue.empty[(String, Long)](worstFirst)
    counts.iterator().foreach { p =>
      heap.enqueue((p._1, p._2))
      if (heap.size > k) heap.dequeue()
    }
    counts.clear(); nItems.clear(); armed.clear()
    val ranked: Seq[(String, Long)] = heap.dequeueAll.reverse
    ranked.zipWithIndex.map { case ((item, n), i) =>
      WindowTopK(windowStart, item, n, i + 1)
    }.iterator
  }
}

object TopKStream {
  /**
   * `ds` must already carry a WATERMARKED event-time column `etCol`
   * (Timestamp) and a string item column. Emits one [[WindowTopK]] row per
   * (closed window, top item), append mode.
   */
  def apply(ds: Dataset[_], etCol: String, itemCol: String,
      windowMs: Long, k: Int, maxItemsPerWindow: Int = 1 << 20): Dataset[WindowTopK] = {
    require(windowMs > 0 && k >= 1 && maxItemsPerWindow >= k)
    val spark = ds.sparkSession
    import spark.implicits._
    implicit val outEnc: Encoder[WindowTopK] = Encoders.product[WindowTopK]
    ds.toDF()
      .select(
        (expr(s"unix_millis($etCol) div $windowMs") * windowMs).as("__w"),
        col(itemCol).cast("string").as("__item"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .transformWithState(new TopKProcessor(windowMs, k, maxItemsPerWindow),
        TimeMode.EventTime(), OutputMode.Append)
  }
}
