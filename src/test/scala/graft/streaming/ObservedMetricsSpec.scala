package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** K5/A1 — the reference's `map(log.info(count))` taps re-expressed as
  * `df.observe` metrics surfaced through QueryProgressEvent: zero extra
  * passes over the data (metrics piggyback the batch) vs a `count()` tap
  * which would re-execute the stream.
  */
class ObservedMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("observe metrics surface per-batch row counts via the listener") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Int]
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryIdle(e: QueryIdleEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val m = e.progress.observedMetrics
        if (m.containsKey("tap")) {
          val row = m.get("tap")
          ObservedMetricsSink.rows.addAndGet(row.getAs[Long]("rows"))
          ObservedMetricsSink.evens.addAndGet(row.getAs[Long]("evens"))
        }
      }
    }
    spark.streams.addListener(listener)
    val query = input.toDF().toDF("v")
      .observe("tap", count(lit(1)).as("rows"),
        count(when(col("v") % 2 === 0, 1)).as("evens"))
      .writeStream.format("memory").queryName("obs_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(1, 2, 3, 4, 5)
      query.processAllAvailable()
      input.addData(6, 7)
      query.processAllAvailable()
      // listener events are async — wait briefly for delivery
      val deadline = System.currentTimeMillis() + 10000
      while (ObservedMetricsSink.rows.get() < 7 &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(ObservedMetricsSink.rows.get() == 7)
      assert(ObservedMetricsSink.evens.get() == 3) // 2, 4, 6
    } finally {
      query.stop()
      spark.streams.removeListener(listener)
    }
  }
}

object ObservedMetricsSink {
  val rows = new java.util.concurrent.atomic.AtomicLong(0)
  val evens = new java.util.concurrent.atomic.AtomicLong(0)
}
