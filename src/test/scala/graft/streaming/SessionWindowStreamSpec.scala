package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import java.sql.Timestamp

/** Streaming session windows — the unbounded twin of the gated batch query
  * `w8_session_window`: gap-based sessions grow while events keep arriving
  * within the gap, and are emitted exactly once (append mode) when the
  * watermark passes the session end. The reference has no session windowing
  * at all (SURVEY §2.8: fixed + global only); Spark's `session_window`
  * makes it one grouping expression, with state bounded by the watermark.
  */
class SessionWindowStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s"2026-01-01 $s")

  test("gap sessions merge across batches and finalize on watermark") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val sessions = input.toDF().toDF("user", "et")
      .withWatermark("et", "10 seconds")
      .groupBy(session_window(col("et"), "30 seconds"), col("user"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user"),
        unix_millis(col("session_window.start")).as("start_ms"),
        unix_millis(col("session_window.end")).as("end_ms"),
        col("n_events"))

    val query = sessions.writeStream.format("memory").queryName("sw_stream")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: A's chain 00:00 → 00:10 → 00:20 must merge into ONE
      // session even though events span micro-batches; B is a singleton
      input.addData(("A", ts("10:00:00")), ("B", ts("10:00:05")))
      query.processAllAvailable()
      input.addData(("A", ts("10:00:10")), ("A", ts("10:00:20")))
      query.processAllAvailable()
      // nothing finalized yet: watermark (max 00:20 - 10s) < session ends
      assert(spark.table("sw_stream").isEmpty)

      // late-but-in-gap event extends A's open session
      input.addData(("A", ts("10:00:40")))
      query.processAllAvailable()

      // watermark pusher: far-future event closes everything before it
      input.addData(("C", ts("10:05:00")))
      query.processAllAvailable()
      val got = spark.table("sw_stream")
        .select("user", "start_ms", "end_ms", "n_events")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val t0 = ts("10:00:00").getTime
      assert(got == Set(
        // A: 00:00..00:40 + 30s gap → end 01:10, 4 events in one session
        ("A", t0, t0 + 70000L, 4L),
        // B: singleton 00:05 → end 00:35
        ("B", t0 + 5000L, t0 + 35000L, 1L)),
        s"got $got")

      // state is watermark-bounded: C's session is still open (not emitted)
      assert(!got.exists(_._1 == "C"))
    } finally query.stop()
  }
}
