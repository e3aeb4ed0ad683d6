package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import java.sql.Timestamp

/** Streaming per-window top-k: exact counts in MapState, event-time timer
  * finalizes each window exactly once when the watermark passes it. */
class TopKStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s"2026-01-01 $s")

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  private def run(name: String, maxItems: Int = 1 << 20)(
      feed: (MemoryStream[(Timestamp, String)],
        org.apache.spark.sql.streaming.StreamingQuery) => Unit): Set[(Long, String, Long, Int)] = {
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try {
      val input = MemoryStream[(Timestamp, String)]
      val ds = input.toDF().toDF("et", "item").withWatermark("et", "5 seconds")
      val out = TopKStream(ds, "et", "item", windowMs = 60000L, k = 2,
        maxItemsPerWindow = maxItems)
      val query = out.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      try feed(input, query) finally query.stop()
      spark.table(name).as[WindowTopK].collect()
        .map(r => (r.window_start_ms, r.item, r.n, r.rank)).toSet
    } finally {
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }

  test("window finalizes once on watermark with (count desc, item asc) ranks") {
    val got = run("topk1") { (input, query) =>
      input.addData((ts("10:00:01"), "a"), (ts("10:00:02"), "b"),
        (ts("10:00:03"), "a"))
      query.processAllAvailable()
      // same window, later batch: counts must merge across batches
      input.addData((ts("10:00:10"), "c"), (ts("10:00:11"), "a"),
        (ts("10:00:12"), "b"))
      query.processAllAvailable()
      assert(spark.table("topk1").isEmpty, "window emitted before watermark")
      // watermark pusher far past 10:01:00 + 5s delay
      input.addData((ts("10:02:00"), "z"))
      query.processAllAvailable()
    }
    val w = ts("10:00:00").getTime
    assert(got == Set((w, "a", 3L, 1), (w, "b", 2L, 2)), s"got $got")
  }

  test("tie on count ranks the smaller item first; separate windows independent") {
    val got = run("topk2") { (input, query) =>
      input.addData((ts("10:00:01"), "x"), (ts("10:00:02"), "m"),
        (ts("10:01:01"), "q"), (ts("10:01:02"), "q"), (ts("10:01:03"), "p"))
      query.processAllAvailable()
      input.addData((ts("10:03:00"), "z"))
      query.processAllAvailable()
    }
    val w0 = ts("10:00:00").getTime
    val w1 = ts("10:01:00").getTime
    assert(got == Set(
      (w0, "m", 1L, 1), (w0, "x", 1L, 2), // tie -> lexicographic
      (w1, "q", 2L, 1), (w1, "p", 1L, 2)), s"got $got")
  }

  test("admission cap: existing items keep counting, new items dropped") {
    val got = run("topk3", maxItems = 2) { (input, query) =>
      input.addData((ts("10:00:01"), "a"), (ts("10:00:02"), "b"))
      query.processAllAvailable()
      // c arrives when the window already holds 2 distinct items -> dropped;
      // a keeps counting
      input.addData((ts("10:00:03"), "c"), (ts("10:00:04"), "a"))
      query.processAllAvailable()
      input.addData((ts("10:02:00"), "z"))
      query.processAllAvailable()
    }
    val w = ts("10:00:00").getTime
    assert(got == Set((w, "a", 2L, 1), (w, "b", 1L, 2)), s"got $got")
  }
}
