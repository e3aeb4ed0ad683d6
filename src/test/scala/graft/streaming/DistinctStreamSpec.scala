package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import java.sql.Timestamp

/** Streaming per-window distinct counts: constant-size HLL state per open
  * window, event-time timer finalizes each window exactly once. */
class DistinctStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s"2026-01-01 $s")

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  private def run(name: String)(
      feed: (MemoryStream[(Timestamp, String)],
        org.apache.spark.sql.streaming.StreamingQuery) => Unit): Seq[(Long, Long)] = {
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try {
      val input = MemoryStream[(Timestamp, String)]
      val ds = input.toDF().toDF("et", "uid").withWatermark("et", "5 seconds")
      val out = DistinctStream(ds, "et", "uid", windowMs = 60000L)
      val query = out.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      try feed(input, query) finally query.stop()
      spark.table(name).as[WindowDistinct].collect()
        .map(r => (r.window_start_ms, r.distinct_est)).sortBy(_._1).toSeq
    } finally {
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }

  test("cross-batch union per window; estimate within 3% of exact; exactly-once finalize") {
    // window 10:00: 3000 distinct uids split across two batches with heavy
    // duplication; window 10:01: 50 distinct
    val w0 = (0 until 3000).map(i => (ts(f"10:00:${i % 50}%02d"), s"u$i"))
    val (b1, b2) = w0.splitAt(1800)
    val dups = (0 until 1500).map(i => (ts("10:00:30"), s"u$i")) // all repeats
    val w1 = (0 until 50).map(i => (ts(f"10:01:${i % 40}%02d"), s"v$i"))
    val rows = run("dist1") { (input, q) =>
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData((b2 ++ dups): _*)
      q.processAllAvailable()
      input.addData(w1: _*) // opens 10:01 but does not close it yet
      q.processAllAvailable()
      input.addData((ts("10:03:00"), "late-driver")) // watermark past both
      q.processAllAvailable()
    }
    assert(rows.map(_._1) === Seq(
      Timestamp.valueOf("2026-01-01 10:00:00").getTime,
      Timestamp.valueOf("2026-01-01 10:01:00").getTime))
    val est0 = rows(0)._2.toDouble
    assert(math.abs(est0 - 3000.0) / 3000.0 < 0.03,
      s"estimate $est0 off from 3000 by more than 3%")
    // 50 distinct is far below HLL's dense threshold — exact there
    assert(rows(1)._2 === 50L)
  }

  test("sketch union helper merges shard sketches") {
    import org.apache.datasketches.hll.{HllSketch, TgtHllType}
    def sk(ids: Range): Array[Byte] = {
      val s = new HllSketch(12, TgtHllType.HLL_8)
      ids.foreach(i => s.update(s"id$i"))
      s.toCompactByteArray
    }
    val merged = DistinctStream.union(sk(0 until 1000), sk(500 until 1500))
    val est = HllSketch.heapify(merged).getEstimate
    assert(math.abs(est - 1500.0) / 1500.0 < 0.03)
  }
}
