package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.sql.Timestamp

/** K1 — windowed file sink: window-named directories, batch/stream parity,
  * zero-allowed-lateness watermark semantics (W5).
  */
class WindowedSinkSpec extends SparkSpec {
  import spark.implicits._

  test("batch write partitions rows into start_end window dirs") {
    val out = Files.createTempDirectory("wsink").resolve("data").toString
    val df = Seq(
      ("a", Timestamp.valueOf("2026-01-01 10:00:05")),
      ("b", Timestamp.valueOf("2026-01-01 10:00:40")),
      ("c", Timestamp.valueOf("2026-01-01 10:00:41"))
    ).toDF("v", "event_time")
    WindowedSink.writeBatch(df, "event_time", "30 seconds", out)
    val back = spark.read.parquet(out)
    val names = back.select("window_name").distinct()
      .as[String].collect().sorted.toSeq
    assert(names == Seq("20260101T100000_100030", "20260101T100030_100100"))
    val byWindow = back.groupBy("window_name").count()
      .as[(String, Long)].collect().toMap
    assert(byWindow("20260101T100000_100030") == 1)
    assert(byWindow("20260101T100030_100100") == 2)
  }

  test("immediate mode appends each batch's rows to their window dirs") {
    implicit val sq = spark.sqlContext
    val out = Files.createTempDirectory("wsink-i").resolve("data").toString
    val ckpt = Files.createTempDirectory("wsink-ickpt").toString
    val input = MemoryStream[(String, Timestamp)]
    val query = WindowedSink.start(
      input.toDF().toDF("v", "event_time"),
      "event_time", "30 seconds", "0 seconds", out, ckpt)
    try {
      input.addData(("p1", Timestamp.valueOf("2026-01-01 10:00:05")))
      query.processAllAvailable()
      // second pane of the SAME window, next batch (discarding panes, W4)
      input.addData(("p2", Timestamp.valueOf("2026-01-01 10:00:10")))
      query.processAllAvailable()
      val back = spark.read.parquet(out)
      assert(back.count() == 2)
      assert(back.select("window_name").distinct().as[String].head()
        == "20260101T100000_100030")
    } finally query.stop()
  }

  test("finalized mode writes a window once its watermark passes; late rows dropped (W5)") {
    implicit val sq = spark.sqlContext
    val out = Files.createTempDirectory("wsink-f").resolve("data").toString
    val ckpt = Files.createTempDirectory("wsink-fckpt").toString
    val input = MemoryStream[(String, Timestamp)]
    val query = WindowedSink.start(
      input.toDF().toDF("v", "event_time"),
      "event_time", "30 seconds", "0 seconds", out, ckpt, finalized = true)
    try {
      input.addData(("on-time", Timestamp.valueOf("2026-01-01 10:05:00")))
      query.processAllAvailable()
      // watermark = 10:05:00 → this row's window [10:00:00,10:00:30) is
      // already closed → dropped by the aggregation (allowedLateness = 0)
      input.addData(("late", Timestamp.valueOf("2026-01-01 10:00:00")))
      query.processAllAvailable()
      // advances the watermark past 10:05:30 → finalizes on-time's window
      input.addData(("pending", Timestamp.valueOf("2026-01-01 10:06:00")))
      query.processAllAvailable()
      input.addData(("pending2", Timestamp.valueOf("2026-01-01 10:07:00")))
      query.processAllAvailable()
      val got = spark.read.parquet(out).select("v").as[String].collect().toSet
      assert(got.contains("on-time")) // window finalized exactly once
      assert(!got.contains("late")) // dropped, not misfiled
      assert(!got.contains("pending2")) // its window is still open
    } finally query.stop()
  }

  test("finalized mode survives an epoch REPLAY without duplicating windows") {
    implicit val sq = spark.sqlContext
    val out = Files.createTempDirectory("wsink-r").resolve("data").toString
    val ckpt = Files.createTempDirectory("wsink-rckpt").toString
    val input = MemoryStream[(String, Timestamp)]
    // self-terminating bounded drains, one fresh run each — the same
    // restart harness the source-resume specs use
    def drain(): Unit = {
      val q = WindowedSink.start(
        input.toDF().toDF("v", "event_time"),
        "event_time", "30 seconds", "0 seconds", out, ckpt, finalized = true,
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination()
    }
    input.addData(("w1", Timestamp.valueOf("2026-01-01 10:00:05")))
    drain()
    // advance the watermark well past w1's window → finalize + write it
    input.addData(("w2", Timestamp.valueOf("2026-01-01 10:09:00")))
    drain()
    assert(spark.read.parquet(out).count() === 1) // w1 written once
    // simulate a crash AFTER the sink wrote but BEFORE the engine recorded
    // the epoch: delete the last commit marker — restart replays that epoch
    val commits = new java.io.File(s"$ckpt/commits")
    val last = commits.listFiles().filter(_.getName.forall(_.isDigit))
      .maxBy(_.getName.toInt)
    assert(last.delete())
    // the local ChecksumFileSystem keeps a .N.crc sibling; leaving it
    // behind makes the replayed commit's rename fail as "already exists"
    new java.io.File(commits, s".${last.getName}.crc").delete()
    drain() // replays the deleted epoch against the sink
    val rows = spark.read.parquet(out).select("v").as[String].collect().toSeq
    assert(rows === Seq("w1"),
      s"replayed epoch must rewrite its window, not duplicate it: $rows")
  }
}
