package graft.apps

import graft.SparkSpec
import graft.model.{MockData, SendResult}
import graft.streaming.AsyncEnrich
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** The runnable shape: file-stream source drained once with
  * Trigger.AvailableNow through the full pipeline (bounded replay).
  */
class MediationFileStreamSpec extends SparkSpec {
  import spark.implicits._

  test("AvailableNow drains a directory feed once and terminates") {
    def tmp(p: String) = Files.createTempDirectory(p).toString
    val events = tmp("fs-events"); val out = tmp("fs-out")
    val toxic = tmp("fs-toxic"); val ckpt = tmp("fs-ckpt")

    spark.createDataset(Seq(
      MockData.notSentDebitQuique, MockData.notSentDebitQuique, // 1 dup
      MockData.notSentDebitAbuela,
      MockData.invalidRecord))
      .write.mode("overwrite").parquet(events)

    val queries = MediationApp.start(spark,
      MediationApp.fileStream(spark, events),
      historicalPaths = Nil,
      MediationApp.Config(ttlMillis = 0L, timerCleanup = false,
        trigger = Trigger.AvailableNow(),
        enrich = AsyncEnrich.Config(clientId = "fs-spec", backoffMillis = 1L)),
      () => new AsyncEnrich.StubClient(), out, toxic, ckpt)
    // AvailableNow: both queries process the backlog then stop on their own.
    // awaitTermination(timeout) returns FALSE on expiry without throwing —
    // assert it, or a slow run falls through to stop(), kills the in-flight
    // write and the read below finds an empty directory (seen on CI under
    // host contention).
    queries.foreach(q => assert(q.awaitTermination(300000),
      "AvailableNow query failed to drain within 300s"))
    queries.foreach(_.stop())

    val results = spark.read.parquet(out).as[SendResult].collect().toSeq
    assert(results.size == 3) // 2 quique (1 send + 1 marker) + 1 abuela
    assert(results.count(_.response.id == 101) == 2)
    assert(results.count(_.response.title == "SENT_OR_DUPLICATED") == 1)
    assert(spark.read.parquet(toxic).count() == 1)
  }
}
