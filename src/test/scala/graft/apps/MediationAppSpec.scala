package graft.apps

import graft.SparkSpec
import graft.model.{MockData, MyEventRecord, SendResult}
import graft.streaming.AsyncEnrich
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.nio.file.Files

/** End-to-end recomposition of the reference's flagship pipeline
  * (MediationServiceSpec scenarios, hermetic stub client).
  */
class MediationAppSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  test("e2e: invalid → toxic, dup → marker, novel → send (full pipeline)") {
    implicit val sq = spark.sqlContext
    val out = tmp("med-out"); val toxic = tmp("med-toxic"); val ckpt = tmp("med-ckpt")

    val input = MemoryStream[MyEventRecord]
    val queries = MediationApp.start(spark, input.toDS(),
      historicalPaths = Nil, MediationApp.Config(ttlMillis = 0L, timerCleanup = false, enrich =
        AsyncEnrich.Config(clientId = "app-e2e", backoffMillis = 1L)),
      () => new AsyncEnrich.StubClient(), out, toxic, ckpt)
    try {
      // 1 unique + 2 dups + 1 invalid (reference e2e multiset)
      input.addData(Seq(MockData.notSentDebitQuique, MockData.notSentDebitQuique,
        MockData.notSentDebitQuique, MockData.invalidRecord))
      queries.foreach(_.processAllAvailable())

      val results = spark.read.parquet(out).as[SendResult].collect().toSeq
      assert(results.size == 3) // every valid input produced an output row
      assert(results.count(_.response.id == 101) == 1)
      assert(results.count(_.response.title == "SENT_OR_DUPLICATED") == 2)
      // toxic quarantine wrote the invalid record into a window-named dir
      val toxicRows = spark.read.parquet(toxic)
      assert(toxicRows.count() == 1)
      assert(toxicRows.columns.contains("window_name"))
    } finally queries.foreach(_.stop())
  }

  test("historical bootstrap: D2 anti-join drops known keys with NO output") {
    implicit val sq = spark.sqlContext
    val out = tmp("med2-out"); val toxic = tmp("med2-toxic"); val ckpt = tmp("med2-ckpt")
    val hist = tmp("med2-hist")
    // historical snapshot containing quique's key
    spark.createDataset(Seq(MockData.trueSentDebitQuique))
      .write.mode("overwrite").parquet(hist)

    val input = MemoryStream[MyEventRecord]
    val queries = MediationApp.start(spark, input.toDS(),
      historicalPaths = Seq(hist), MediationApp.Config(ttlMillis = 0L, timerCleanup = false, enrich =
        AsyncEnrich.Config(clientId = "app-hist", backoffMillis = 1L)),
      () => new AsyncEnrich.StubClient(), out, toxic, ckpt)
    try {
      input.addData(Seq(MockData.notSentDebitQuique, MockData.notSentDebitAbuela))
      queries.foreach(_.processAllAvailable())
      val results = spark.read.parquet(out).as[SendResult].collect().toSeq
      // quique is historical → silently dropped (MediationServiceSpec:135-154);
      // abuela is novel → one real send
      assert(results.size == 1)
      assert(results.head.record.customer.fullName.contains("Abuela Moreno"))
      assert(results.head.response.id == 101)
    } finally queries.foreach(_.stop())
  }

  test("bootstrap() dedups and tags INITIAL_LOAD") {
    val hist = tmp("boot-hist")
    spark.createDataset(Seq(
      MockData.notSentDebitQuique, MockData.trueSentDebitQuique,
      MockData.invalidRecord)).write.mode("overwrite").parquet(hist)
    // nonexistent path is pruned (F4), not a job failure
    val boot = MediationApp.bootstrap(spark, Seq(hist, "/no/such/dir"))
      .collect().toSeq
    assert(boot.size == 1) // same idempotent key → one record; invalid dropped
    assert(boot.head.isInitialLoad)
  }
}
