package graft.streaming

import graft.SparkSpec
import graft.model.{MockData, MyEventRecord}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** D3 via transformWithState + native state TTL (RocksDB provider). */
class StatefulTtlDedupTwsSpec extends SparkSpec {
  import spark.implicits._

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  private def runStream(name: String,
      batches: Seq[Seq[MyEventRecord]], ttlMillis: Long): Seq[Marked] = {
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try {
      val input = MemoryStream[MyEventRecord]
      val query = StatefulTtlDedupTws(input.toDS(), ttlMillis)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      try {
        batches.foreach { b => input.addData(b); query.processAllAvailable() }
        spark.table(name).as[Marked].collect().toSeq
      } finally query.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }

  test("1 unique + 2 dups => 1 SENT + 2 SENT_OR_DUPLICATED (tws)") {
    val r = MockData.notSentDebitQuique
    val out = runStream("tws_e2e", Seq(Seq(r, r, r)), ttlMillis = 0L)
    assert(out.size == 3)
    assert(out.count(_.status == Marked.Sent) == 1)
    assert(out.count(_.status == Marked.Dup) == 2)
  }

  test("state persists across batches; INITIAL_LOAD never sends (tws)") {
    val boot = MockData.notSentDebitQuique.tagInitialLoad
    val fresh = MockData.notSentDebitQuique
    val other = MockData.notSentDebitAbuela
    val out = runStream("tws_boot",
      Seq(Seq(boot), Seq(fresh, other)), ttlMillis = 0L)
    assert(out.count(_.status == Marked.Sent) == 1) // only abuela
    assert(out.filter(_.status == Marked.Sent)
      .forall(_.record.customer.fullName.contains("Abuela Moreno")))
    assert(out.count(_.status == Marked.Dup) == 2) // boot marker + quique
  }

  test("native TTL expires state between batches (tws)") {
    // With a TTL the query runs TimeMode.ProcessingTime, where Spark keeps
    // re-triggering no-data batches — processAllAvailable() never returns,
    // and stop() kills whichever batch is mid-write (pages of benign
    // abort-commit noise). TTLConfig expiry is evaluated on the state READ
    // path, not by those batches, so disabling them here loses nothing and
    // makes the run deterministic and quiet.
    val NoDataKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val r = MockData.notSentDebitQuique
    val out = {
      implicit val sq = spark.sqlContext
      val prevProv = spark.conf.getOption(ProviderKey)
      val prevNoData = spark.conf.getOption(NoDataKey)
      spark.conf.set(ProviderKey, RocksDb)
      spark.conf.set(NoDataKey, "false")
      try {
        val input = MemoryStream[MyEventRecord]
        val query = StatefulTtlDedupTws(input.toDS(), ttlMillis = 300L)
          .writeStream.format("memory").queryName("tws_ttl")
          .outputMode(OutputMode.Append).start()
        try {
          input.addData(Seq(r)); query.processAllAvailable()
          Thread.sleep(700) // wall-clock: TTLConfig uses real processing time
          input.addData(Seq(r)); query.processAllAvailable()
          spark.table("tws_ttl").as[Marked].collect().toSeq
        } finally query.stop()
      } finally {
        prevProv.fold(spark.conf.unset(ProviderKey))(v => spark.conf.set(ProviderKey, v))
        prevNoData.fold(spark.conf.unset(NoDataKey))(v => spark.conf.set(NoDataKey, v))
      }
    }
    assert(out.map(_.status) == Seq(Marked.Sent, Marked.Sent))
  }
}
