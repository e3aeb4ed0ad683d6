package graft.apps

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** §3.2 — stream-static lookup join with defaults on miss
  * (MinimalPubSubBQLookup.scala:39-45).
  */
class LookupJoinAppSpec extends SparkSpec {
  import spark.implicits._

  test("streaming lookup enriches hits and defaults misses") {
    implicit val sq = spark.sqlContext
    val lookup = Seq(("k1", "v1"), ("k2", "v2")).toDF("key", "opt")
    val input = MemoryStream[String]
    val stream = input.toDF().withColumnRenamed("value", "key")

    val query = LookupJoinApp.stream(stream, lookup, "key",
      Map("opt" -> lit("")))
      .format("memory").queryName("lookup_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData("k1", "kX", "k2")
      query.processAllAvailable()
      val rows = spark.table("lookup_out").as[(String, String)].collect().toMap
      assert(rows == Map("k1" -> "v1", "kX" -> "", "k2" -> "v2"))
    } finally query.stop()
  }

  test("streamWithRefresh: lookup updates between batches are joined") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("lookup-tbl")
      .resolve("tbl").toString
    Seq(("k1", "v1")).toDF("key", "opt").write.parquet(dir)

    val input = MemoryStream[String]
    val query = LookupJoinApp.streamWithRefresh(
      input.toDF().withColumnRenamed("value", "key"),
      () => spark.read.parquet(dir), "key", Map("opt" -> lit(""))) {
        (batch, _) => batch.as[(String, String)].collect()
          .foreach(LookupRefreshSink.rows.add)
      }
      .start()
    try {
      input.addData("k1"); query.processAllAvailable()
      // append a new snapshot row — the next batch re-reads the table
      Seq(("k2", "v2")).toDF("key", "opt").write.mode("append").parquet(dir)
      input.addData("k2"); query.processAllAvailable()
      val got = new java.util.ArrayList(LookupRefreshSink.rows)
      assert(got.contains(("k1", "v1")))
      assert(got.contains(("k2", "v2"))) // refreshed row picked up
    } finally query.stop()
  }

  test("stream x external table service: the lookup side reads over the wire (S5 composed)") {
    implicit val sq = spark.sqlContext
    val srv = graft.sources.v2.GraftTableService.shared // serves 20k rows
    val lookup = LookupJoinApp.serviceLookup(spark, "127.0.0.1", srv.port)
    val input = MemoryStream[Long]
    val stream = input.toDF().withColumnRenamed("value", "doc_id")
    val query = LookupJoinApp.stream(stream, lookup, "doc_id",
      Map("lang" -> lit("??"), "score" -> lit(-1L)))
      .format("memory").queryName("svc_lookup_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(0L, 7L, 123L, 999999L) // last one misses (beyond rows)
      query.processAllAvailable()
      val rows = spark.table("svc_lookup_out")
        .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(rows(0L) === (("en", 0L)))
      assert(rows(7L) === ((graft.sources.v2.GraftTableService.lang(7L),
        graft.sources.v2.GraftTableService.score(7L))))
      assert(rows(123L) === ((graft.sources.v2.GraftTableService.lang(123L),
        graft.sources.v2.GraftTableService.score(123L))))
      assert(rows(999999L) === (("??", -1L)), "a service miss takes the defaults")
    } finally query.stop()
  }

  test("streamWithRefresh x service: each batch re-reads the CURRENT service snapshot") {
    implicit val sq = spark.sqlContext
    // two servers stand in for the external table before/after an update
    val small = graft.sources.v2.GraftTableService.serve(rows = 10L)
    val big = graft.sources.v2.GraftTableService.serve(rows = 1000L)
    try {
      @volatile var port = small.port
      val input = MemoryStream[Long]
      val query = LookupJoinApp.streamWithRefresh(
        input.toDF().withColumnRenamed("value", "doc_id"),
        () => LookupJoinApp.serviceLookup(spark, "127.0.0.1", port),
        "doc_id", Map("lang" -> lit("??"), "score" -> lit(-1L))) {
          (batch, _) => batch.as[(Long, String, Long)].collect()
            .foreach(ServiceRefreshSink.rows.add)
        }
        .start()
      try {
        input.addData(500L); query.processAllAvailable() // not in small table
        port = big.port // "the external table grew"
        input.addData(500L); query.processAllAvailable() // hit in big table
        val got = new java.util.ArrayList(ServiceRefreshSink.rows)
        assert(got.contains((500L, "??", -1L)),
          "batch 1 must see the pre-update snapshot (miss -> defaults)")
        assert(got.contains((500L, graft.sources.v2.GraftTableService.lang(500L),
          graft.sources.v2.GraftTableService.score(500L))),
          "batch 2 must see the refreshed snapshot")
      } finally query.stop()
    } finally { small.close(); big.close() }
  }
}

/** Driver-side collector for the refresh test (object = JVM-shared). */
object LookupRefreshSink {
  val rows = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
}

/** Driver-side collector for the service-refresh test. */
object ServiceRefreshSink {
  val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long)]()
}
