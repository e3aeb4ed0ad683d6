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
}

/** Driver-side collector for the refresh test (object = JVM-shared). */
object LookupRefreshSink {
  val rows = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
}
