package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** D1 in streaming form (SURVEY §2.5): `dropDuplicates` over an unbounded
  * keyed stream — the Spark-native `distinctByKey`
  * (mediation/MediationService.scala:115,125,219).
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("streaming dropDuplicates suppresses same-key arrivals across batches") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(String, Int)]
    val query = input.toDF().toDF("key", "v")
      .dropDuplicates("key")
      .writeStream.format("memory").queryName("d1_stream")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(("a", 1), ("a", 2), ("b", 1))
      query.processAllAvailable()
      input.addData(("a", 3), ("c", 1)) // a is a known key; c is novel
      query.processAllAvailable()
      val keys = spark.table("d1_stream").as[(String, Int)]
        .collect().map(_._1).sorted.toSeq
      assert(keys == Seq("a", "b", "c")) // exactly one row per key, ever
    } finally query.stop()
  }
}
