package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import java.sql.Timestamp

/** Stream-stream equi-join with watermarks and a time-range condition —
  * a capability the reference cannot express (Beam side inputs are static
  * per window; SURVEY §2.6 notes all reference joins are broadcast-lookup).
  * Spark buffers both sides in watermark-bounded state.
  */
class StreamStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  test("orders join payments within a 1-minute event-time range") {
    implicit val sq = spark.sqlContext
    val orders = MemoryStream[(String, Timestamp)]
    val payments = MemoryStream[(String, Timestamp)]

    val o = orders.toDF().toDF("order_id", "o_time")
      .withWatermark("o_time", "10 seconds")
    val p = payments.toDF().toDF("pay_order_id", "p_time")
      .withWatermark("p_time", "10 seconds")

    val joined = o.join(p,
      col("order_id") === col("pay_order_id") &&
        col("p_time") >= col("o_time") &&
        col("p_time") <= col("o_time") + expr("INTERVAL 1 MINUTE"))

    val query = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode(OutputMode.Append).start()
    try {
      orders.addData(("A", Timestamp.valueOf("2026-01-01 10:00:00")),
        ("B", Timestamp.valueOf("2026-01-01 10:00:05")))
      query.processAllAvailable()
      // A pays within the window; B pays too late (>1 min after order)
      payments.addData(("A", Timestamp.valueOf("2026-01-01 10:00:30")),
        ("B", Timestamp.valueOf("2026-01-01 10:02:00")))
      query.processAllAvailable()
      val got = spark.table("ss_join").select("order_id").as[String]
        .collect().toSeq
      assert(got == Seq("A")) // matched in-range; B's payment out of range
    } finally query.stop()
  }

  test("left-outer join emits unmatched orders once the watermark closes them") {
    implicit val sq = spark.sqlContext
    val orders = MemoryStream[(String, Timestamp)]
    val payments = MemoryStream[(String, Timestamp)]

    val o = orders.toDF().toDF("order_id", "o_time")
      .withWatermark("o_time", "5 seconds")
    val p = payments.toDF().toDF("pay_order_id", "p_time")
      .withWatermark("p_time", "5 seconds")

    val joined = o.join(p,
      col("order_id") === col("pay_order_id") &&
        col("p_time") >= col("o_time") &&
        col("p_time") <= col("o_time") + expr("INTERVAL 1 MINUTE"),
      "left_outer")

    val query = joined.writeStream.format("memory").queryName("ss_louter")
      .outputMode(OutputMode.Append).start()
    try {
      orders.addData(("A", Timestamp.valueOf("2026-01-01 10:00:00")),
        ("B", Timestamp.valueOf("2026-01-01 10:00:01")))
      payments.addData(("A", Timestamp.valueOf("2026-01-01 10:00:30")))
      query.processAllAvailable()
      // matched side can emit immediately; B is still provisional — the
      // engine must NOT null-emit it while a matching payment could arrive
      val early = spark.table("ss_louter")
        .select("order_id", "pay_order_id")
        .as[(String, Option[String])].collect().toMap
      assert(early.get("A").flatten.contains("A"))
      assert(!early.contains("B"))
      // advance both watermarks past B's match window => B emits with null
      orders.addData(("Z", Timestamp.valueOf("2026-01-01 10:05:00")))
      payments.addData(("Z2", Timestamp.valueOf("2026-01-01 10:05:00")))
      query.processAllAvailable()
      // outer results surface on the state-eviction micro-batch after the
      // watermark move; run one more empty batch to collect them
      orders.addData(("Z3", Timestamp.valueOf("2026-01-01 10:05:01")))
      query.processAllAvailable()
      val late = spark.table("ss_louter")
        .select("order_id", "pay_order_id")
        .as[(String, Option[String])].collect().toMap
      assert(late.get("B").exists(_.isEmpty), late.toString)
    } finally query.stop()
  }
}
