package graft.functions

import graft.SparkSpec
import graft.model.{Customer, Event, MyEventRecord, Notification}
import org.apache.spark.sql.functions._

/**
 * I2 wire-codec contract: encode∘decode = id across every wire type the
 * reference carries (nullable strings/longs/ints/booleans/doubles, nested
 * records) plus the engine extensions (binary, float arrays), and the
 * typed path matches the reference's toByteBuffer semantics
 * (mediation/avro/MyEventRecord.java:21-52).
 */
class AvroCodecSpec extends SparkSpec {

  test("column round trip: nullable multi-type struct incl. binary and float array") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("abc"), Some(2.5), Some(Array[Byte](1, 2, 3)), Seq(1.5f, -2.0f)),
      (2L, None, None, None, Seq.empty[Float]),
      (3L, Some(""), Some(-0.0), Some(Array.empty[Byte]), Seq(Float.MinValue))
    ).toDF("id", "s", "d", "b", "v")
    val ddl = "id BIGINT, s STRING, d DOUBLE, b BINARY, v ARRAY<FLOAT>"
    val back = df
      .select(AvroKit.toAvro(struct(col("id"), col("s"), col("d"), col("b"), col("v"))).as("wire"))
      .select(AvroKit.fromAvro(col("wire"), ddl).as("r"))
      .select(col("r.id"), col("r.s"), col("r.d"), col("r.b"), col("r.v"))
    val orig = df.collect().map(_.toSeq.map {
      case a: Array[Byte] => a.toSeq
      case x => x
    })
    val got = back.collect().map(_.toSeq.map {
      case a: Array[Byte] => a.toSeq
      case x => x
    })
    assert(got.toSeq == orig.toSeq)
  }

  test("typed MyEventRecord wire round trip incl. all-None records") {
    val full = MyEventRecord(
      Event(Some("e1"), Some("tx-1"), Some(1723400000000L)),
      Customer(Some("c1"), Some("Jane Doe")),
      Notification(Some("n1"), Some("hello"), Some(2), Some(true), Some(9.75), Some("ok")))
    val empty = MyEventRecord()
    for (r <- Seq(full, empty)) {
      val bytes = MyEventRecordWire.toBytes(r)
      assert(MyEventRecordWire.fromBytes(bytes) == r)
    }
    // wire schema carries the reference's ["null", T] union convention
    assert(MyEventRecordWire.schema.getField("event").schema().isUnion)
  }

  test("typed and column paths produce identical wire bytes") {
    import spark.implicits._
    val r = MyEventRecord(
      Event(Some("e1"), Some("tx-1"), Some(5L)),
      Customer(Some("c1"), None),
      Notification(None, Some("msg"), None, Some(false), None, None))
    val viaColumn = Seq(r).toDS().toDF()
      .select(AvroKit.toAvro(struct(col("event"), col("customer"), col("notification"))).as("wire"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(viaColumn.toSeq == MyEventRecordWire.toBytes(r).toSeq)
  }
}
