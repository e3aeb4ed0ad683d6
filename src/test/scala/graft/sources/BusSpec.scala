package graft.sources

import graft.SparkSpec
import graft.functions.MyEventRecordWire
import graft.model.MockData

/**
 * Bus glue minus the transport: the Kafka branch itself needs the connector
 * jar (absent here — see [[Bus]]), but the wire halves are transport-
 * independent: a `value: binary` column round-trips through
 * encodeRecords∘decodeRecords, and the bytes interoperate with the typed
 * [[MyEventRecordWire]] codec — i.e. a record published by the typed path
 * is readable by the stream-decode path and vice versa.
 */
class BusSpec extends SparkSpec {
  import spark.implicits._

  private val records =
    Seq(MockData.notSentDebitQuique, MockData.notSentDebitAbuela)

  test("encodeRecords -> decodeRecords is the identity on typed records") {
    val ds = spark.createDataset(records)
    val back = Bus.decodeRecords(Bus.encodeRecords(ds)).collect().toSeq
    assert(back.toSet == records.toSet)
  }

  test("stream-decode reads typed-codec bytes (wire interop)") {
    val wire = records.map(MyEventRecordWire.toBytes).toDF("value")
    val back = Bus.decodeRecords(wire).collect().toSeq
    assert(back.toSet == records.toSet)
  }

  test("typed codec reads stream-encode bytes (wire interop, reverse)") {
    val bytes = Bus.encodeRecords(spark.createDataset(records))
      .collect().map(_.getAs[Array[Byte]]("value"))
    assert(bytes.map(MyEventRecordWire.fromBytes).toSet == records.toSet)
  }
}
