package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * I2 — Avro binary wire codec (the reference's message format:
 * mediation/avro/MyEventRecord.java:21-52 `toByteBuffer`/`fromByteBuffer`,
 * utils/core/AvroUtils.scala:19-62). The environment ships avro-core (no
 * spark-avro datasource), so the codec is built directly on
 * `org.apache.avro`: a StructType-derived schema (every nullable field a
 * `["null", T]` union, exactly the reference's convention), raw binary
 * encoding (no container header — wire messages, not files), and Catalyst
 * expressions bridging columns so `to_avro`/`from_avro`-style usage stays
 * in the plan (codegen'd via a reference-object call, like spark-avro's own
 * converters).
 */
object AvroCodec {

  /** StructType → Avro record schema. EVERY field becomes a ["null", T]
    * union — the reference's convention (every MyEventRecord leaf is such a
    * union), and it makes the wire schema canonical: encoder and decoder
    * derive structurally identical schemas even when their Catalyst
    * nullability flags differ (e.g. a non-null literal struct encoded, then
    * decoded via a DDL schema whose fields default to nullable).
    */
  def avroSchemaFor(st: StructType, name: String = "Record",
      namespace: String = "graft.wire"): Schema = {
    val fields = st.fields.map { f =>
      val base = typeSchema(f.dataType, s"${name}_${f.name}", namespace)
      val sch = Schema.createUnion(List(Schema.create(Schema.Type.NULL), base).asJava)
      new Schema.Field(f.name, sch, null, org.apache.avro.JsonProperties.NULL_VALUE)
    }
    val rec = Schema.createRecord(name, null, namespace, false)
    rec.setFields(fields.toList.asJava)
    rec
  }

  private def typeSchema(dt: DataType, name: String, ns: String): Schema = dt match {
    case StringType => Schema.create(Schema.Type.STRING)
    case LongType => Schema.create(Schema.Type.LONG)
    case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case st: StructType => avroSchemaFor(st, name, ns)
    case ArrayType(elem, _) =>
      // canonical wire form: items are ["null", T] unions too
      val e = typeSchema(elem, s"${name}_item", ns)
      Schema.createArray(
        Schema.createUnion(List(Schema.create(Schema.Type.NULL), e).asJava))
    case other =>
      throw new IllegalArgumentException(s"unsupported wire type: $other")
  }

  /** Catalyst internal value → Avro datum (for a GenericDatumWriter). */
  def toAvroDatum(value: Any, dt: DataType, schema: Schema): Any = {
    if (value == null) return null
    val nonNull = resolveUnion(schema)
    dt match {
      case StringType => value.asInstanceOf[UTF8String].toString
      case LongType | IntegerType | BooleanType | DoubleType | FloatType => value
      case ShortType => value.asInstanceOf[Short].toInt
      case ByteType => value.asInstanceOf[Byte].toInt
      case BinaryType => ByteBuffer.wrap(value.asInstanceOf[Array[Byte]])
      case st: StructType =>
        val row = value.asInstanceOf[InternalRow]
        val rec = new GenericData.Record(nonNull)
        var i = 0
        while (i < st.length) {
          val f = st.fields(i)
          val v = if (row.isNullAt(i)) null else row.get(i, f.dataType)
          rec.put(i, toAvroDatum(v, f.dataType, nonNull.getFields.get(i).schema()))
          i += 1
        }
        rec
      case ArrayType(elem, _) =>
        val arr = value.asInstanceOf[ArrayData]
        val out = new java.util.ArrayList[Any](arr.numElements())
        val itemSchema = nonNull.getElementType
        var i = 0
        while (i < arr.numElements()) {
          val v = if (arr.isNullAt(i)) null else arr.get(i, elem)
          out.add(toAvroDatum(v, elem, itemSchema))
          i += 1
        }
        out
      case other => throw new IllegalArgumentException(s"unsupported wire type: $other")
    }
  }

  /** Avro datum → Catalyst internal value. */
  def fromAvroDatum(value: Any, dt: DataType): Any = {
    if (value == null) return null
    dt match {
      case StringType => UTF8String.fromString(value.toString)
      case LongType | IntegerType | BooleanType | DoubleType | FloatType => value
      case ShortType => value.asInstanceOf[Int].toShort
      case ByteType => value.asInstanceOf[Int].toByte
      case BinaryType =>
        val bb = value.asInstanceOf[ByteBuffer]
        val out = new Array[Byte](bb.remaining())
        bb.duplicate().get(out)
        out
      case st: StructType =>
        val rec = value.asInstanceOf[GenericRecord]
        val out = new Array[Any](st.length)
        var i = 0
        while (i < st.length) {
          out(i) = fromAvroDatum(rec.get(i), st.fields(i).dataType)
          i += 1
        }
        new GenericInternalRow(out)
      case ArrayType(elem, _) =>
        val coll = value.asInstanceOf[java.util.Collection[Any]]
        val out = new Array[Any](coll.size())
        val it = coll.iterator()
        var i = 0
        while (it.hasNext) { out(i) = fromAvroDatum(it.next(), elem); i += 1 }
        new GenericArrayData(out)
      case other => throw new IllegalArgumentException(s"unsupported wire type: $other")
    }
  }

  private def resolveUnion(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  /** Raw-binary encode (no object-container framing — the reference's
    * per-message `toByteBuffer` shape, not its file sink).
    */
  def encode(datum: GenericRecord, schema: Schema): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(datum, enc)
    enc.flush()
    out.toByteArray
  }

  def decode(bytes: Array[Byte], schema: Schema): GenericRecord = {
    val dec = DecoderFactory.get().binaryDecoder(bytes, null)
    new GenericDatumReader[GenericRecord](schema).read(null, dec)
  }
}

/**
 * Typed wire codec for the canonical record — the public-API equivalent of
 * the reference's generated `MyEventRecord.toByteBuffer`/`fromByteBuffer`
 * (mediation/avro/MyEventRecord.java:21-52). The Avro schema is derived
 * from the Spark encoder's StructType, so the typed path and the
 * column-level codec produce the SAME wire bytes.
 */
object MyEventRecordWire {
  import graft.model.MyEventRecord
  import org.apache.spark.sql.Encoders
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

  val structType: StructType = Encoders.product[MyEventRecord].schema
  val schema: Schema =
    AvroCodec.avroSchemaFor(structType, "MyEventRecord", "graft.model")

  // ExpressionEncoder (de)serializers reuse row buffers — thread-local
  private val enc = new ThreadLocal[(MyEventRecord => InternalRow, InternalRow => MyEventRecord)] {
    override def initialValue(): (MyEventRecord => InternalRow, InternalRow => MyEventRecord) = {
      val e = ExpressionEncoder(
        Encoders.product[MyEventRecord]
          .asInstanceOf[org.apache.spark.sql.catalyst.encoders.AgnosticEncoder[MyEventRecord]])
      (e.createSerializer()(_), e.resolveAndBind().createDeserializer()(_))
    }
  }

  def toBytes(r: MyEventRecord): Array[Byte] =
    AvroCodec.encode(
      AvroCodec.toAvroDatum(enc.get()._1(r), structType, schema)
        .asInstanceOf[GenericRecord], schema)

  def fromBytes(bytes: Array[Byte]): MyEventRecord =
    enc.get()._2(
      AvroCodec.fromAvroDatum(AvroCodec.decode(bytes, schema), structType)
        .asInstanceOf[InternalRow])
}

/** Column API for the wire codec. */
object AvroKit {

  /** Encode a struct column to Avro binary (schema derived from the
    * column's StructType; nullable leaves become ["null", T] unions).
    */
  def toAvro(c: Column): Column =
    GraftColumnBridge.column(ToAvroBinary(GraftColumnBridge.expression(c)))

  /** Decode an Avro-binary column into a struct given its DDL schema, e.g.
    * `"event_id BIGINT, props STRING"`. Strict: malformed bytes throw, as
    * the reference's `fromByteBuffer` does.
    */
  def fromAvro(c: Column, ddl: String): Column =
    GraftColumnBridge.column(FromAvroBinary(GraftColumnBridge.expression(c), ddl))
}

/** Struct → Avro wire bytes. */
case class ToAvroBinary(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  @transient private lazy val schema: Schema = AvroCodec.avroSchemaFor(structType)

  def encodeRow(row: Any): Array[Byte] =
    AvroCodec.encode(
      AvroCodec.toAvroDatum(row, structType, schema).asInstanceOf[GenericRecord],
      schema)

  override def nullSafeEval(input: Any): Any = encodeRow(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("toAvro", this, classOf[ToAvroBinary].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encodeRow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ToAvroBinary =
    copy(child = newChild)
}

/** Avro wire bytes → struct (schema by DDL string, kept in the expression
  * so it serializes to executors as data).
  */
case class FromAvroBinary(child: Expression, ddl: String) extends UnaryExpression {

  override val dataType: StructType = StructType.fromDDL(ddl)

  @transient private lazy val schema: Schema = AvroCodec.avroSchemaFor(dataType)

  def decodeBytes(bytes: Any): InternalRow =
    AvroCodec.fromAvroDatum(
      AvroCodec.decode(bytes.asInstanceOf[Array[Byte]], schema), dataType)
      .asInstanceOf[InternalRow]

  override def nullSafeEval(input: Any): Any = decodeBytes(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("fromAvro", this, classOf[FromAvroBinary].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.decodeBytes($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): FromAvroBinary =
    copy(child = newChild)
}
