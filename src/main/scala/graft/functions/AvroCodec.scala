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

  /** Schema-resolving decode: reads bytes written with `writer` into the
    * shape of `reader` (Avro writer/reader resolution — added reader
    * fields take their null default, dropped writer fields are skipped).
    * The reference relies on the same resolution rules in its Avro layer
    * (utils/core/AvroUtils.scala:43). */
  def decodeResolved(bytes: Array[Byte], offset: Int, writer: Schema,
      reader: Schema): GenericRecord = {
    val dec = DecoderFactory.get().binaryDecoder(bytes, offset,
      bytes.length - offset, null)
    new GenericDatumReader[GenericRecord](writer, reader).read(null, dec)
  }

  /** CRC-64-AVRO fingerprint of the canonical (parsing) form — the id the
    * single-object frame carries. */
  def fingerprint64(schema: Schema): Long =
    org.apache.avro.SchemaNormalization.parsingFingerprint64(schema)
}

/**
 * Filesystem schema registry + Avro single-object frames — the evolution
 * story for the wire: each frame is `[0xC3 0x01][8-byte LE writer
 * fingerprint][binary body]` (Avro's standard single-object encoding), and
 * writer schemas live as `<fp>.avsc` files in a shared directory keyed by
 * fingerprint, so a consumer can resolve ANY epoch's writer schema against
 * its own reader schema — old and new frames decode in one run. Files are
 * written tmp+rename (atomic) and are immutable once present, so
 * concurrent producers registering the same schema are idempotent.
 */
object SchemaRegistry {
  val Magic0: Byte = 0xC3.toByte
  val Magic1: Byte = 0x01.toByte
  val HeaderLen: Int = 10

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Schema]()

  private def file(dir: String, fp: Long): java.io.File =
    new java.io.File(dir, f"$fp%016x.avsc")

  /** Idempotently persist a writer schema; returns its fingerprint. */
  def register(dir: String, schema: Schema): Long = {
    val fp = AvroCodec.fingerprint64(schema)
    val f = file(dir, fp)
    if (!f.exists()) {
      new java.io.File(dir).mkdirs()
      val tmp = java.io.File.createTempFile("schema-", ".tmp", new java.io.File(dir))
      java.nio.file.Files.write(tmp.toPath, schema.toString.getBytes("UTF-8"))
      if (!tmp.renameTo(f) && !f.exists())
        throw new IllegalStateException(s"cannot register schema at $f")
      tmp.delete()
    }
    cache.putIfAbsent((new java.io.File(dir).getAbsolutePath, fp), schema)
    fp
  }

  /** Resolve a fingerprint to its writer schema (cached per JVM). */
  def lookup(dir: String, fp: Long): Schema =
    cache.computeIfAbsent((new java.io.File(dir).getAbsolutePath, fp), { _ =>
      val f = file(dir, fp)
      if (!f.exists())
        throw new IllegalStateException(
          f"unknown writer schema fingerprint $fp%016x (not in registry $dir)")
      new Schema.Parser().parse(
        new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
    })

  /** Wrap a binary body in the single-object frame. */
  def frame(fp: Long, body: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](HeaderLen + body.length)
    out(0) = Magic0; out(1) = Magic1
    var i = 0
    while (i < 8) { out(2 + i) = ((fp >>> (8 * i)) & 0xff).toByte; i += 1 } // LE
    System.arraycopy(body, 0, out, HeaderLen, body.length)
    out
  }

  /** Read the frame header; returns the writer fingerprint. */
  def readFingerprint(bytes: Array[Byte]): Long = {
    require(bytes.length >= HeaderLen && bytes(0) == Magic0 && bytes(1) == Magic1,
      "not an Avro single-object frame (bad magic)")
    var fp = 0L
    var i = 0
    while (i < 8) { fp |= (bytes(2 + i) & 0xffL) << (8 * i); i += 1 }
    fp
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

  /** Encode a struct column as an Avro SINGLE-OBJECT frame: the writer
    * schema (derived from the column's type) is persisted into
    * `registryDir` and each value carries its 8-byte fingerprint, so
    * consumers can decode frames from ANY schema version via
    * [[fromAvroEvolving]]. */
  def toAvroEvolving(c: Column, registryDir: String): Column =
    GraftColumnBridge.column(
      ToAvroSingleObject(GraftColumnBridge.expression(c), registryDir))

  /** Schema-resolving decode of single-object frames: each value's writer
    * schema is looked up by fingerprint in `registryDir` and resolved
    * against the reader DDL — frames written before a schema evolution
    * (missing the new nullable fields) and after it decode side by side. */
  def fromAvroEvolving(c: Column, ddl: String, registryDir: String): Column =
    GraftColumnBridge.column(
      FromAvroSingleObject(GraftColumnBridge.expression(c), ddl, registryDir))
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

/** Struct → Avro single-object frame (magic + writer fingerprint + body).
  * The writer schema is registered into `registryDir` lazily on first
  * encode per executor — idempotent file create on the shared FS, and
  * always before any frame carrying its fingerprint exists. */
case class ToAvroSingleObject(child: Expression, registryDir: String)
    extends UnaryExpression {

  override def dataType: DataType = BinaryType

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  @transient private lazy val schema: Schema = AvroCodec.avroSchemaFor(structType)
  @transient private lazy val fp: Long = SchemaRegistry.register(registryDir, schema)

  def encodeRow(row: Any): Array[Byte] =
    SchemaRegistry.frame(fp, AvroCodec.encode(
      AvroCodec.toAvroDatum(row, structType, schema).asInstanceOf[GenericRecord],
      schema))

  override def nullSafeEval(input: Any): Any = encodeRow(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("toAvroSO", this, classOf[ToAvroSingleObject].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encodeRow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ToAvroSingleObject =
    copy(child = newChild)
}

/** Avro single-object frame → struct, resolving EACH value's writer schema
  * (by the frame's fingerprint, via the registry) against the reader DDL —
  * Avro's writer/reader resolution, so a stream mixing schema versions
  * decodes in one pass. Unknown fingerprints throw (strict, like the
  * reference's fromByteBuffer). */
case class FromAvroSingleObject(child: Expression, ddl: String,
    registryDir: String) extends UnaryExpression {

  override val dataType: StructType = StructType.fromDDL(ddl)

  @transient private lazy val readerSchema: Schema = AvroCodec.avroSchemaFor(dataType)
  // per-fingerprint writer schemas, cached per executor
  @transient private lazy val writers =
    new java.util.concurrent.ConcurrentHashMap[java.lang.Long, Schema]()

  def decodeBytes(bytesAny: Any): InternalRow = {
    val bytes = bytesAny.asInstanceOf[Array[Byte]]
    val fp = SchemaRegistry.readFingerprint(bytes)
    val writer = writers.computeIfAbsent(fp, f => SchemaRegistry.lookup(registryDir, f))
    AvroCodec.fromAvroDatum(
      AvroCodec.decodeResolved(bytes, SchemaRegistry.HeaderLen, writer, readerSchema),
      dataType).asInstanceOf[InternalRow]
  }

  override def nullSafeEval(input: Any): Any = decodeBytes(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("fromAvroSO", this, classOf[FromAvroSingleObject].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.decodeBytes($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): FromAvroSingleObject =
    copy(child = newChild)
}
