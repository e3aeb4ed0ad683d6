package graft.sources.v2

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util
import java.util.concurrent.Executors

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * S5 — typed scan of an EXTERNAL TABLE SERVICE (the reference reads a
 * typed BigQuery table, `slack/MinimalPubSubBQLookup.scala:37,71-72`; no
 * BigQuery exists in this environment, so this implements the part of
 * that connector which is real engineering rather than Google plumbing):
 * a table server speaking a storage-read protocol over TCP, and a DSv2
 * connector that consumes it the way Spark consumes the BigQuery Storage
 * Read API —
 *
 *  - the CLIENT creates a read per partition with a requested column set
 *    and a pushed predicate range: projection AND filtering happen
 *    SERVER-SIDE, over the wire (`SupportsPushDownRequiredColumns` /
 *    `SupportsPushDownFilters` serialize into the request);
 *  - the read is SLICED into n parallel streams (the BQ session/stream
 *    model): each Spark input partition opens its own connection and
 *    receives a disjoint stripe;
 *  - rows travel as Avro binary frames with the writer schema negotiated
 *    in the response header — the client decodes with the SERVER's
 *    schema, so server-side evolution (new columns) cannot corrupt reads.
 *
 * The served table is deterministic id arithmetic (like [[GraftDocs]]),
 * which is what makes the whole network path oracle-gatable: DuckDB
 * replays the content, so the gate checks the protocol, not a fixture.
 * On a real cluster the host would be a remote service; `local[*]`
 * executors connect to the in-process server over loopback.
 */
object GraftTableService {

  /** The one table this service serves: (doc_id, lang, score) by id
    * arithmetic — mirrors [[GraftDocs]]'s replayable-content discipline. */
  val langs: Array[String] = Array("en", "de", "fr", "es", "pt")
  def lang(id: Long): String = langs((id % 5).toInt)
  def score(id: Long): Long = (id * 31) % 1000

  val schema: StructType = new StructType()
    .add("doc_id", LongType, nullable = false)
    .add("lang", StringType, nullable = false)
    .add("score", LongType, nullable = false)

  private def avroSchema(cols: Seq[String]): Schema = {
    val fields = cols.map {
      case "doc_id" => "{\"name\":\"doc_id\",\"type\":\"long\"}"
      case "lang" => "{\"name\":\"lang\",\"type\":\"string\"}"
      case "score" => "{\"name\":\"score\",\"type\":\"long\"}"
      case other => throw new IllegalArgumentException(s"no column $other")
    }
    new Schema.Parser().parse(
      s"""{"type":"record","name":"row","fields":[${fields.mkString(",")}]}""")
  }

  // ── server ──────────────────────────────────────────────────────────────

  /** A running server; `port` is the bound (possibly ephemeral) port. */
  final class Server(val port: Int, socket: ServerSocket,
      pool: java.util.concurrent.ExecutorService) extends AutoCloseable {
    override def close(): Unit = { socket.close(); pool.shutdownNow() }
  }

  /** Start serving on `port` (0 = ephemeral) until `close()`. */
  def serve(rows: Long, port: Int = 0): Server = {
    val ss = new ServerSocket()
    ss.bind(new InetSocketAddress("127.0.0.1", port))
    val pool = Executors.newCachedThreadPool { r =>
      val t = new Thread(r, "graft-table-service"); t.setDaemon(true); t
    }
    pool.submit(new Runnable {
      override def run(): Unit =
        try while (true) {
          val conn = ss.accept()
          pool.submit(new Runnable {
            override def run(): Unit = handle(conn, rows)
          })
        } catch { case _: Exception => () } // socket closed = shutdown
    })
    new Server(ss.getLocalPort, ss, pool)
  }

  private def jsonField(json: String, key: String): Option[String] = {
    val m = ("\"" + key + "\"\\s*:\\s*(\\[[^\\]]*\\]|\"[^\"]*\"|-?\\d+)").r
      .findFirstMatchIn(json)
    m.map(_.group(1))
  }

  private def handle(conn: Socket, rows: Long): Unit = {
    try {
      val in = new DataInputStream(new BufferedInputStream(conn.getInputStream))
      val out = new DataOutputStream(new BufferedOutputStream(conn.getOutputStream))
      // request: one JSON line
      val req = {
        val b = new ByteArrayOutputStream()
        var c = in.read()
        while (c != -1 && c != '\n') { b.write(c); c = in.read() }
        new String(b.toByteArray, UTF_8)
      }
      val cols = jsonField(req, "columns")
        .map(_.stripPrefix("[").stripSuffix("]").split(",")
          .map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty).toSeq)
        .getOrElse(schema.fieldNames.toSeq)
      val lo = math.max(0L, jsonField(req, "lo").map(_.toLong).getOrElse(0L))
      val hi = math.min(rows - 1, jsonField(req, "hi").map(_.toLong).getOrElse(rows - 1))
      val slice = jsonField(req, "slice").map(_.toInt).getOrElse(0)
      val slices = math.max(1, jsonField(req, "slices").map(_.toInt).getOrElse(1))
      val sch = avroSchema(cols)
      // response header: the WRITER schema the client must decode with
      out.write((s"""{"schema":${quote(sch.toString)}}""" + "\n").getBytes(UTF_8))
      val writer = new GenericDatumWriter[GenericRecord](sch)
      val buf = new ByteArrayOutputStream()
      var enc: BinaryEncoder = null
      // modulo striping mirrors the BQ stream interleave; a real storage
      // backend would seek per stripe instead of walking the range — here
      // the walk is generation, not IO, so per-stream cost is fine
      var id = lo + ((slice - lo % slices + slices) % slices)
      while (id <= hi) {
        buf.reset()
        enc = EncoderFactory.get().binaryEncoder(buf, enc)
        val rec = new GenericData.Record(sch)
        cols.foreach {
          case "doc_id" => rec.put("doc_id", id)
          case "lang" => rec.put("lang", lang(id))
          case "score" => rec.put("score", score(id))
        }
        writer.write(rec, enc)
        enc.flush()
        val bytes = buf.toByteArray
        out.writeInt(bytes.length)
        out.write(bytes)
        id += slices
      }
      out.writeInt(-1) // end of stream
      out.flush()
    } catch { case _: Exception => () }
    finally conn.close()
  }

  private def quote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /** JVM-lifetime shared instance for gate queries: DataFrames are lazy,
    * so a per-query server would be closed before the driver's write
    * action executes the scan. Daemon threads; never explicitly closed. */
  lazy val shared: Server = serve(rows = 20000L)
}

/**
 * The connector: `spark.read.format("graft.sources.v2.GraftServiceSource")
 * .option("host", h).option("port", p).option("slices", n).load()`.
 */
class GraftServiceSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftTableService.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftServiceTable(
      Option(properties.get("host")).getOrElse("127.0.0.1"),
      Option(properties.get("port")).map(_.toInt).getOrElse(
        throw new IllegalArgumentException("table service requires option 'port'")),
      Option(properties.get("slices")).map(_.toInt).getOrElse(4))
}

class GraftServiceTable(host: String, port: Int, slices: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_table_service($host:$port)"
  override def schema(): StructType = GraftTableService.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftServiceScanBuilder(host, port, slices)
}

class GraftServiceScanBuilder(host: String, port: Int, slices: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var lo = 0L
  private var hi = Long.MaxValue
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = GraftTableService.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) = filters.partition {
      case EqualTo("doc_id", _: java.lang.Long) => true
      case GreaterThan("doc_id", _: java.lang.Long) => true
      case GreaterThanOrEqual("doc_id", _: java.lang.Long) => true
      case LessThan("doc_id", _: java.lang.Long) => true
      case LessThanOrEqual("doc_id", _: java.lang.Long) => true
      case _ => false
    }
    ok.foreach {
      case EqualTo(_, v: java.lang.Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v)
      case GreaterThan(_, v: java.lang.Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual(_, v: java.lang.Long) => lo = math.max(lo, v.longValue())
      case LessThan(_, v: java.lang.Long) => hi = math.min(hi, v - 1)
      case LessThanOrEqual(_, v: java.lang.Long) => hi = math.min(hi, v.longValue())
      case _ => ()
    }
    accepted = ok
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    if (requiredSchema.nonEmpty) required = requiredSchema

  override def build(): Scan =
    new GraftServiceScan(host, port, slices, required, lo, hi, accepted)
}

class GraftServiceScan(host: String, port: Int, slices: Int,
    required: StructType, lo: Long, hi: Long, pushed: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  // surface the over-the-wire pushdowns in the plan text, DSv1-style, so
  // plan audits (and specs) can assert them
  override def description(): String =
    s"GraftServiceScan PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    (0 until slices).map(i =>
      ServiceSlice(host, port, required.fieldNames.toSeq, lo, hi, i,
        slices): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new ServiceReaderFactory
}

case class ServiceSlice(host: String, port: Int, cols: Seq[String],
    lo: Long, hi: Long, slice: Int, slices: Int) extends InputPartition

class ServiceReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val s = p.asInstanceOf[ServiceSlice]
    new PartitionReader[InternalRow] {
      private val sock = new Socket(s.host, s.port)
      private val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
      private val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
      locally {
        val colsJson = s.cols.map("\"" + _ + "\"").mkString("[", ",", "]")
        out.write((s"""{"columns":$colsJson,"lo":${s.lo},"hi":${s.hi},""" +
          s""""slice":${s.slice},"slices":${s.slices}}""" + "\n").getBytes(UTF_8))
        out.flush()
      }
      // schema NEGOTIATION: decode with the server's writer schema
      private val writerSchema: Schema = {
        val b = new ByteArrayOutputStream()
        var c = in.read()
        while (c != -1 && c != '\n') { b.write(c); c = in.read() }
        val header = new String(b.toByteArray, UTF_8)
        val i = header.indexOf("\"schema\":")
        val raw = header.substring(i + 9).trim.stripSuffix("}")
        new Schema.Parser().parse(unquote(raw))
      }
      private val reader = new GenericDatumReader[GenericRecord](writerSchema)
      private var decoder: BinaryDecoder = null
      private var rec: GenericRecord = null
      private var cur: GenericRecord = null

      override def next(): Boolean = {
        val len = in.readInt()
        if (len < 0) false
        else {
          val bytes = new Array[Byte](len)
          in.readFully(bytes)
          decoder = DecoderFactory.get().binaryDecoder(bytes, decoder)
          cur = reader.read(rec, decoder)
          rec = cur
          true
        }
      }
      override def get(): InternalRow =
        InternalRow.fromSeq(s.cols.map { c =>
          cur.get(c) match {
            case l: java.lang.Long => l.longValue()
            case u: org.apache.avro.util.Utf8 => UTF8String.fromString(u.toString)
            case str: String => UTF8String.fromString(str)
            case other => throw new IllegalStateException(s"unexpected $other")
          }
        })
      override def close(): Unit = sock.close()

      private def unquote(s0: String): String = {
        val t = s0.trim
        if (t.startsWith("\""))
          t.stripPrefix("\"").stripSuffix("\"")
            .replace("\\\"", "\"").replace("\\\\", "\\")
        else t
      }
    }
  }
}
