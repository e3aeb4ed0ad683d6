package graft.sources.v2

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, File, FileInputStream, FileOutputStream}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * S1/S2/K3 without the connector jar: a LOG-STRUCTURED MESSAGE BUS on a
 * shared filesystem, with Kafka's storage model — per-topic partition
 * directories of immutable, offset-ordered segment files — served through
 * the full DSv2 surface: an unbounded micro-batch SOURCE (per-partition
 * offsets, admission control, checkpoint resume, AvailableNow snapshot
 * semantics) and a two-phase-commit SINK (task-attempt tmp files, driver
 * rename at commit, per-epoch idempotence for streaming replay).
 *
 * This is the transport the environment CAN run end-to-end (the Kafka glue
 * in [[graft.sources.Bus]] compiles but has no jar to execute against);
 * everything protocol-shaped about a real bus is exercised for real here:
 *
 *  - records are opaque binary `value`s routed to a fixed partition count
 *    (key-hash routing via [[GraftLogBus.route]]), so per-key order holds
 *    within a partition — the ordering contract the reference's Pub/Sub
 *    lacks and its dedup stage compensates for;
 *  - a consumer's position is a per-partition record offset, checkpointed
 *    by Structured Streaming and resumed exactly;
 *  - producers append whole immutable segments; a replayed streaming epoch
 *    re-commits ITS OWN segment names and is detected as already-committed
 *    (exactly-once publish per micro-batch);
 *  - consumers and producers never coordinate — new segments simply sort
 *    after existing ones.
 *
 * Layout: `<root>/<topic>/p<partition>/s<seq 12d>-t<task 6d>-c<count>.seg`
 * where seq = streaming epochId or driver-assigned batch sequence; segment
 * content is length-framed records (`[int32 len][bytes]`*). Record offsets
 * are implicit: segments sort lexicographically by (seq, task) and counts
 * accumulate. `.tmp/` holds uncommitted task-attempt files; only the
 * driver-side commit renames them into the log, so readers never observe a
 * partial write and aborted attempts leave nothing visible.
 *
 * Scale notes: this is a correctness-faithful stand-in, not a broker — at
 * production scale the same code paths bind to Kafka via
 * `format("kafka")` ([[graft.sources.Bus]], jar-blocked here). The listing
 * cost per trigger is O(segments) per partition; a broker's index replaces
 * that. Wire format stays the engine's Avro codec either way
 * ([[graft.functions.AvroKit]]), so swapping transports is config-only.
 */
class GraftLogBusSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftLogBus.readSchema
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val root = Option(properties.get("root")).getOrElse(
      throw new IllegalArgumentException("log bus requires option 'root'"))
    val topic = Option(properties.get("topic")).getOrElse(
      throw new IllegalArgumentException("log bus requires option 'topic'"))
    // reads infer (partition, offset, value); writes arrive with the
    // producer df's schema (supportsExternalMetadata), validated below
    new GraftLogBusTable(
      if (schema == null || schema.isEmpty) GraftLogBus.readSchema else schema,
      root, topic,
      Option(properties.get("partitions")).map(_.toInt).getOrElse(4),
      Option(properties.get("maxPerTrigger")).map(_.toLong).getOrElse(Long.MaxValue))
  }
}

object GraftLogBus {
  /** Consumer-facing schema — the (partition, offset, value) triple every
    * log bus exposes; decode `value` with [[graft.sources.Bus.decodeRecords]]. */
  val readSchema: StructType = new StructType()
    .add("partition", IntegerType, nullable = false)
    .add("offset", LongType, nullable = false)
    .add("value", BinaryType, nullable = false)

  /** Producer-facing schema: route rows yourself or via [[route]]. */
  val writeSchema: StructType = new StructType()
    .add("partition", IntegerType, nullable = false)
    .add("value", BinaryType, nullable = false)

  /** Key-hash routing: a (value) frame plus a deterministic partition from
    * the key — per-key ordering then holds within a partition, the Kafka
    * contract the downstream dedup/stateful stages rely on. */
  def route(df: org.apache.spark.sql.DataFrame, keyCol: org.apache.spark.sql.Column,
      partitions: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    df.select(pmod(xxhash64(keyCol), lit(partitions)).cast("int").as("partition"),
      col("value"))
  }

  private[v2] def partDir(root: String, topic: String, p: Int): File =
    new File(new File(root, topic), s"p$p")
  private[v2] def tmpDir(root: String, topic: String): File =
    new File(new File(root, topic), ".tmp")

  private val SegName = """s(\d{12})-t(\d{6})-c(\d+)\.seg""".r

  /** Committed segments of one partition in log order: (name, count). */
  private[v2] def segments(dir: File): Seq[(String, Long)] = {
    val fs = Option(dir.listFiles()).getOrElse(Array.empty[File])
    fs.iterator.map(_.getName).collect {
      case n @ SegName(_, _, c) => (n, c.toLong)
    }.toSeq.sortBy(_._1)
  }

  /** Log-end offset (= total committed records) of one partition. */
  private[v2] def endOffset(dir: File): Long = segments(dir).map(_._2).sum

  private[v2] def maxSeq(root: String, topic: String, partitions: Int): Long =
    (0 until partitions).flatMap { p =>
      segments(partDir(root, topic, p)).map(_._1 match {
        case SegName(s, _, _) => s.toLong
      })
    }.foldLeft(-1L)(math.max)

  private[v2] def segName(seq: Long, task: Long, count: Long): String =
    f"s$seq%012d-t$task%06d-c$count.seg"

  /** Stream records [skip, skip+wanted) out of one segment file. The
    * returned iterator closes its stream on exhaustion; callers that stop
    * early (query LIMIT) must call `close()` — [[BusReaderFactory]]'s
    * reader does, via its own close hook. */
  private[v2] class SegmentIterator(f: File, skip: Long, wanted: Long)
      extends Iterator[Array[Byte]] with AutoCloseable {
    private val in = new DataInputStream(new BufferedInputStream(
      new FileInputStream(f)))
    locally {
      var skipped = 0L
      while (skipped < skip) {
        val len = in.readInt(); in.skipBytes(len); skipped += 1
      }
    }
    private var emitted = 0L
    private var closed = false
    override def hasNext: Boolean = {
      val h = emitted < wanted && !closed
      if (!h) close()
      h
    }
    override def next(): Array[Byte] = {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      emitted += 1
      if (emitted == wanted) close()
      b
    }
    override def close(): Unit = if (!closed) { closed = true; in.close() }
  }
}

class GraftLogBusTable(tableSchema: StructType, root: String, topic: String,
    partitions: Int, maxPerTrigger: Long)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_log_bus($topic)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = GraftLogBus.readSchema
      override def toBatch: Batch = new Batch {
        override def planInputPartitions(): Array[InputPartition] =
          (0 until partitions).map { p =>
            val dir = GraftLogBus.partDir(root, topic, p)
            BusRange(dir.getPath, p, 0L, GraftLogBus.endOffset(dir)): InputPartition
          }.filter(_.asInstanceOf[BusRange].end > 0).toArray
        override def createReaderFactory(): PartitionReaderFactory =
          new BusReaderFactory
      }
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new BusMicroBatchStream(root, topic, partitions, maxPerTrigger)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val s = info.schema()
    require(s.length == 2 &&
      s.fields(0).name == "partition" && s.fields(0).dataType == IntegerType &&
      s.fields(1).name == "value" && s.fields(1).dataType == BinaryType,
      s"log bus producer schema must be (partition INT, value BINARY), got ${s.toDDL}")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new BusBatchWrite(root, topic, partitions)
        override def toStreaming: StreamingWrite =
          new BusStreamingWrite(root, topic, partitions)
      }
    }
  }
}

/** Per-partition record offsets as deterministic JSON (sorted keys). */
case class BusOffset(next: Map[Int, Long]) extends Offset {
  override def json(): String =
    next.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")
}

object BusOffset {
  def parse(json: String): BusOffset = {
    val body = json.trim.stripPrefix("{").stripSuffix("}").trim
    if (body.isEmpty) BusOffset(Map.empty)
    else BusOffset(body.split(",").map { kv =>
      val Array(k, v) = kv.split(":")
      k.trim.stripPrefix("\"").stripSuffix("\"").toInt -> v.trim.toLong
    }.toMap)
  }
}

/**
 * The unbounded consumer: per-trigger, list each partition's committed
 * segments, admit at most `maxPerTrigger / partitions` new records per
 * partition (Kafka's maxOffsetsPerTrigger contract), and plan one input
 * partition per bus partition with the admitted [start, end) range.
 * `Trigger.AvailableNow` SNAPSHOTS the log-end offsets up front and paces
 * toward the snapshot, so records published after the drain started are
 * left for the next run — the documented AvailableNow semantics.
 */
class BusMicroBatchStream(root: String, topic: String, partitions: Int,
    maxPerTrigger: Long)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private def liveEnds(): Map[Int, Long] =
    (0 until partitions).map(p =>
      p -> GraftLogBus.endOffset(GraftLogBus.partDir(root, topic, p))).toMap

  // AvailableNow snapshot; None = live tailing
  @volatile private var snapshot: Option[Map[Int, Long]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    snapshot = Some(liveEnds())

  override def initialOffset(): Offset =
    BusOffset((0 until partitions).map(_ -> 0L).toMap)

  override def getDefaultReadLimit: ReadLimit =
    if (maxPerTrigger == Long.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxRows(maxPerTrigger)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: use latestOffset(start, limit)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[BusOffset].next
    val ends = snapshot.getOrElse(liveEnds())
    val cap = limit match {
      case r: ReadMaxRows => math.max(1L, r.maxRows() / partitions)
      case _: ReadAllAvailable => Long.MaxValue
      case _ => Long.MaxValue
    }
    BusOffset(ends.map { case (p, end) =>
      val s = from.getOrElse(p, 0L)
      p -> math.min(end, if (cap == Long.MaxValue) end else s + cap)
    })
  }

  override def reportLatestOffset(): Offset =
    BusOffset(snapshot.getOrElse(liveEnds()))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[BusOffset].next
    val e = end.asInstanceOf[BusOffset].next
    e.toSeq.sortBy(_._1).flatMap { case (p, hi) =>
      val lo = s.getOrElse(p, 0L)
      if (hi > lo)
        Some(BusRange(GraftLogBus.partDir(root, topic, p).getPath, p, lo, hi): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new BusReaderFactory
  override def deserializeOffset(json: String): Offset = BusOffset.parse(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One bus partition's admitted record range [start, end). */
case class BusRange(dir: String, partition: Int, start: Long, end: Long)
    extends InputPartition

class BusReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[BusRange]
    // walk segments in log order, carrying the cumulative base offset;
    // open only segments overlapping [start, end)
    val segs = GraftLogBus.segments(new File(r.dir))
    val slices = {
      var base = 0L
      val b = Seq.newBuilder[(String, Long, Long, Long)] // (name, segBase, skip, take)
      segs.foreach { case (name, count) =>
        val lo = math.max(r.start, base)
        val hi = math.min(r.end, base + count)
        if (hi > lo) b += ((name, base, lo - base, hi - lo))
        base += count
      }
      b.result()
    }
    new PartitionReader[InternalRow] {
      // one segment open at a time; `open` tracked so an early stop
      // (query LIMIT) still releases the file handle via close()
      private var open: GraftLogBus.SegmentIterator = _
      private val it: Iterator[(Long, Array[Byte])] = slices.iterator.flatMap {
        case (name, segBase, skip, take) =>
          open = new GraftLogBus.SegmentIterator(new File(r.dir, name), skip, take)
          open.zipWithIndex.map { case (bytes, i) => (segBase + skip + i, bytes) }
      }
      private var cur: (Long, Array[Byte]) = _
      override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
      override def get(): InternalRow =
        InternalRow(r.partition, cur._1, cur._2)
      override def close(): Unit = if (open != null) open.close()
    }
  }
}

/** A committed task attempt: its tmp file and final segment metadata. */
case class BusSegMessage(partition: Int, taskId: Long, count: Long,
    tmpPath: String) extends WriterCommitMessage

/**
 * Producer, batch flavor. Tasks write length-framed tmp files under
 * `.tmp/` (invisible to readers); the driver assigns the next sequence
 * number and renames every committed attempt's file into the log — the
 * two-phase commit that keeps aborted/speculative attempts out of the
 * stream. One rename per (task, partition); single driver-side commit
 * point serializes sequence assignment (the "partition leader" role).
 */
class BusBatchWrite(root: String, topic: String, partitions: Int)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new BusWriterFactory(root, topic, partitions)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val seq = GraftLogBus.maxSeq(root, topic, partitions) + 1
    BusCommit.rename(root, topic, seq, messages)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    BusCommit.cleanup(messages)
}

/**
 * Producer, streaming flavor: sequence number = epochId, which makes the
 * commit IDEMPOTENT under micro-batch replay — if any segment of this
 * epoch already exists, the epoch committed before the failure and the
 * replay only cleans its tmp files (Kafka's transactional-producer epoch
 * fencing, expressed as immutable named segments).
 */
class BusStreamingWrite(root: String, topic: String, partitions: Int)
    extends StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new BusStreamingWriterFactory(root, topic, partitions)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val already = (0 until partitions).exists { p =>
      GraftLogBus.segments(GraftLogBus.partDir(root, topic, p))
        .exists(_._1.startsWith(f"s$epochId%012d-"))
    }
    if (already) BusCommit.cleanup(messages)
    else BusCommit.rename(root, topic, epochId, messages)
  }
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    BusCommit.cleanup(messages)
}

private object BusCommit {
  private def flatten(messages: Array[WriterCommitMessage]): Seq[BusSegMessage] =
    messages.toSeq.flatMap {
      case BusMultiMessage(segs) => segs.toSeq
      case m: BusSegMessage => Seq(m)
      case _ => Nil
    }
  def rename(root: String, topic: String, seq: Long,
      messages: Array[WriterCommitMessage]): Unit =
    flatten(messages).foreach { case BusSegMessage(p, task, count, tmpPath) =>
      if (count > 0) {
        val dir = GraftLogBus.partDir(root, topic, p)
        dir.mkdirs()
        val target = new File(dir, GraftLogBus.segName(seq, task, count))
        if (!new File(tmpPath).renameTo(target) && !target.exists())
          throw new IllegalStateException(s"bus commit failed: $tmpPath -> $target")
      } else new File(tmpPath).delete()
    }
  def cleanup(messages: Array[WriterCommitMessage]): Unit =
    flatten(messages).foreach(m => new File(m.tmpPath).delete())
}

/** Task-side writer: buffers this task's records per bus partition into
  * one tmp file per partition touched. Input rows are (partition, value);
  * rows for several bus partitions may arrive in one task — each goes to
  * its own segment so log order per partition stays well-defined. */
private class BusWriterCore(root: String, topic: String, partitions: Int,
    taskId: Long) {
  // frames stream straight into per-partition tmp files as they arrive —
  // task memory stays O(partitions), never O(epoch) (a buffering writer
  // would OOM on a large replayed micro-batch)
  private case class Open(tmp: File, out: DataOutputStream, var count: Long)
  private val open = scala.collection.mutable.Map.empty[Int, Open]
  def write(record: InternalRow): Unit = {
    val p = record.getInt(0)
    require(p >= 0 && p < partitions,
      s"partition $p out of range [0, $partitions)")
    val o = open.getOrElseUpdate(p, {
      val tmpDir = GraftLogBus.tmpDir(root, topic)
      tmpDir.mkdirs()
      val tmp = File.createTempFile(s"t$taskId-p$p-", ".tmp", tmpDir)
      Open(tmp, new DataOutputStream(new BufferedOutputStream(
        new FileOutputStream(tmp))), 0L)
    })
    val b = record.getBinary(1)
    o.out.writeInt(b.length); o.out.write(b); o.count += 1
  }
  def commitAll(): Array[BusSegMessage] = {
    open.toSeq.sortBy(_._1).map { case (p, o) =>
      o.out.close()
      BusSegMessage(p, taskId, o.count, o.tmp.getPath)
    }.toArray
  }
  def abortAll(): Unit = open.values.foreach { o =>
    o.out.close(); o.tmp.delete()
  }
}

class BusWriterFactory(root: String, topic: String, partitions: Int)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val core = new BusWriterCore(root, topic, partitions, taskId)
      override def write(record: InternalRow): Unit = core.write(record)
      // a task commits ONE message; fold the per-partition files into a
      // wrapper when a task carried several partitions
      override def commit(): WriterCommitMessage = BusMultiMessage(core.commitAll())
      override def abort(): Unit = core.abortAll()
      override def close(): Unit = ()
    }
}

class BusStreamingWriterFactory(root: String, topic: String, partitions: Int)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val core = new BusWriterCore(root, topic, partitions, taskId)
      override def write(record: InternalRow): Unit = core.write(record)
      override def commit(): WriterCommitMessage = BusMultiMessage(core.commitAll())
      override def abort(): Unit = core.abortAll()
      override def close(): Unit = ()
    }
}

/** One task's bundle of per-partition segment files. */
case class BusMultiMessage(segs: Array[BusSegMessage]) extends WriterCommitMessage
