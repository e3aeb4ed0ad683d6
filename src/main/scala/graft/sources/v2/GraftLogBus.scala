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
 * Layout: `<root>/<topic>/p<partition>/s<seq 12d>-o<start 15d>-c<count>.seg`
 * where seq is a COMMIT-TIME log sequence (maxSeq+1, assigned by the single
 * driver-side committer — the "partition leader" role) shared by every
 * segment of one commit, and `o<start>` is the segment's first record
 * offset (Kafka's log-segment naming), assigned at the same commit point;
 * segment content is length-framed records (`[int32 len][bytes]`*). A
 * segment therefore self-describes its record range [start, start+count) —
 * offset attribution never pairs a `.base` read with a directory listing,
 * which is what makes [[GraftLogBus.expire]] atomic for concurrent
 * readers (`.base` only positions an EMPTY log after full retention).
 * `.tmp/` holds uncommitted task-attempt files.
 *
 * Commit protocol (atomic visibility + epoch idempotence):
 *  1. tasks write tmp files (invisible — readers only list `s*.seg`);
 *  2. the driver renames every attempt's file to its final segment name;
 *  3. the driver creates ONE marker file
 *     `.commits/c<seq 12d>-<writerKey>.cmt` LAST. Readers treat a segment
 *     as existing only if its seq has a marker, so a driver crash anywhere
 *     before step 3 leaves nothing visible — there is no partial-epoch
 *     window (the marker create is the single atomic commit point).
 * The writerKey is `b` for batch appends and `q<queryId>-e<epochId>` for
 * streaming epochs: a replayed micro-batch is detected by ITS OWN
 * (query, epoch) marker — never by a foreign segment or a batch append
 * that happened to use the same number — so batch and streaming writers
 * interleave safely on one topic and a crashed partial commit is re-run
 * in full under a fresh seq (the orphaned unmarked segments stay
 * invisible until [[GraftLogBus.expire]] garbage-collects them).
 *
 * Retention: [[GraftLogBus.expire]] drops whole committed segments that
 * lie entirely below a consumer-supplied floor (e.g. the offset a
 * checkpoint has passed); surviving segments keep their offset-carrying
 * names, so surviving offsets — and any checkpoint at or above the
 * floor — stay valid. A checkpoint BEHIND the floor fails fast with
 * "expired by retention" instead of silently skipping records. This also
 * bounds the O(segments) per-trigger listing cost for long-running
 * topics.
 *
 * Scale notes: this is a correctness-faithful stand-in, not a broker — at
 * production scale the same code paths bind to Kafka via
 * `format("kafka")` ([[graft.sources.Bus]], jar-blocked here). Wire
 * format stays the engine's Avro codec either way
 * ([[graft.functions.AvroKit]]), so swapping transports is config-only.
 */
class GraftLogBusSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-bus"
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
  private[v2] def commitsDir(root: String, topic: String): File =
    new File(new File(root, topic), ".commits")
  private def commitsDirFor(partDir: File): File =
    new File(partDir.getParentFile, ".commits")

  // Segment names carry their START OFFSET (Kafka's log-segment naming):
  // `s<commit seq>-o<start offset>-c<record count>.seg`. A segment is
  // fully self-describing — its record range is [start, start+count) by
  // NAME — so a reader's offset attribution never depends on pairing a
  // `.base` read with a directory listing, and [[expire]] deleting
  // segments concurrently with a reader can only shrink what the reader
  // sees, never SHIFT surviving records to wrong offsets.
  private val SegName = """s(\d{12})-o(\d{15})-c(\d+)\.seg""".r
  // the pre-offset-naming format (`s<seq>-t<task>-c<count>.seg`): there is
  // no migration — offsets were derived cumulatively from the listing, a
  // property the offset-named protocol deliberately dropped — so a topic
  // directory still holding one must FAIL FAST, not silently hide data
  private val LegacySegName = """s(\d{12})-t\d+-c(\d+)\.seg""".r
  private val MarkName = """c(\d{12})-(.+)\.cmt""".r
  private val StreamKey = """q(.+)-e(\d{12})""".r

  /** The marker namespace that makes replay detection writer-scoped:
    * a streaming epoch is "already committed" only if ITS query's marker
    * for ITS epoch exists — a batch append (key `b`) or another query's
    * epoch can never fence out a live commit. */
  private[v2] def writerKey(queryId: String, epochId: Long): String =
    f"q${queryId.replaceAll("[^A-Za-z0-9-]", "")}%s-e$epochId%012d"

  private[v2] def markerFile(commits: File, seq: Long, key: String): File =
    new File(commits, f"c$seq%012d-$key.cmt")

  private[v2] def markerExists(commits: File, key: String): Boolean =
    Option(commits.list()).exists(_.exists(_.endsWith(s"-$key.cmt")))

  /** Seqs with a commit marker — the only segments readers may observe. */
  private[v2] def committedSeqs(commits: File): Set[Long] =
    Option(commits.list()).getOrElse(Array.empty[String])
      .iterator.collect { case MarkName(s, _) => s.toLong }.toSet

  /** ALL segment files of one partition, marker-committed or not (strays
    * from a crashed partial commit included): (name, seq, start, count),
    * in offset order — used only for sequence assignment and garbage
    * collection, never by readers. */
  private[v2] def rawSegments(dir: File): Seq[(String, Long, Long, Long)] = {
    val names = Option(dir.listFiles()).getOrElse(Array.empty[File])
      .iterator.map(_.getName).toSeq
    names.collectFirst { case n @ LegacySegName(_, _) => n }.foreach { n =>
      throw new IllegalStateException(
        s"bus partition $dir holds a legacy-named segment '$n' " +
          "(pre-offset-naming format): its offsets cannot be derived under " +
          "the offset-named protocol — re-produce the topic into a fresh " +
          "directory; silently ignoring it would lose data")
    }
    names.collect {
      case n @ SegName(s, o, c) => (n, s.toLong, o.toLong, c.toLong)
    }.sortBy(t => (t._3, t._2))
  }

  /** Committed segments of one partition in offset order:
    * (name, start, count). */
  private[v2] def segments(dir: File): Seq[(String, Long, Long)] = {
    val committed = committedSeqs(commitsDirFor(dir))
    rawSegments(dir).collect { case (n, s, o, c) if committed(s) => (n, o, c) }
  }

  /** The `.base` marker: log-start offset once ALL segments below it are
    * expired (an empty partition's position); consulted only when no
    * committed segment exists — live segments carry their own offsets. */
  private def storedBase(dir: File): Long = {
    val f = new File(dir, ".base")
    if (f.exists())
      new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim.toLong
    else 0L
  }

  /** Log-start offset of one partition — the offset of the first retained
    * record. Self-describing when segments exist (their names carry
    * offsets); `.base` only positions an EMPTY log, so no reader ever
    * depends on `.base` agreeing with a racing [[expire]]'s listing. */
  private[v2] def baseOffset(dir: File): Long = {
    val segs = segments(dir)
    if (segs.nonEmpty) segs.head._2 else storedBase(dir)
  }

  private def writeBase(dir: File, base: Long): Unit = {
    val tmp = new File(dir, ".base.tmp")
    java.nio.file.Files.write(tmp.toPath, base.toString.getBytes("UTF-8"))
    if (!tmp.renameTo(new File(dir, ".base")))
      throw new IllegalStateException(s"cannot advance base offset in $dir")
  }

  /** Log-end offset of one partition. */
  private[v2] def endOffset(dir: File): Long = {
    val segs = segments(dir)
    if (segs.nonEmpty) { val l = segs.last; l._2 + l._3 }
    else storedBase(dir)
  }

  /** Next free commit sequence: above every segment file (committed or
    * stray) AND every marker, so a crashed partial commit can never be
    * collided with and an expired-but-marked seq is never reused. */
  private[v2] def maxSeq(root: String, topic: String, partitions: Int): Long = {
    val segMax = (0 until partitions).iterator
      .flatMap(p => rawSegments(partDir(root, topic, p)).iterator.map(_._2))
    val markMax = Option(commitsDir(root, topic).list())
      .getOrElse(Array.empty[String]).iterator.collect { case MarkName(s, _) => s.toLong }
    (segMax ++ markMax).foldLeft(-1L)(math.max)
  }

  private[v2] def segName(seq: Long, start: Long, count: Long): String =
    f"s$seq%012d-o$start%015d-c$count.seg"

  /** What [[expire]] did: counts for observability and spec assertions. */
  case class ExpireStats(segmentsDeleted: Int, recordsDropped: Long,
      straysDeleted: Int, markersDeleted: Int)

  /**
   * Retention: per partition, delete whole committed segments whose records
   * all lie below `floor(p)` (the offset a consumer's checkpoint has safely
   * passed) — offsets of every surviving record, and every checkpoint at or
   * above the floor, stay exactly valid. ATOMIC FOR READERS: segments are
   * offset-named, so a reader racing the deletes sees some subset of
   * committed segments, each self-attributing its exact record range — a
   * surviving segment can never be observed at shifted-down offsets (the
   * `.base` marker, advanced BEFORE the deletes, only positions the log
   * once it is empty). Also garbage-collects (a) stray unmarked segments
   * left by crashed partial commits — AGE-GATED by `strayMinAgeMillis`,
   * because an in-flight commit's renamed-but-not-yet-marked segments look
   * exactly like strays (same guard as [[graft.sources.lake.GraftLake.vacuum]]'s
   * orphan rule) — and (b) markers whose segments are gone, EXCEPT each
   * streaming query's highest epoch marker, kept as the replay fence for
   * the one epoch Structured Streaming can still replay after a restart.
   *
   * Call from the single-committer maintenance context (no commit racing),
   * like Kafka's log-cleaner runs inside the partition leader.
   */
  def expire(root: String, topic: String, partitions: Int,
      floor: Int => Long,
      strayMinAgeMillis: Long = 60L * 60 * 1000): ExpireStats = {
    var segsDel = 0; var recsDropped = 0L; var straysDel = 0
    val commits = commitsDir(root, topic)
    val committed = committedSeqs(commits)
    val strayCutoff = System.currentTimeMillis() - strayMinAgeMillis
    (0 until partitions).foreach { p =>
      val dir = partDir(root, topic, p)
      val lim = floor(p)
      val (live, strays) = rawSegments(dir).partition(s => committed(s._2))
      strays.foreach { case (name, _, _, _) =>
        val f = new File(dir, name)
        if (f.lastModified() <= strayCutoff && f.delete()) straysDel += 1
      }
      // whole committed segments entirely below the floor, lowest first
      val doomed = live.takeWhile { case (_, _, start, count) => start + count <= lim }
      if (doomed.nonEmpty) {
        val newBase = { val l = doomed.last; l._3 + l._4 }
        // fence FIRST: once `.base` says the log starts at newBase, deleting
        // the segments below it is invisible to offset attribution — readers
        // either still see a (self-describing) doomed segment or don't
        if (newBase > storedBase(dir)) writeBase(dir, newBase)
        doomed.foreach { case (name, _, _, count) =>
          if (!new File(dir, name).delete())
            throw new IllegalStateException(s"cannot expire $name in $dir")
          segsDel += 1; recsDropped += count
        }
      }
    }
    // marker GC: segments all gone AND not a query's latest epoch fence
    val liveSeqs = (0 until partitions).iterator
      .flatMap(p => rawSegments(partDir(root, topic, p)).iterator.map(_._2)).toSet
    val markers = Option(commits.listFiles()).getOrElse(Array.empty[File])
      .flatMap(f => f.getName match {
        case MarkName(s, key) => Some((f, s.toLong, key))
        case _ => None
      })
    val latestEpoch = markers.collect { case (_, _, StreamKey(q, e)) => (q, e.toLong) }
      .groupBy(_._1).map { case (q, es) => q -> es.map(_._2).max }
    var marksDel = 0
    markers.foreach { case (f, seq, key) =>
      val isLatestFence = key match {
        case StreamKey(q, e) => latestEpoch.get(q).contains(e.toLong)
        case _ => false
      }
      if (!liveSeqs(seq) && !isLatestFence && f.delete()) marksDel += 1
    }
    ExpireStats(segsDel, recsDropped, straysDel, marksDel)
  }

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
            BusRange(dir.getPath, p, GraftLogBus.baseOffset(dir),
              GraftLogBus.endOffset(dir)): InputPartition
          }.filter(r => r.asInstanceOf[BusRange].end > r.asInstanceOf[BusRange].start)
            .toArray
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
    val queryId = info.queryId()
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new BusBatchWrite(root, topic, partitions)
        override def toStreaming: StreamingWrite =
          new BusStreamingWrite(root, topic, partitions, queryId)
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
    // a new consumer starts at the log-start offset (post-retention base)
    BusOffset((0 until partitions).map(p =>
      p -> GraftLogBus.baseOffset(GraftLogBus.partDir(root, topic, p))).toMap)

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
      val base = GraftLogBus.baseOffset(GraftLogBus.partDir(root, topic, p))
      val s = from.getOrElse(p, base)
      if (s < base)
        throw new IllegalStateException(
          s"topic $topic partition $p: checkpoint offset $s expired by " +
            s"retention (log now starts at $base) — records were dropped " +
            "before this consumer passed them; reset the checkpoint or " +
            "expire only below consumed offsets")
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
    // open only segments overlapping [start, end); each segment's record
    // range comes from its NAME, so a concurrent expire can only remove
    // whole already-consumed segments from this listing — never shift the
    // offsets attributed to surviving ones
    val slices = GraftLogBus.segments(new File(r.dir)).flatMap {
      case (name, segBase, count) => // (name, segBase, skip, take)
        val lo = math.max(r.start, segBase)
        val hi = math.min(r.end, segBase + count)
        if (hi > lo) Some((name, segBase, lo - segBase, hi - lo)) else None
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
 * `.tmp/` (invisible to readers); the driver assigns the next free log
 * sequence, renames every committed attempt's file into the log, and
 * creates the commit marker LAST — the marker is the atomic visibility
 * point, so a crash anywhere before it leaves nothing reader-visible.
 * Single driver-side commit point serializes sequence assignment (the
 * "partition leader" role).
 */
class BusBatchWrite(root: String, topic: String, partitions: Int)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new BusWriterFactory(root, topic, partitions)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val seq = GraftLogBus.maxSeq(root, topic, partitions) + 1
    BusCommit.commit(root, topic, seq, "b", messages)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    BusCommit.cleanup(messages)
}

/**
 * Producer, streaming flavor. Idempotence under micro-batch replay keys
 * on the (queryId, epochId) MARKER, not on segment names: a replayed
 * epoch whose marker exists committed fully before the failure and only
 * cleans its tmp files; an epoch whose marker is absent — including one
 * whose previous attempt crashed mid-rename — re-commits IN FULL under a
 * fresh log sequence (the crashed attempt's unmarked segments were never
 * reader-visible and are swept by [[GraftLogBus.expire]]). Batch appends
 * (key `b`) and other queries' epochs live in different marker
 * namespaces, so they can never fence out a live epoch (Kafka's
 * transactional-producer epoch fencing, per producer identity).
 */
class BusStreamingWrite(root: String, topic: String, partitions: Int,
    queryId: String = "test")
    extends StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new BusStreamingWriterFactory(root, topic, partitions)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val key = GraftLogBus.writerKey(queryId, epochId)
    if (GraftLogBus.markerExists(GraftLogBus.commitsDir(root, topic), key))
      BusCommit.cleanup(messages)
    else {
      val seq = GraftLogBus.maxSeq(root, topic, partitions) + 1
      BusCommit.commit(root, topic, seq, key, messages)
    }
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
  /** Two-phase commit, atomic at the marker: rename every attempt's tmp
    * file to its final OFFSET-NAMED segment, THEN create the single
    * `c<seq>-<key>.cmt` marker that makes the whole commit visible. The
    * single driver-side committer (the "partition leader") assigns each
    * segment its start offset — the partition's committed log end, then
    * cumulative in task order — so segments self-describe their record
    * ranges. A crashed attempt's renamed-but-unmarked segments are never
    * reader-visible; the re-commit under a fresh seq re-reads the
    * COMMITTED end, so offsets never double-allocate. */
  def commit(root: String, topic: String, seq: Long, key: String,
      messages: Array[WriterCommitMessage]): Unit = {
    var any = false
    flatten(messages).groupBy(_.partition).toSeq.sortBy(_._1)
      .foreach { case (p, msgs) =>
        val dir = GraftLogBus.partDir(root, topic, p)
        dir.mkdirs()
        var start = GraftLogBus.endOffset(dir)
        msgs.sortBy(_.taskId).foreach { case BusSegMessage(_, _, count, tmpPath) =>
          if (count > 0) {
            val target = new File(dir, GraftLogBus.segName(seq, start, count))
            if (!new File(tmpPath).renameTo(target) && !target.exists())
              throw new IllegalStateException(s"bus commit failed: $tmpPath -> $target")
            start += count
            any = true
          } else new File(tmpPath).delete()
        }
      }
    if (any) {
      val commits = GraftLogBus.commitsDir(root, topic)
      commits.mkdirs()
      val m = GraftLogBus.markerFile(commits, seq, key)
      if (!m.createNewFile() && !m.exists())
        throw new IllegalStateException(s"bus commit marker failed: $m")
    }
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
