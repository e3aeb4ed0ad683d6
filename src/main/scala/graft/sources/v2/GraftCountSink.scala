package graft.sources.v2

import java.util
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * The DSv2 WRITE path counterpart to [[GraftDocsSource]]: a sink that
 * counts rows with the full two-phase commit protocol —
 * per-task [[DataWriter]]s accumulate and emit a [[WriterCommitMessage]]
 * on task commit; the driver-side [[BatchWrite.commit]] aggregates the
 * messages of the ONE successful attempt per task. Speculative/retried
 * attempts call `abort()` and their counts are discarded, so the
 * committed total is exactly-once even under task retry — the invariant
 * every real connector's sink must uphold, spec-enforced here.
 *
 *   df.write.format("graft.sources.v2.GraftCountSink")
 *     .option("tag", "run1").mode("append").save()
 *   GraftCountSink.committed("run1")  // total rows, after commit only
 */
class GraftCountSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftCountTable(schema,
      Option(properties.get("tag")).getOrElse("default"))
}

object GraftCountSink {
  private val totals = new ConcurrentHashMap[String, Long]()
  /** Committed row total for a tag; absent until BatchWrite.commit ran. */
  def committed(tag: String): Option[Long] = Option(totals.get(tag))
  private[v2] def record(tag: String, n: Long): Unit = totals.put(tag, n)
  def clear(tag: String): Unit = totals.remove(tag)

  // streaming ledger: per (tag, epoch) committed counts. Keyed by epoch so
  // a REPLAYED epoch (post-restart micro-batch re-run — the case Structured
  // Streaming's contract explicitly allows) overwrites its own entry
  // instead of double-counting: commit is IDEMPOTENT per epoch, which is
  // what makes the end-to-end pipeline exactly-once.
  private val epochs =
    new ConcurrentHashMap[String, ConcurrentHashMap[Long, Long]]()
  private[v2] def recordEpoch(tag: String, epoch: Long, n: Long): Unit =
    epochs.computeIfAbsent(tag, _ => new ConcurrentHashMap[Long, Long]())
      .put(epoch, n)
  /** Sum of all committed epochs for a tag (0 if none committed yet). */
  def committedStreaming(tag: String): Long = {
    val m = epochs.get(tag)
    if (m == null) 0L
    else {
      var s = 0L
      m.values().forEach(v => s += v)
      s
    }
  }
  def committedEpochs(tag: String): Int = {
    val m = epochs.get(tag); if (m == null) 0 else m.size()
  }
  def clearStreaming(tag: String): Unit = epochs.remove(tag)
}

class GraftCountTable(writeSchema: StructType, tag: String) extends Table
    with SupportsWrite {
  override def name(): String = s"graft_count_sink($tag)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new GraftCountBatchWrite(tag)
        override def toStreaming: StreamingWrite =
          new GraftCountStreamingWrite(tag)
      }
    }
}

case class CountMessage(rows: Long) extends WriterCommitMessage

class GraftCountBatchWrite(tag: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftCountWriterFactory
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    GraftCountSink.record(tag,
      messages.map(_.asInstanceOf[CountMessage].rows).sum)
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class GraftCountWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var n = 0L
      override def write(record: InternalRow): Unit = n += 1
      override def commit(): WriterCommitMessage = CountMessage(n)
      override def abort(): Unit = n = 0L // discarded attempt contributes nothing
      override def close(): Unit = ()
    }
}

/**
 * The STREAMING write path: same per-task two-phase protocol, plus the
 * epoch dimension — `commit(epochId, messages)` records into the per-epoch
 * ledger, so a replayed micro-batch re-commits its own epoch idempotently
 * instead of double-counting (the Structured Streaming sink contract for
 * end-to-end exactly-once; a real connector keys its external writes the
 * same way, e.g. `(topic, epoch)` transactional markers).
 */
class GraftCountStreamingWrite(tag: String) extends StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new GraftCountStreamingWriterFactory
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    GraftCountSink.recordEpoch(tag, epochId,
      messages.map(_.asInstanceOf[CountMessage].rows).sum)
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

class GraftCountStreamingWriterFactory extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var n = 0L
      override def write(record: InternalRow): Unit = n += 1
      override def commit(): WriterCommitMessage = CountMessage(n)
      override def abort(): Unit = n = 0L
      override def close(): Unit = ()
    }
}
