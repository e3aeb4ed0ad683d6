package graft.sources.v2

import java.util
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
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
}

class GraftCountTable(writeSchema: StructType, tag: String) extends Table
    with SupportsWrite {
  override def name(): String = s"graft_count_sink($tag)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new GraftCountBatchWrite(tag)
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
