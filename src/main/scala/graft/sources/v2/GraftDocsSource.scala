package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.read.{Statistics, SupportsReportStatistics}
import java.util.OptionalLong
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * A complete DataSource V2 connector (the S-category extension surface:
 * author-your-own source, not just consume built-ins): a deterministic
 * synthetic document table `graft-docs`, defined purely by arithmetic on
 * the row id — so any SQL engine can replay its content exactly, which is
 * what makes the connector itself oracle-gatable.
 *
 *   spark.read.format("graft.sources.v2.GraftDocsSource")
 *     .option("rows", "100000").option("slices", "8").load()
 *
 * Schema: (doc_id BIGINT, lang STRING, text STRING) with
 * lang = langs[doc_id mod 5] and text = three arithmetic tokens.
 *
 * The read path implements the two pushdowns that matter at 100 TB:
 *  - FILTER pushdown: >,>=,<,<=,= on doc_id tighten the generated [lo, hi]
 *    range INSIDE the scan (accepted filters are reported back as pushed,
 *    everything else stays a residual for Spark to apply);
 *  - COLUMN pruning: the reader materializes only the requested fields.
 * The scan splits its range into `slices` input partitions — the
 * parallelism contract a real connector must honor.
 */
class GraftDocsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftDocs.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftDocsTable(
      Option(properties.get("rows")).map(_.toLong).getOrElse(1000L),
      Option(properties.get("slices")).map(_.toInt).getOrElse(8))
}

object GraftDocs {
  val schema: StructType = new StructType()
    .add("doc_id", LongType, nullable = false)
    .add("lang", StringType, nullable = false)
    .add("text", StringType, nullable = false)

  val langs: Array[String] = Array("en", "de", "fr", "es", "pt")

  def lang(id: Long): String = langs((id % 5).toInt)
  def text(id: Long): String =
    s"tok${id % 97} tok${(id * 7) % 89} tok${(id * 13) % 83}"
}

class GraftDocsTable(rows: Long, slices: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_docs($rows)"
  override def schema(): StructType = GraftDocs.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftDocsScanBuilder(rows, slices,
      Option(options.get("rowsPerBatch")).map(_.toLong).getOrElse(100L))
}

class GraftDocsScanBuilder(rows: Long, slices: Int, rowsPerBatch: Long = 100L) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var lo = 0L
  private var hi = rows - 1
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = GraftDocs.schema
  private var countPushed = false

  /** COUNT(*) / MIN(doc_id) / MAX(doc_id) with no grouping never need
    * generated rows — the (filter-tightened) range IS the answer (the DSv2
    * twin of [[graft.spark.FooterCountStrategy]]'s footer trick, extended
    * the way parquet footers also answer min/max). Complete pushdown: the
    * scan returns the single aggregated row with one value per pushed
    * aggregate, in declaration order. */
  private def rangeAnswerable(aggregation: Aggregation): Boolean = {
    def onDocId(f: AggregateFunc, c: Array[_ <: org.apache.spark.sql.connector.expressions.Expression]): Boolean =
      c.length == 1 && (c(0) match {
        case n: NamedReference => n.describe() == "doc_id"
        case _ => false
      })
    aggregation.groupByExpressions().isEmpty &&
      aggregation.aggregateExpressions().nonEmpty &&
      aggregation.aggregateExpressions().forall {
        case _: CountStar => true
        case m: Min => onDocId(m, m.children())
        case m: Max => onDocId(m, m.children())
        case _ => false
      }
  }

  private var pushedAggs: Seq[AggregateFunc] = Nil

  override def pushAggregation(aggregation: Aggregation): Boolean = {
    val ok = rangeAnswerable(aggregation)
    if (ok) {
      countPushed = true
      pushedAggs = aggregation.aggregateExpressions().toSeq
    }
    ok
  }

  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    rangeAnswerable(aggregation)

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, residual) = filters.partition {
      case GreaterThan("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThanOrEqual("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThan("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThanOrEqual("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
      case EqualTo("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
      case _ => false
    }
    ours.foreach {
      case GreaterThan(_, v) => lo = math.max(lo, num(v) + 1)
      case GreaterThanOrEqual(_, v) => lo = math.max(lo, num(v))
      case LessThan(_, v) => hi = math.min(hi, num(v) - 1)
      case LessThanOrEqual(_, v) => hi = math.min(hi, num(v))
      case EqualTo(_, v) => lo = math.max(lo, num(v)); hi = math.min(hi, num(v))
      case _ =>
    }
    accepted = ours
    residual
  }

  private def num(v: Any): Long = v match {
    case l: java.lang.Long => l
    case i: java.lang.Integer => i.toLong
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    if (countPushed) new GraftDocsCountScan(lo, hi, pushedAggs)
    else new GraftDocsScan(lo, hi, slices, required, rowsPerBatch)
}

/** The aggregated scan for completely-pushed COUNT(*)/MIN/MAX(doc_id):
  * one partition, one row, each value answered by range arithmetic.
  * Empty ranges yield count 0 and null min/max (the SQL aggregate
  * contract). */
class GraftDocsCountScan(lo: Long, hi: Long, aggs: Seq[AggregateFunc])
    extends Scan with Batch {
  override def readSchema(): StructType =
    aggs.zipWithIndex.foldLeft(new StructType()) {
      case (st, (_: CountStar, i)) => st.add(s"count_$i", LongType, nullable = false)
      case (st, (_, i)) => st.add(s"agg_$i", LongType, nullable = true)
    }
  override def description(): String =
    s"GraftDocsCountScan range=[$lo,$hi] aggs=${aggs.map(_.describe()).mkString(",")}"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftDocsPartition(lo, hi))
  override def createReaderFactory(): PartitionReaderFactory = {
    // AggregateFunc instances are not Serializable — ship primitive tags
    val tags: Array[Int] = aggs.map {
      case _: CountStar => 0
      case _: Min => 1
      case _: Max => 2
      case other => throw new IllegalStateException(
        s"unexpected pushed aggregate ${other.describe()}")
    }.toArray
    (p: InputPartition) => {
      val part = p.asInstanceOf[GraftDocsPartition]
      new PartitionReader[InternalRow] {
        private var emitted = false
        override def next(): Boolean = { val r = !emitted; emitted = true; r }
        override def get(): InternalRow = {
          val empty = part.end < part.start
          InternalRow.fromSeq(tags.toSeq.map {
            case 0 => if (empty) 0L else part.end - part.start + 1
            case 1 => if (empty) null else part.start
            case 2 => if (empty) null else part.end
          })
        }
        override def close(): Unit = ()
      }
    }
  }
}

class GraftDocsScan(lo: Long, hi: Long, slices: Int, required: StructType,
    rowsPerBatch: Long = 100L) extends Scan with Batch
    with SupportsReportStatistics {

  override def readSchema(): StructType = required

  /** Accurate statistics AFTER pushdown (the range is known exactly), so
    * Catalyst's join planning can broadcast a small filtered slice of this
    * source instead of shuffling it — spec-pinned. ~30 bytes/row covers
    * the two short strings. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val n = math.max(0L, hi - lo + 1)
    override def sizeInBytes(): OptionalLong = OptionalLong.of(n * 30L)
    override def numRows(): OptionalLong = OptionalLong.of(n)
  }

  override def description(): String =
    s"GraftDocsScan range=[$lo,$hi] cols=${required.fieldNames.mkString(",")}"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    if (hi < lo) return Array.empty
    val n = hi - lo + 1
    val per = math.max(1L, (n + slices - 1) / slices)
    (lo to hi by per).map(s =>
      GraftDocsPartition(s, math.min(s + per - 1, hi)): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftDocsReaderFactory(required.fieldNames)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftDocsMicroBatchStream(lo, hi, slices, required.fieldNames,
      rowsPerBatch)
}

/** Offset = the next unread doc id; a plain long as JSON. */
case class DocsOffset(next: Long) extends Offset {
  override def json(): String = next.toString
}

/**
 * The UNBOUNDED read path: the same deterministic id range served as a
 * micro-batch stream with admission control — `latestOffset(start, limit)`
 * admits at most `rowsPerBatch` ids per trigger (the Kafka-style
 * maxOffsetsPerTrigger contract), batches re-plan as sliced partitions of
 * the admitted range, and offsets checkpoint/restore as plain longs so a
 * restarted query resumes exactly where it stopped.
 */
class GraftDocsMicroBatchStream(lo: Long, hi: Long, slices: Int,
    fields: Array[String], rowsPerBatch: Long)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  override def initialOffset(): Offset = DocsOffset(lo)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)

  // Trigger.AvailableNow: the range is already bounded by `hi`, so the
  // "snapshot what's available" preparation is a no-op — read limits keep
  // pacing the catch-up batches until reportLatestOffset is reached
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: use latestOffset(start, limit)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[DocsOffset].next
    val next = limit match {
      case r: ReadMaxRows => math.min(hi + 1, from + r.maxRows())
      case _: ReadAllAvailable => hi + 1
      case _ => math.min(hi + 1, from + rowsPerBatch)
    }
    DocsOffset(next)
  }

  override def reportLatestOffset(): Offset = DocsOffset(hi + 1)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[DocsOffset].next
    val e = end.asInstanceOf[DocsOffset].next - 1
    if (e < s) return Array.empty
    val n = e - s + 1
    val per = math.max(1L, (n + slices - 1) / slices)
    (s to e by per).map(b =>
      GraftDocsPartition(b, math.min(b + per - 1, e)): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftDocsReaderFactory(fields)

  override def deserializeOffset(json: String): Offset = DocsOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class GraftDocsPartition(start: Long, end: Long) extends InputPartition

class GraftDocsReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[GraftDocsPartition]
    new PartitionReader[InternalRow] {
      private var id = part.start - 1
      override def next(): Boolean = { id += 1; id <= part.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(fields.toSeq.map {
          case "doc_id" => id
          case "lang" => UTF8String.fromString(GraftDocs.lang(id))
          case "text" => UTF8String.fromString(GraftDocs.text(id))
        })
      override def close(): Unit = ()
    }
  }
}
