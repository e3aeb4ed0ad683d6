package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
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
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftDocsScanBuilder(rows, slices)
}

class GraftDocsScanBuilder(rows: Long, slices: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = 0L
  private var hi = rows - 1
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = GraftDocs.schema

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

  override def build(): Scan = new GraftDocsScan(lo, hi, slices, required)
}

class GraftDocsScan(lo: Long, hi: Long, slices: Int, required: StructType)
    extends Scan with Batch {

  override def readSchema(): StructType = required

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
