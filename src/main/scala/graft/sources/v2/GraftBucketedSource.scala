package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Literal, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsReportPartitioning, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * A bucket-partitioned DataSource V2 table (`graft-bucketed`) that REPORTS
 * its partitioning to Catalyst — the storage-partitioned-join (SPJ)
 * surface: the table declares `partitioning() = identity(bucket)`, each
 * input partition carries its bucket value ([[HasPartitionKey]]), and the
 * scan reports [[KeyGroupedPartitioning]]. When two such tables join on
 * the bucket column (with `spark.sql.sources.v2.bucketing.enabled=true`),
 * Catalyst matches the reported partitionings and plans the join with NO
 * exchange on either side — the DSv2 generalization of bucketed-table
 * joins, and at 100 TB the difference between joining two co-located
 * tables in place and shuffling both (SPARK-37375's motivation; same
 * contract Iceberg's bucket-partitioned tables use).
 *
 *   spark.read.format("graft.sources.v2.GraftBucketedSource")
 *     .option("rows", "10000").option("buckets", "8").load()
 *
 * Content is pure id arithmetic (like [[GraftDocsSource]]), so the
 * connector — and the join run through it — replays exactly in any SQL
 * engine: doc_id ∈ [0, rows), bucket = doc_id % buckets,
 * v = (doc_id * 31) % 1000. Bucket b's input partition enumerates
 * b, b+B, b+2B, … — partition pruning by bucket is the layout itself.
 */
class GraftBucketedSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftBucketed.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftBucketedTable(
      Option(properties.get("rows")).map(_.toLong).getOrElse(1000L),
      Option(properties.get("buckets")).map(_.toInt).getOrElse(8))
}

object GraftBucketed {
  val schema: StructType = new StructType()
    .add("doc_id", LongType, nullable = false)
    .add("bucket", LongType, nullable = false)
    .add("v", LongType, nullable = false)

  def v(id: Long): Long = (id * 31) % 1000

  /** Test observability: partitions whose readers were actually opened —
    * how the runtime-pruning spec proves whole buckets were skipped.
    * Execution-side state, valid in local mode (same JVM). */
  val partitionsOpened = new java.util.concurrent.atomic.AtomicInteger(0)
}

class GraftBucketedTable(rows: Long, buckets: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_bucketed($rows,$buckets)"
  override def schema(): StructType = GraftBucketed.schema
  override def partitioning(): Array[Transform] =
    Array(Expressions.identity("bucket"))
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new GraftBucketedScan(rows, buckets)
}

class GraftBucketedScan(rows: Long, buckets: Int) extends Scan with Batch
    with SupportsReportPartitioning with SupportsRuntimeV2Filtering {

  override def readSchema(): StructType = GraftBucketed.schema

  override def description(): String = s"GraftBucketedScan rows=$rows buckets=$buckets"

  /** One input partition per bucket, each keyed by its bucket value — the
    * contract [[KeyGroupedPartitioning]] requires: Spark groups/aligns
    * partitions of both join sides by these keys. */
  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(Array(Expressions.identity("bucket")), buckets)

  // ── runtime (dynamic) bucket pruning ────────────────────────────────────
  // Catalyst's PartitionPruning plants a DynamicPruningExpression on
  // `bucket` when this scan joins a selectively-filtered dim; at runtime
  // the build side's bucket values arrive here as IN/= predicates and
  // whole buckets drop out of planInputPartitions — the DSv2 twin of
  // parquet dynamic partition pruning (SPARK-35779 surface).
  private var allowed: Option[Set[Long]] = None

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("bucket"))

  override def filter(predicates: Array[Predicate]): Unit = {
    def litValue(c: Any): Option[Long] = c match {
      case l: Literal[_] => l.value match {
        case x: java.lang.Long => Some(x.toLong)
        case x: java.lang.Integer => Some(x.toLong)
        case x: java.lang.Short => Some(x.toLong)
        case x: java.lang.Byte => Some(x.toLong)
        case _ => None
      }
      case _ => None
    }
    predicates.foreach { p =>
      val isBucketRef = p.children().headOption.exists {
        case f: NamedReference => f.describe() == "bucket"
        case _ => false
      }
      if (isBucketRef && (p.name() == "IN" || p.name() == "=")) {
        // prune ONLY when every value child is a recognized integral
        // literal: partial extraction (a cast-wrapped value, a mixed
        // literal/expression IN list) would yield a too-small allowed set
        // and silently DROP whole buckets — wrong missing rows, not a
        // skipped optimization. Treat it as unrecognized instead.
        val valueChildren = p.children().drop(1)
        val vs = valueChildren.map(litValue)
        if (valueChildren.nonEmpty && vs.forall(_.isDefined)) {
          val set = vs.flatten.toSet
          allowed = Some(allowed.fold(set)(_ intersect set))
        }
      }
      // unrecognized predicates are ignored — pruning is an optimization,
      // Spark re-applies the semantic filter above the scan
    }
  }

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    (0 until buckets)
      .filter(b => allowed.forall(_.contains(b.toLong)))
      .map(b => GraftBucketPartition(b, rows, buckets): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    (p: InputPartition) => {
      val part = p.asInstanceOf[GraftBucketPartition]
      GraftBucketed.partitionsOpened.incrementAndGet()
      new PartitionReader[InternalRow] {
        private var id = part.bucket.toLong - part.buckets
        override def next(): Boolean = { id += part.buckets; id < part.rows }
        override def get(): InternalRow =
          InternalRow(id, id % part.buckets, GraftBucketed.v(id))
        override def close(): Unit = ()
      }
    }
}

case class GraftBucketPartition(bucket: Int, rows: Long, buckets: Int)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(bucket.toLong)
}
