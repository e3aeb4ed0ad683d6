package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsReportPartitioning}
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
    with SupportsReportPartitioning {

  override def readSchema(): StructType = GraftBucketed.schema

  override def description(): String = s"GraftBucketedScan rows=$rows buckets=$buckets"

  /** One input partition per bucket, each keyed by its bucket value — the
    * contract [[KeyGroupedPartitioning]] requires: Spark groups/aligns
    * partitions of both join sides by these keys. */
  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(Array(Expressions.identity("bucket")), buckets)

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    (0 until buckets).map(b =>
      GraftBucketPartition(b, rows, buckets): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    (p: InputPartition) => {
      val part = p.asInstanceOf[GraftBucketPartition]
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
