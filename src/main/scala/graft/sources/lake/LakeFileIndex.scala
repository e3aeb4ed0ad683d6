package graft.sources.lake

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, FileStatusWithMetadata, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/**
 * Planner-integrated lake reads: a Spark [[FileIndex]] over a
 * [[GraftLake]] snapshot, so footer-stats FILE pruning happens inside
 * query planning — `readPruned(...).filter(pred)` plans a
 * FileSourceScan over only the stat-overlapping files, no special scan
 * API needed (the same integration seam Delta's TahoeFileIndex uses).
 * `FileSourceStrategy` hands the pushed data filters to [[listFiles]];
 * anything the stats cannot disprove is listed, and the filters still
 * run as residuals — pruning is planning-time acceleration, never a
 * correctness dependency. The index pins the snapshot taken at
 * construction (snapshot isolation under concurrent writers; build a
 * new one to advance).
 */
final class LakeFileIndex(spark: SparkSession, val dir: String,
    asOf: Option[Long] = None) extends FileIndex {

  private val snap: GraftLake.Snapshot = GraftLake.snapshot(spark, dir, asOf)

  // any scan planned over this index resolves parquet columns by field id
  // (rename-stable); enabling the conf is benign for id-less schemas
  GraftLake.ensureFieldIdRead(spark)

  def schema: StructType = snap.schema

  override def rootPaths: Seq[Path] = Seq(new Path(dir))

  override def partitionSchema: StructType = new StructType()

  override def inputFiles: Array[String] = snap.activePaths.toArray

  override def refresh(): Unit = () // immutable snapshot by design

  override def sizeInBytes: Long = snap.files.map(_.bytes).sum

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept = GraftLake.overlappingResolved(snap, dataFilters)
    val statuses = kept.map { a =>
      FileStatusWithMetadata(
        new FileStatus(a.bytes, false, 1, 128L << 20, 0L,
          new Path(s"$dir/${a.path}")),
        Map.empty)
    }
    Seq(PartitionDirectory(InternalRow.empty, statuses))
  }
}

object LakeFileIndex {

  /** The planner-integrated relation itself — what [[readPruned]] wraps
    * and what [[GraftLakeSource]] hands the catalog, so `spark.table` /
    * `SELECT ... FROM t` plan the same pruned FileSourceScan. */
  def relation(spark: SparkSession, dir: String,
      asOf: Option[Long] = None): HadoopFsRelation = {
    val idx = new LakeFileIndex(spark, dir, asOf)
    HadoopFsRelation(
      location = idx,
      partitionSchema = new StructType(),
      dataSchema = idx.schema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map("mergeSchema" -> "true"))(spark)
  }

  /** A DataFrame whose scan plans through [[LakeFileIndex]]: filters
    * prune files at planning time, automatically. Old files missing an
    * evolved column null-fill via mergeSchema, as in [[GraftLake.read]]. */
  def readPruned(spark: SparkSession, dir: String,
      asOf: Option[Long] = None): DataFrame =
    spark.baseRelationToDataFrame(relation(spark, dir, asOf))
}
