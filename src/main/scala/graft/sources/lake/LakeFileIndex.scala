package graft.sources.lake

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, FileStatusWithMetadata, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions.col
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
 *
 * Deletion vectors: when the snapshot carries DV'd files, a SINGLE
 * FileSourceScan cannot subtract per-file row positions, so the scan is
 * SPLIT — `dvSubset` restricts one index to the clean files and a twin
 * to the DV-carrying ones; [[LakeFileIndex.readPruned]] (and the DML
 * rule, for catalog reads) unions the clean scan with the DV scan
 * filtered by the codegen'd [[DvDeleted]] position predicate. BOTH
 * branches keep full planning-time footer-stats pruning — row-level
 * deletes are orthogonal to file-level skipping.
 */
final class LakeFileIndex private[lake] (spark: SparkSession, val dir: String,
    asOf: Option[Long], preloaded: Option[GraftLake.Snapshot],
    private[lake] val dvSubset: Option[Boolean]) extends FileIndex {

  def this(spark: SparkSession, dir: String, asOf: Option[Long] = None) =
    this(spark, dir, asOf, None, None)

  private[graft] val snap: GraftLake.Snapshot =
    preloaded.getOrElse(GraftLake.snapshot(spark, dir, asOf))

  // any scan planned over this index resolves parquet columns by field id
  // (rename-stable); enabling the conf is benign for id-less schemas
  GraftLake.ensureFieldIdRead(spark)

  /** The files this index serves: all, clean-only, or DV-carrying-only. */
  private def subsetFiles: Seq[GraftLake.AddFile] = dvSubset match {
    case None => snap.files
    case Some(withDv) => snap.files.filter(_.dv.isDefined == withDv)
  }

  private[graft] def isAllSubset: Boolean = dvSubset.isEmpty
  private[graft] def hasDv: Boolean = snap.files.exists(_.dv.isDefined)

  /** The snapshot restricted to the files this index actually serves —
    * what log-fed column stats must fold over. Folding the FULL snapshot
    * on a DV split-scan branch counts the other branch's rows too: a
    * branch's nullCount could then exceed its rowCount, and CBO's
    * IsNotNull selectivity (1 − nullCount/rowCount) goes negative. */
  private[graft] def subsetSnap: GraftLake.Snapshot =
    if (dvSubset.isEmpty) snap else snap.copy(files = subsetFiles)

  def schema: StructType = snap.schema

  override def rootPaths: Seq[Path] = Seq(new Path(dir))

  override def partitionSchema: StructType = new StructType()

  override def inputFiles: Array[String] =
    subsetFiles.map(f => GraftLake.absPath(dir, f.path)).toArray

  override def refresh(): Unit = () // immutable snapshot by design

  /** Live rows this index serves — log-exact, DV-adjusted. */
  private[graft] def liveRows: Long =
    subsetFiles.map(f => f.rows - f.dv.map(_.cardinality).getOrElse(0L)).sum

  /** DV-adjusted size: a file's bytes scaled by its live-row fraction, so
    * a mostly-deleted MoR table sizes (and broadcasts) by what its scan
    * actually returns, not by raw parquet bytes that include dead rows. */
  override def sizeInBytes: Long = subsetFiles.map { f =>
    f.dv match {
      case Some(d) if f.rows > 0 =>
        math.max(1L, f.bytes * (f.rows - d.cardinality) / f.rows)
      case _ => f.bytes
    }
  }.sum

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept = GraftLake.overlappingResolved(
      snap.copy(files = subsetFiles), dataFilters)
    val statuses = kept.map { a =>
      // the DV descriptor rides HERE — per-file metadata, the Delta
      // shape: it flows into PartitionedFile.otherConstantMetadataColumn
      // Values and materializes as the _metadata.__dv_path constant
      // column ([[GraftParquetFileFormat]]), so each task carries only
      // its own split's descriptors and the PLAN carries none. Clean
      // files attach nothing and read the column as NULL.
      val meta: Map[String, Any] = a.dv match {
        case Some(d) =>
          Map(GraftParquetFileFormat.DvPathField -> GraftLake.absPath(dir, d.path))
        case None => Map.empty
      }
      FileStatusWithMetadata(
        new FileStatus(a.bytes, false, 1, 128L << 20, 0L,
          new Path(GraftLake.absPath(dir, a.path))),
        meta)
    }
    Seq(PartitionDirectory(InternalRow.empty, statuses))
  }
}

object LakeFileIndex {

  /** The planner-integrated relation itself — what [[readPruned]] wraps
    * and what [[GraftLakeSource]] hands the catalog, so `spark.table` /
    * `SELECT ... FROM t` plan the same pruned FileSourceScan. */
  def relation(spark: SparkSession, dir: String,
      asOf: Option[Long] = None): HadoopFsRelation =
    relationFor(spark, new LakeFileIndex(spark, dir, asOf))

  private[graft] def relationFor(spark: SparkSession,
      idx: LakeFileIndex): HadoopFsRelation =
    HadoopFsRelation(
      location = idx,
      partitionSchema = new StructType(),
      dataSchema = idx.schema,
      bucketSpec = None,
      // parquet + the _metadata.__dv_path per-file constant column —
      // identical scan behavior for DV-less tables (the column is just
      // never requested) — and the logical→physical name translation
      // for renamed id-less columns (empty map = no-op)
      fileFormat = new GraftParquetFileFormat(
        GraftLake.physicalMapOf(idx.schema)),
      options = Map("mergeSchema" -> "true"))(spark)

  /** An index over `snap` restricted to `files` (same dir/schema) — how
    * internal rewrite readers route DV'd subsets through the per-file
    * descriptor machinery instead of a plan-level map. */
  private[lake] def restricted(spark: SparkSession, snap: GraftLake.Snapshot,
      files: Seq[GraftLake.AddFile]): LakeFileIndex =
    new LakeFileIndex(spark, snap.dir, None, Some(snap.copy(files = files)), None)

  /** The two DV-split siblings of an all-files index, SHARING its pinned
    * snapshot (no reload, no race with concurrent commits). */
  private[lake] def dvSplit(spark: SparkSession,
      idx: LakeFileIndex): (LakeFileIndex, LakeFileIndex) = (
    new LakeFileIndex(spark, idx.dir, None, Some(idx.snap), Some(false)),
    new LakeFileIndex(spark, idx.dir, None, Some(idx.snap), Some(true)))

  /** The DV-correct planner-integrated frame for a snapshot with DV'd
    * files: clean scan ∪ (DV scan − deleted positions), both branches
    * file-pruned at planning time; column order = snapshot schema. */
  private[graft] def dvSplitFrame(spark: SparkSession,
      idx: LakeFileIndex): DataFrame = {
    val (cleanIdx, dvdIdx) = dvSplit(spark, idx)
    val outCols: Seq[Column] = idx.schema.fieldNames.map(col).toIndexedSeq
    val dvd = spark.baseRelationToDataFrame(relationFor(spark, dvdIdx))
      .where(!GraftLake.dvDeletedCol())
      .select(outCols: _*)
    spark.baseRelationToDataFrame(relationFor(spark, cleanIdx))
      .select(outCols: _*)
      .unionByName(dvd)
  }

  /** A DataFrame whose scan plans through [[LakeFileIndex]]: filters
    * prune files at planning time, automatically. Old files missing an
    * evolved column null-fill via mergeSchema, as in [[GraftLake.read]];
    * deletion vectors apply via the split-scan plan when present. */
  def readPruned(spark: SparkSession, dir: String,
      asOf: Option[Long] = None): DataFrame = {
    val idx = new LakeFileIndex(spark, dir, asOf)
    if (idx.hasDv) dvSplitFrame(spark, idx)
    else spark.baseRelationToDataFrame(relationFor(spark, idx))
  }
}
