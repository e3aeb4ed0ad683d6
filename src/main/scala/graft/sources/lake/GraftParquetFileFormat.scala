package graft.sources.lake

import org.apache.spark.sql.catalyst.expressions.FileSourceConstantMetadataStructField
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{StringType, StructField}

/**
 * [[ParquetFileFormat]] plus ONE extra file-constant metadata column,
 * `_metadata.__dv_path`: the absolute deletion-vector sidecar path of
 * the file being scanned, or NULL for a file with no deletions.
 *
 * This is the 100 TB-shape for DV descriptors (Delta's): the
 * basename → sidecar mapping rides the FileIndex's PER-FILE metadata
 * ([[LakeFileIndex.listFiles]] attaches it to each
 * `FileStatusWithMetadata`), flows through `PartitionedFile
 * .otherConstantMetadataColumnValues`, and materializes per scanned
 * file like `_metadata.file_name` does. A task therefore carries only
 * ITS OWN split's descriptors, and the plan carries none — versus the
 * previous plan-level map in the [[DvDeleted]] reference object, which
 * serialized the WHOLE table's descriptors into the one taskBinary
 * broadcast per stage (measured 126 MB / ~2.4 s at 10⁶ DV files,
 * [[LakeDvMapBench]]). With per-file descriptors the ceiling is gone:
 * descriptor bytes scale with files-per-task, invariant in table size.
 *
 * Everything else — footer pruning, pushed filters, vectorized read,
 * whole-stage codegen of the position predicate — is inherited
 * unchanged from the parquet format.
 */
final class GraftParquetFileFormat extends ParquetFileFormat {

  override def metadataSchemaFields: Seq[StructField] =
    super.metadataSchemaFields :+
      FileSourceConstantMetadataStructField(
        GraftParquetFileFormat.DvPathField, StringType, nullable = true)

  // ParquetFileFormat.equals treats every parquet format as equal; keep
  // this class distinct so plan canonicalization never conflates a lake
  // scan (which resolves __dv_path) with a plain parquet scan (which
  // would fail to)
  override def equals(other: Any): Boolean =
    other.isInstanceOf[GraftParquetFileFormat]
  override def hashCode(): Int = getClass.hashCode()
  override def toString: String = "GraftParquet"
}

object GraftParquetFileFormat {
  /** Name of the per-file constant metadata column carrying the DV
    * sidecar path (null ⇒ no deletions in the file). */
  val DvPathField = "__dv_path"
}
