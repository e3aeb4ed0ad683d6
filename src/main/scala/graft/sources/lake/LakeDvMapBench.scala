package graft.sources.lake

import java.io.{ByteArrayOutputStream, ObjectOutputStream}

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.execution.datasources.FileStatusWithMetadata

/**
 * Deletion-vector descriptor scaling — BOTH shapes, measured.
 *
 * r12 shape (retired): [[DvDeleted]] carried a basename → sidecar-path
 * map of EVERY DV-carrying file in the scan as a plan reference object,
 * so the whole table's descriptors rode the one taskBinary broadcast
 * per stage. Committed r12 figures for that map: 10⁴ files → 1.3 MB /
 * ~50 ms serialize; 10⁵ → 12.6 MB / ~250 ms; 10⁶ → 126 MB / ~2.4 s —
 * a real ceiling for a takedown-heavy 100 TB corpus between OPTIMIZE
 * runs.
 *
 * r13 shape (current, Delta's): descriptors ride the FileIndex's
 * PER-FILE metadata ([[LakeFileIndex.listFiles]] →
 * `FileStatusWithMetadata.metadata` → `PartitionedFile
 * .otherConstantMetadataColumnValues` → the `_metadata.__dv_path`
 * constant column of [[GraftParquetFileFormat]]). What serializes where:
 *   - the PLAN carries a constant-size [[DvDeleted]] (two metadata
 *     column refs, no map) — measured below, invariant in table size;
 *   - each TASK carries only its own split's descriptors — measured
 *     below as the serialized bytes of a 32-file slice, invariant in
 *     table size;
 *   - the DRIVER still lists O(F) files (any FileIndex does) — measured
 *     below as the per-file-metadata listing build time.
 *
 * No SparkSession: the objects under test are driver-side plan/listing
 * state and task-split payloads.
 */
object LakeDvMapBench {

  private def dvPath(i: Int): String =
    f"/warehouse/t/dv/dv-$i%06d-fedcba9876543210fedcba9876543210.bin"

  private def dataPath(i: Int): String =
    f"/warehouse/t/data/part-$i%06d-0123456789abcdef0123456789abcdef.parquet"

  private def serializedBytes(o: AnyRef): Long = {
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    oos.writeObject(o); oos.close()
    bos.size().toLong
  }

  /** (listBuildMs, listEntryBytesApprox, perTaskBytes, exprBytes) for a
    * table of `dvFiles` DV-carrying files and 32-file task splits. */
  def measure(dvFiles: Int): (Double, Long, Long, Long) = {
    // driver-side: the full per-file-metadata listing (what listFiles
    // produces) — O(F) build, like any file listing
    val t0 = System.nanoTime()
    val listing = new Array[FileStatusWithMetadata](dvFiles)
    var i = 0
    while (i < dvFiles) {
      listing(i) = FileStatusWithMetadata(
        new FileStatus(128L << 20, false, 1, 128L << 20, 0L,
          new Path(dataPath(i))),
        Map(GraftParquetFileFormat.DvPathField -> dvPath(i)))
      i += 1
    }
    val buildMs = (System.nanoTime() - t0) / 1e6

    // task-side: a 32-file split's descriptor payload (what one task
    // actually ships) — INVARIANT in dvFiles
    val slice: Array[(String, Map[String, Any])] =
      (0 until math.min(32, dvFiles)).map(j =>
        (dataPath(j), listing(j).metadata)).toArray
    val taskBytes = serializedBytes(slice)

    // plan-side: the predicate expression, now map-free — INVARIANT
    val expr = DvDeleted(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(dvPath(0))),
      org.apache.spark.sql.catalyst.expressions.Literal(0L))
    val exprBytes = serializedBytes(expr)

    val entryBytes = serializedBytes(listing(0))
    (buildMs, entryBytes, taskBytes, exprBytes)
  }

  def main(args: Array[String]): Unit = {
    measure(1000) // JIT warmup
    val rows = Seq(10000, 100000, 1000000).map { f =>
      val (b, entry, task, expr) = measure(f)
      val line = f"""{"dv_files":$f,"list_build_ms":$b%.0f,""" +
        f""""list_entry_bytes":$entry,"per_task_bytes":$task,""" +
        f""""plan_expr_bytes":$expr}"""
      println(line)
      line
    }
    println(s"""{"metric":"lake_dv_descriptor_scaling","points":[${rows.mkString(",")}]}""")
  }
}
