package graft.sources.lake

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream, File}
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.roaringbitmap.longlong.Roaring64Bitmap

/**
 * Deletion vectors — the merge-on-read delete primitive (the design
 * Delta Lake and Iceberg v2 "position deletes" converged on): a deleted
 * row is recorded as its `_metadata.row_index` in a compressed roaring
 * bitmap SIDECAR file referenced from the AddFile action, instead of
 * rewriting the whole data file. A point delete then costs O(matched
 * rows) bitmap bytes, not O(victim file bytes) of parquet rewrite — the
 * write-amplification wall copy-on-write hits at 100 TB.
 *
 * Sidecars are immutable once referenced (a grown DV is a NEW sidecar
 * file, the old one becomes reclaimable history), so executors may cache
 * deserialized bitmaps indefinitely — [[DvCache]] below — and time
 * travel / RESTORE / the change feed get DV versioning for free from the
 * log's AddFile identity.
 */
object DeletionVector {

  def toBytes(bm: Roaring64Bitmap): Array[Byte] = {
    bm.runOptimize()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    bm.serialize(out)
    out.flush()
    bos.toByteArray
  }

  def fromBytes(bytes: Array[Byte]): Roaring64Bitmap = {
    val bm = new Roaring64Bitmap()
    bm.deserialize(new DataInputStream(new ByteArrayInputStream(bytes)))
    bm
  }

  def read(f: File): Roaring64Bitmap =
    fromBytes(java.nio.file.Files.readAllBytes(f.toPath))

  def write(f: File, bm: Roaring64Bitmap): Unit = {
    f.getParentFile.mkdirs()
    java.nio.file.Files.write(f.toPath, toBytes(bm))
    ()
  }
}

/**
 * Executor-side cache of deserialized DV bitmaps, keyed by sidecar path.
 * Sidecars are immutable once referenced, so entries never invalidate;
 * the cache is crudely bounded (clear-on-overflow) — DVs are KB-to-MB
 * compressed bitmaps, and a scan re-reads at worst once per executor
 * after a clear.
 */
private[lake] object DvCache {
  private val cache = new ConcurrentHashMap[String, Roaring64Bitmap]()
  private val MaxEntries = 4096

  def bitmapFor(path: String): Roaring64Bitmap = {
    if (path == null) return null
    val hit = cache.get(path)
    if (hit != null) return hit
    if (cache.size() > MaxEntries) cache.clear()
    cache.computeIfAbsent(path, p => DeletionVector.read(new File(p)))
  }
}

/**
 * `dv_deleted(file_name, row_index)` — true iff the row at `row_index`
 * of data file `file_name` is deleted per `dvPathByFile` (basename →
 * absolute sidecar path; files without an entry have no deletions).
 *
 * Codegen'd (rides whole-stage codegen via a reference object — no UDF,
 * no broadcast of bitmap BYTES into the plan): each task lazily reads
 * only the sidecars of the files it actually scans, through the
 * immutable executor-side [[DvCache]] — Delta's DV architecture, where
 * the plan ships descriptors and executors fetch bitmaps.
 *
 * Descriptor-map ceiling (measured, [[LakeDvMapBench]]): the map rides
 * the ONE taskBinary broadcast per stage, and its size scales with the
 * DV-CARRYING files in the scan, not total files — 10⁴ → 1.3 MB /
 * ~50 ms serialize, 10⁵ → 12.6 MB / ~250 ms, 10⁶ → 126 MB / ~2.4 s.
 * 10⁵ is comfortably inside one broadcast; 10⁶ is past the comfortable
 * ceiling, but OPTIMIZE victims every DV-carrying file, so that census
 * means a table that skipped compaction across ~10⁶ point-delete-touched
 * files — run OPTIMIZE. If a real workload ever needs sustained 10⁶
 * live vectors, the next shape is Delta's: per-file descriptors inside
 * the FileIndex rather than one plan-level map.
 */
case class DvDeleted(fileName: Expression, rowIdx: Expression,
    dvPathByFile: Map[String, String]) extends BinaryExpression {

  override def left: Expression = fileName
  override def right: Expression = rowIdx
  override def dataType: DataType = BooleanType

  def deleted(file: UTF8String, pos: Long): Boolean = {
    val bm = DvCache.bitmapFor(dvPathByFile.getOrElse(file.toString, null))
    bm != null && bm.contains(pos)
  }

  override protected def nullSafeEval(f: Any, p: Any): Any =
    deleted(f.asInstanceOf[UTF8String], p.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dvDeleted", this, classOf[DvDeleted].getName)
    defineCodeGen(ctx, ev, (f, p) => s"$ref.deleted($f, $p)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(fileName = newLeft, rowIdx = newRight)

  override def prettyName: String = "dv_deleted"
}
