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
 * `dv_deleted(dv_path, row_index)` — true iff the row at `row_index`
 * of the file whose DV sidecar lives at `dv_path` is deleted; false
 * when `dv_path` is NULL (a clean file). `dv_path` is the per-file
 * constant metadata column [[GraftParquetFileFormat.DvPathField]], so
 * the descriptor travels INSIDE the FileIndex's per-file metadata
 * (Delta's shape): a task's closure carries only its own split's
 * sidecar paths and the plan carries none — this expression is now a
 * CONSTANT-size reference object, whatever the table's DV census.
 * Measured ([[LakeDvMapBench]], r13): plan expression 892 B and
 * per-32-file-task payload 5.1 KB, both INVARIANT from 10⁴ to 10⁶ DV
 * files; the r12 plan-level map at the same census was 1.3 MB → 126 MB
 * (2.4 s to serialize) — that ceiling is retired. The driver's O(F)
 * listing build (0.1 s → 3.2 s over the same range) is the cost any
 * FileIndex pays to list F files, not a DV overhead.
 *
 * Codegen'd (rides whole-stage codegen — no UDF, no bitmap BYTES in
 * the plan): each task lazily reads only the sidecars of the files it
 * actually scans, through the immutable executor-side [[DvCache]].
 *
 * Null semantics: a NULL sidecar path means "no deletions", so this
 * expression is NEVER null — it answers false, not null, exactly so
 * `!dv_deleted(...)` keeps clean-file rows instead of dropping them
 * through three-valued logic.
 */
case class DvDeleted(dvPath: Expression, rowIdx: Expression)
    extends BinaryExpression {

  override def left: Expression = dvPath
  override def right: Expression = rowIdx
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  def deleted(path: UTF8String, pos: Long): Boolean = {
    if (path == null) return false
    val bm = DvCache.bitmapFor(path.toString)
    bm != null && bm.contains(pos)
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val p = rowIdx.eval(input)
    if (p == null) false
    else deleted(dvPath.eval(input).asInstanceOf[UTF8String],
      p.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val ref = ctx.addReferenceObj("dvDeleted", this, classOf[DvDeleted].getName)
    val pathGen = dvPath.genCode(ctx)
    val posGen = rowIdx.genCode(ctx)
    ev.copy(code =
      code"""
            |${pathGen.code}
            |${posGen.code}
            |boolean ${ev.value} = false;
            |if (!${posGen.isNull}) {
            |  ${ev.value} = $ref.deleted(
            |    ${pathGen.isNull} ? null : ${pathGen.value}, ${posGen.value});
            |}
          """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(dvPath = newLeft, rowIdx = newRight)

  override def prettyName: String = "dv_deleted"
}
