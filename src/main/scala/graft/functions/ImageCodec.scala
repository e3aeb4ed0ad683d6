package graft.functions

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructField, StructType}

/**
 * REAL image decode on the JDK's built-in codecs (`javax.imageio` ships
 * with every JRE and reads PNG/GIF/BMP/JPEG — no external library needed,
 * which retires the "no codecs in this container" stub assumption for
 * images; audio/video remain codec-less). Decoding is exact for lossless
 * formats, so every derived value is deterministic.
 *
 * Scale shape: the expression runs inside the scan projection (one decode
 * per blob, no shuffle of decoded pixels — only the tiny derived struct
 * leaves the operator), the JVM-global ImageIO disk cache is disabled
 * (in-memory decode; a temp-file per row would be a 100 TB disaster), and
 * failures are null, never exceptions, so one corrupt blob can't kill a
 * stage.
 */
object ImageCodec {
  ImageIOInit.ensure()

  /** Decode to a BufferedImage, or None if the bytes are not a decodable
    * image (wrong magic, truncated stream, unsupported format).
    */
  def tryDecode(bytes: Array[Byte]): Option[BufferedImage] = {
    if (bytes == null || bytes.length < 8) return None
    try Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }
  }

  /** Deterministic pixel checksum: Σ over (x,y) of
    * ((x*31 + y*17) ^ (rgb & 0xFFFFFF)) — order-independent (sum), exact
    * for lossless formats, and mirrorable from a known pixel pattern
    * without any codec (the decode-roundtrip ground truth).
    */
  def pixelChecksum(img: BufferedImage): Long = {
    var sum = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        sum += ((x * 31L + y * 17L) ^ (img.getRGB(x, y) & 0xFFFFFFL))
        x += 1
      }
      y += 1
    }
    sum
  }

  /** Grid-pooled luminance features from decoded pixels: the image is cut
    * into a ceil(√dim)² cell grid, per-cell mean luminance is zero-centered
    * against the global mean and L2-normalized — the classic tiny "visual
    * fingerprint" (aHash family). Returns None when the image is flat
    * (zero variance ⇒ zero vector would break the unit-norm contract);
    * callers fall back to the byte-hash features.
    */
  def pooledLuminanceFeatures(img: BufferedImage, dim: Int): Option[Array[Float]] = {
    val g = math.ceil(math.sqrt(dim.toDouble)).toInt
    val acc = new Array[Double](dim)
    val cnt = new Array[Long](dim)
    val w = img.getWidth
    val h = img.getHeight
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
          0.114 * (rgb & 0xFF)
        val cell = math.min(dim - 1, (y * g / h) * g + (x * g / w))
        acc(cell) += lum
        cnt(cell) += 1
        x += 1
      }
      y += 1
    }
    var total = 0.0
    var n = 0L
    var d = 0
    while (d < dim) { total += acc(d); n += cnt(d); d += 1 }
    if (n == 0) return None
    val mean = total / n
    var norm = 0.0
    d = 0
    while (d < dim) {
      acc(d) = if (cnt(d) == 0) 0.0 else acc(d) / cnt(d) - mean
      norm += acc(d) * acc(d)
      d += 1
    }
    if (norm == 0.0) return None
    val inv = 1.0 / math.sqrt(norm)
    val out = new Array[Float](dim)
    d = 0
    while (d < dim) { out(d) = (acc(d) * inv).toFloat; d += 1 }
    Some(out)
  }

  /**
   * 64-bit difference hash (dHash) of a decoded image: box-averaged
   * luminance over a 9×8 grid, bit (row·8 + col) set iff the right cell's
   * average is strictly brighter than the left's. All arithmetic is
   * integer — luminance is 299·R + 587·G + 114·B and the cell comparison is
   * cross-multiplied (sumA·cntB > sumB·cntA) instead of divided — so the
   * hash is bit-for-bit deterministic. Being a pure gradient sign pattern,
   * it is provably invariant under any uniform (unclamped) brightness
   * shift and under lossless re-encoding (PNG↔BMP↔GIF of the same
   * pixels) — the property the perceptual near-dup gate is built on.
   */
  def dHash64(img: BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val sum = Array.ofDim[Long](8, 9)
    val cnt = Array.ofDim[Long](8, 9)
    var y = 0
    while (y < h) {
      val cy = math.min(7, y * 8 / h)
      var x = 0
      while (x < w) {
        val cx = math.min(8, x * 9 / w)
        val rgb = img.getRGB(x, y)
        val lum = 299L * ((rgb >> 16) & 0xFF) + 587L * ((rgb >> 8) & 0xFF) +
          114L * (rgb & 0xFF)
        sum(cy)(cx) += lum
        cnt(cy)(cx) += 1
        x += 1
      }
      y += 1
    }
    var bits = 0L
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        // right-vs-left average compare without division (exact): empty
        // cells (tiny images) contribute 0·0 and the bit stays clear
        if (sum(cy)(cx + 1) * cnt(cy)(cx) > sum(cy)(cx) * cnt(cy)(cx + 1))
          bits |= (1L << (cy * 8 + cx))
        cx += 1
      }
      cy += 1
    }
    bits
  }

  /** Eval hook for [[ImageDHash]]: boxed hash, or null when undecodable. */
  def dHashBoxed(bytes: Array[Byte]): java.lang.Long =
    tryDecode(bytes) match {
      case Some(img) => java.lang.Long.valueOf(dHash64(img))
      case None => null
    }

  /** Eval hook for [[ImageDecodeMeta]]: (width, height, checksum) row or
    * null.
    */
  def decodeMeta(bytes: Array[Byte]): InternalRow =
    tryDecode(bytes) match {
      case Some(img) =>
        InternalRow(img.getWidth, img.getHeight, pixelChecksum(img))
      case None => null
    }

  /** Eval hook for [[ImageResizeMeta]]: decode + NEAREST-NEIGHBOR resample
    * to (outW, outH), emitting the resized raster's dimensions and the
    * same [[pixelChecksum]] formula over the resized grid. Nearest
    * neighbor with integer source mapping `sx = x·srcW / outW` is chosen
    * deliberately: it is exact integer arithmetic (no filter kernels, no
    * float rounding), so the result is mirrorable from a known pixel
    * pattern without any codec — the same ground-truth contract as
    * [[decodeMeta]]. The checksum is computed straight off the source
    * raster (no intermediate image allocation).
    */
  def resizeMeta(bytes: Array[Byte], outW: Int, outH: Int): InternalRow =
    tryDecode(bytes) match {
      case Some(img) =>
        val srcW = img.getWidth
        val srcH = img.getHeight
        var sum = 0L
        var y = 0
        while (y < outH) {
          val sy = y * srcH / outH
          var x = 0
          while (x < outW) {
            val sx = x * srcW / outW
            sum += ((x * 31L + y * 17L) ^ (img.getRGB(sx, sy) & 0xFFFFFFL))
            x += 1
          }
          y += 1
        }
        InternalRow(outW, outH, sum)
      case None => null
    }
}

/** One-time JVM-wide ImageIO configuration (no temp-file cache). */
private[functions] object ImageIOInit {
  javax.imageio.ImageIO.setUseCache(false)
  def ensure(): Unit = () // touching the object runs the initializer once
}

object NativeImageKit {
  /** Decoded image metadata: struct(width, height, px_checksum), null for
    * non-decodable blobs.
    */
  def imageDecodeMeta(c: Column): Column =
    GraftColumnBridge.column(ImageDecodeMeta(GraftColumnBridge.expression(c)))

  /** Perceptual 64-bit dHash of an image blob, null for non-decodable
    * blobs ([[ImageCodec.dHash64]]).
    */
  def imageDHash(c: Column): Column =
    GraftColumnBridge.column(ImageDHash(GraftColumnBridge.expression(c)))

  /** Nearest-neighbor resize metadata: struct(width, height, px_checksum)
    * of the resampled raster, null for non-decodable blobs.
    */
  def imageResizeMeta(c: Column, outW: Int, outH: Int): Column =
    GraftColumnBridge.column(
      ImageResizeMeta(GraftColumnBridge.expression(c), outW, outH))
}

/**
 * Catalyst expression: decode an image blob and emit the nearest-neighbor
 * resize's (width, height, pixel-checksum) — the thumbnail/normalization
 * step of a media pipeline, verified without shipping pixels (only the
 * 16-byte struct leaves the scan). Null for non-decodable input.
 */
case class ImageResizeMeta(child: Expression, outW: Int, outH: Int)
    extends UnaryExpression {
  require(outW >= 1 && outH >= 1, "resize dims must be >= 1")

  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("px_checksum", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ImageCodec.resizeMeta(input.asInstanceOf[Array[Byte]], outW, outH)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.ImageCodec.resizeMeta($c, $outW, $outH);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ImageResizeMeta =
    copy(child = newChild)
}

/**
 * Catalyst expression: decode an image blob (JDK codecs) and emit
 * (width, height, pixel-checksum). Null for non-decodable input — the
 * filter-out-corrupt-blobs shape a media pipeline needs.
 */
case class ImageDecodeMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("px_checksum", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ImageCodec.decodeMeta(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.ImageCodec.decodeMeta($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ImageDecodeMeta =
    copy(child = newChild)
}

/**
 * Catalyst expression: decode an image blob (JDK codecs) and emit its
 * 64-bit perceptual difference hash ([[ImageCodec.dHash64]]). Null for
 * non-decodable input. Runs inside the scan projection — only the 8-byte
 * hash ever leaves the operator, never decoded pixels.
 */
case class ImageDHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ImageCodec.dHashBoxed(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boxed = ctx.freshName("dhashBoxed")
    nullSafeCodeGen(ctx, ev, c =>
      s"""java.lang.Long $boxed = graft.functions.ImageCodec.dHashBoxed($c);
         |${ev.isNull} = $boxed == null;
         |${ev.value} = ${ev.isNull} ? -1L : $boxed.longValue();
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): ImageDHash =
    copy(child = newChild)
}
