package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

object NativeBinaryKit {
  def binaryFeatures(c: Column, dim: Int): Column =
    GraftColumnBridge.column(
      BinaryFeatures(GraftColumnBridge.expression(c), dim))
}

/**
 * Feature vector from raw media bytes — REAL decode where the JDK can:
 * images (PNG/GIF/BMP/JPEG via `javax.imageio`, [[ImageCodec]]) yield
 * grid-pooled zero-centered luminance features (the aHash family); PCM
 * audio (WAV/AU/AIFF via `javax.sound.sampled`, [[AudioCodec]]) yields
 * windowed-energy features. Remaining blobs — video and compressed audio,
 * genuinely codec-less in the JDK — and undecodable bytes fall back to a
 * deterministic byte-hash vector with the same dim/unit-norm contract, so
 * the column keeps total coverage. Every path is deterministic (same blob
 * → same vector), runs inside the scan projection, and never shuffles
 * decoded payload.
 */
case class BinaryFeatures(child: Expression, dim: Int) extends UnaryExpression {
  require(dim > 0, "dim must be positive")

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      BinaryFeatures.compute(input.asInstanceOf[Array[Byte]], dim))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.BinaryFeatures.compute($c, $dim));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): BinaryFeatures =
    copy(child = newChild)
}

object BinaryFeatures {
  /** Real-decode-first feature extraction; byte-hash fallback for
    * non-image/undecodable blobs (and flat images, whose pooled vector
    * would be zero and break the unit-norm contract). Shared by the column
    * expression and the batched Dataset path so both produce identical
    * vectors.
    */
  def compute(bytes: Array[Byte], dim: Int): Array[Float] =
    ImageCodec.tryDecode(bytes)
      .flatMap(img => ImageCodec.pooledLuminanceFeatures(img, dim))
      .orElse(AudioCodec.tryDecodePcm(bytes)
        .flatMap { case (_, pcm) => AudioCodec.windowedEnergyFeatures(pcm, dim) })
      .getOrElse(byteHashFeatures(bytes, dim))

  /** Deterministic byte-hash fallback: accumulate each byte into a
    * position-mixed bucket, then L2-normalize.
    */
  def byteHashFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Double](dim)
    var i = 0
    while (i < bytes.length) {
      var h = (i.toLong << 8) ^ (bytes(i) & 0xFFL)
      h *= 0x9E3779B97F4A7C15L
      h ^= h >>> 29
      val bucket = ((h >>> 1) % dim).toInt
      // signed contribution keeps the vector zero-centered
      acc(bucket) += (if ((h & 1L) == 0L) 1.0 else -1.0)
      i += 1
    }
    var norm = 0.0
    var d = 0
    while (d < dim) { norm += acc(d) * acc(d); d += 1 }
    val inv = if (norm == 0.0) 0.0 else 1.0 / math.sqrt(norm)
    val out = new Array[Float](dim)
    d = 0
    while (d < dim) { out(d) = (acc(d) * inv).toFloat; d += 1 }
    out
  }
}
