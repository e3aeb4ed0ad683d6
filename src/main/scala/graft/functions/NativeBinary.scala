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
 * DECODE STUB — deterministic fake feature vector from raw media bytes.
 *
 * A real implementation decodes the blob with an image/audio codec and runs
 * an encoder; neither exists in this container, so this expression derives
 * `dim` L2-normalized floats from a positional rolling hash of the bytes.
 * It is deterministic (same blob → same vector), codegen'd, and has the
 * exact signature a real encoder expression would have — swap `compute`'s
 * body for the real decode when codecs are available. Downstream operators
 * (ANN search, near-dup, clustering) exercise the true 100 TB data path
 * either way.
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
  /** Accumulate each byte into a position-mixed bucket, then L2-normalize.
    * Shared by the column expression and the batched Dataset path so both
    * produce identical vectors.
    */
  def compute(bytes: Array[Byte], dim: Int): Array[Float] = {
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
