package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native vector expressions. Same rationale as [[NativeTextKit]]: the HOF
 * formulations (zip_with + three aggregates per cosine; 8 aggregates × 64
 * literal coefficients per LSH bucket) exceed codegen limits and run
 * interpreted — measured ~30 µs/pair vs ~0.1 µs/pair for the tight loop.
 * An all-pairs cosine pass at 2M pairs is 56 s interpreted, ~2 s native.
 *
 * Float-math parity: accumulation is sequential in index order, in double,
 * and the final form is dot/(√na·√nb) — the exact op order of the DuckDB
 * oracle SQL, so micro-quantized outputs hash-match.
 */
object NativeVectorKit {
  def cosine(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSim(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def rhpBucket(v: Column, nBits: Int, table: Int = 0): Column =
    GraftColumnBridge.column(RhpBucket(GraftColumnBridge.expression(v), nBits, table))
}

/** Cosine similarity of two numeric arrays (double accumulation, index
  * order); 0.0 when either norm is zero; null if either side is null.
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    CosineSim.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.CosineSim.compute($l, $r, ${isFloat(left)}, ${isFloat(right)});")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  def compute(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/**
 * Random-hyperplane LSH bucket: sign bits of `nBits` deterministic ±1
 * hyperplanes (splitmix64-derived from (table, bit, dim index)), packed into
 * a long. Stable across runs and engines with no stored model; same plane
 * family as the HOF version in [[VectorKit.rhpBucket]]. `table` selects an
 * independent hyperplane family for multi-table (OR-amplified) LSH; table 0
 * is the original single-table family.
 */
case class RhpBucket(child: Expression, nBits: Int, table: Int = 0) extends UnaryExpression {

  override def dataType: DataType = LongType

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    RhpBucket.compute(input.asInstanceOf[ArrayData], nBits, table, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RhpBucket.compute($c, $nBits, $table, $isFloat);")

  override protected def withNewChildInternal(newChild: Expression): RhpBucket =
    copy(child = newChild)
}

object RhpBucket {
  private def mix64(x: Long): Long = {
    var z = x * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** plane(t, b, i) ∈ {-1, +1}, derived from mix64((t*1000003 + b)*dim + i);
    * t = 0 reduces to the original mix64(b*dim + i) family.
    */
  def planeCoef(t: Int, b: Int, i: Int, dim: Int): Double =
    if (mix64((t.toLong * 1000003L + b) * dim + i) >= 0) 1.0 else -1.0

  def compute(v: ArrayData, nBits: Int, table: Int, isFloat: Boolean): Long = {
    val dim = v.numElements()
    var out = 0L
    var b = 0
    while (b < nBits) {
      var proj = 0.0
      var i = 0
      while (i < dim) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        proj += x * planeCoef(table, b, i, dim)
        i += 1
      }
      if (proj >= 0.0) out |= (1L << b)
      b += 1
    }
    out
  }
}
