package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Column surface for the Hilbert index. */
object HilbertKit {
  /** Hilbert d-index of a 2-D point; coordinates are masked to the low
    * `order` bits. */
  def hilbert2(x: Column, y: Column, order: Int = 16): Column =
    GraftColumnBridge.column(HilbertIndex2(
      GraftColumnBridge.expression(x), GraftColumnBridge.expression(y), order))
}

/**
 * 2-D Hilbert curve index (order-`order`, so coordinates in [0, 2^order)):
 * the locality-clustering value behind "liquid"/Hilbert table layouts.
 * Z-order ([[graft.sources.Layout.zValue2]]) has quadrant seams — adjacent
 * Z values can be far apart in space; the Hilbert walk is CONTINUOUS
 * (consecutive d-values are Manhattan-distance-1 cells, spec-enforced), so
 * range reads touch tighter spatial envelopes, which is what makes min/max
 * file skipping on TWO filter columns strictest.
 *
 * A native expression rather than a Column chain deliberately: the
 * standard xy2d loop rotates (x, y) each round, so each round references
 * the previous round's columns several times — as a Column tree (after
 * CollapseProject re-inlining) that is 4^order nodes; as generated code it
 * is a 16-iteration loop.
 */
case class HilbertIndex2(left: Expression, right: Expression, order: Int)
    extends BinaryExpression {
  require(order >= 1 && order <= 31, "order must be in [1, 31]")

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hilbert2 needs (BIGINT, BIGINT), got (${left.dataType}, ${right.dataType})")

  override def nullSafeEval(l: Any, r: Any): Any =
    HilbertIndex2.compute(l.asInstanceOf[Long], r.asInstanceOf[Long], order)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.HilbertIndex2.compute($l, $r, $order);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HilbertIndex2 = copy(left = newLeft, right = newRight)
}

object HilbertIndex2 {
  /** Standard xy2d walk (Hamilton's algorithm): top-down quadrant
    * accumulation with the reflect/swap rotation. Coordinates masked to
    * the low `order` bits. */
  def compute(x0: Long, y0: Long, order: Int): Long = {
    val mask = (1L << order) - 1
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
