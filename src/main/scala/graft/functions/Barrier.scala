package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.types.DataType

object BarrierKit {
  /** Pushdown-opaque identity wrapper; see [[OpaqueValue]]. */
  def opaque(c: Column): Column =
    GraftColumnBridge.column(OpaqueValue(GraftColumnBridge.expression(c)))
}

/**
 * Identity wrapper the optimizer must treat as opaque — evaluates exactly
 * its child (same value, same codegen: the wrapper vanishes from the
 * generated Java), but is flagged `Nondeterministic`, so a
 * `filter(opaque(expensive >= θ))` cannot be pushed through joins,
 * aggregates, or projects. Why this shape:
 *
 *  - `rand() >= 0` (the classic trick): Spark 4's range simplification
 *    proves rand ∈ [0,1) and folds the whole comparison away.
 *  - a nondeterministic SIBLING conjunct (`nonDetTrue && expensive`):
 *    Spark 4's predicate pushdown splits conjunctions with
 *    `partition(_.deterministic)` — not the old order-preserving `span` —
 *    so the deterministic conjunct pushes anyway.
 *
 * Wrapping the predicate itself is the remaining (and precise) barrier:
 * the expensive pair-verify (Jaccard/cosine) evaluates once per surviving
 * row in the codegen'd post-join/post-distinct stage, instead of
 * interpreted inside a join condition before dedup.
 */
case class OpaqueValue(child: Expression) extends UnaryExpression with Nondeterministic {

  override def nullable: Boolean = child.nullable
  override def dataType: DataType = child.dataType

  override protected def initializeInternal(partitionIndex: Int): Unit = ()
  override protected def evalInternal(input: InternalRow): Any = child.eval(input)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.genCode(ctx)

  override protected def withNewChildInternal(newChild: Expression): OpaqueValue =
    copy(child = newChild)
}
