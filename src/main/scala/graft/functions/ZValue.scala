package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Column surface for the N-dimensional Morton (Z-order) kit. */
object ZValueKit {

  /** N-column Morton interleave: bit i of column j lands at result bit
    * i·n + j. `bits` low bits of each (long-cast) column are used;
    * default packs as many as fit a 63-bit non-negative long, capped at
    * 16 per column (n=2 → 16, n=3 → 16, n=4 → 15 …). Inputs must be
    * non-negative small-domain keys — bucket first (see
    * [[quantileBucket]]) when the domain is large or skewed. */
  def zValueN(cols: Seq[Column], bits: Int = 0): Column = {
    require(cols.size >= 2, "zValueN needs at least two columns")
    val b = if (bits > 0) bits else math.min(16, 63 / cols.size)
    GraftColumnBridge.column(ZValueN(
      cols.map(c => GraftColumnBridge.expression(c.cast("long"))), b))
  }

  /** Quantile-bucket id of `c` against precomputed ascending `boundaries`
    * (binary search; id = number of boundaries ≤ value, so k boundaries
    * yield ids 0..k). With boundaries at the 1/k..(k−1)/k quantiles the
    * ids are near-uniform REGARDLESS of the column's distribution — the
    * range-partition-id trick Delta's OPTIMIZE ZORDER uses, which is what
    * keeps interleaving meaningful on skewed or large-domain columns. */
  def quantileBucket(c: Column, boundaries: Seq[Double]): Column =
    GraftColumnBridge.column(QuantileBucket(
      GraftColumnBridge.expression(c.cast("double")), boundaries.toArray))

  /** Monotone numeric proxy of a string's binary collation — see
    * [[Utf8PrefixLong]]. What lets string cluster columns range-bucket
    * through the same quantile machinery as numerics. */
  def utf8PrefixLong(c: Column): Column =
    GraftColumnBridge.column(Utf8PrefixLong(GraftColumnBridge.expression(c)))
}

/**
 * N-ary Morton interleave as a native expression: the 2-D magic-number
 * chain ([[graft.sources.Layout.zValue2]], bit-pinned by the `x_zorder`
 * oracle gate) does not generalize to n dimensions, and the Column-tree
 * formulation is n·bits bitwise nodes re-inlined by CollapseProject; here
 * it is one static call per child in generated code, loop in the JVM.
 */
case class ZValueN(inputs: Seq[Expression], bits: Int) extends Expression {
  require(inputs.size >= 2 && inputs.size <= 8, "2..8 columns")
  require(bits >= 1 && bits * inputs.size <= 63,
    s"bits*cols must fit a non-negative long: $bits*${inputs.size}")

  override def children: Seq[Expression] = inputs
  override def dataType: DataType = LongType
  override def nullable: Boolean = inputs.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (inputs.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zvalue_n needs BIGINT inputs, got ${inputs.map(_.dataType)}")

  override def eval(input: InternalRow): Any = {
    val n = inputs.size
    var z = 0L
    var j = 0
    while (j < n) {
      val v = inputs(j).eval(input)
      if (v == null) return null
      z |= ZValueN.spread(v.asInstanceOf[Long], n, bits) << j
      j += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = inputs.size
    val evs = inputs.map(_.genCode(ctx))
    val body = evs.zipWithIndex.map { case (e, j) =>
      s"""
         |if (!${ev.isNull}) {
         |  ${e.code}
         |  if (${e.isNull}) { ${ev.isNull} = true; }
         |  else { ${ev.value} |= graft.functions.ZValueN.spread(${e.value}, $n, $bits) << $j; }
         |}""".stripMargin
    }.mkString("\n")
    ev.copy(code =
      code"""
        boolean ${ev.isNull} = false;
        long ${ev.value} = 0L;
        $body""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZValueN = copy(inputs = newChildren)
}

object ZValueN {
  /** Bit i of (v & mask(bits)) moved to bit i·n; the per-column half of
    * the interleave (column j then shifts the whole spread left by j). */
  def spread(v: Long, n: Int, bits: Int): Long = {
    val masked = v & ((1L << bits) - 1)
    var r = 0L
    var i = 0
    while (i < bits) {
      r |= ((masked >>> i) & 1L) << (i * n)
      i += 1
    }
    r
  }
}

/** Binary search of a double value into ascending `boundaries`: returns
  * the count of boundaries ≤ value as a long (0..k). NaN sorts above
  * every boundary (bucket k) so no row is lost to a layout helper. */
case class QuantileBucket(child: Expression, boundaries: Array[Double])
    extends UnaryExpression {
  require(boundaries.nonEmpty, "need at least one boundary")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quantile_bucket needs DOUBLE input, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    QuantileBucket.bucket(v.asInstanceOf[Double], boundaries)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.addReferenceObj("boundaries", boundaries, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.QuantileBucket.bucket($v, $arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): QuantileBucket =
    copy(child = newChild)

  // Array[Double] is identity-compared by the default case-class equals;
  // compare contents so canonicalization/dedup of identical buckets works
  override def equals(o: Any): Boolean = o match {
    case q: QuantileBucket =>
      q.child == child && java.util.Arrays.equals(q.boundaries, boundaries)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(boundaries)
}

object QuantileBucket {
  def bucket(v: Double, boundaries: Array[Double]): Long = {
    if (v.isNaN) return boundaries.length.toLong
    var lo = 0
    var hi = boundaries.length // invariant: boundaries[<lo] <= v < boundaries[>=hi]
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (boundaries(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }
}

/**
 * The first 6 UTF-8 bytes of a string as a big-endian long — a MONOTONE
 * numeric proxy for the string's binary (parquet footer min/max)
 * collation: s1 <= s2 implies prefixLong(s1) <= prefixLong(s2), ties
 * allowed where prefixes agree. 6 bytes keep the value exact in a
 * DOUBLE (48 bits < 53), so string cluster columns ride the SAME
 * approxQuantile + [[QuantileBucket]] machinery as numerics — which is
 * what lets `clusterBy` on a string date/host column produce a layout
 * whose per-file string envelopes are tight and RANGE predicates prune
 * files (a hashed id can only prune equality). Shorter strings pad with
 * zero bytes (below every extension — matches binary order).
 */
case class Utf8PrefixLong(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"utf8_prefix_long needs STRING input, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    Utf8PrefixLong.prefix(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.Utf8PrefixLong.prefix($v);")

  override protected def withNewChildInternal(newChild: Expression): Utf8PrefixLong =
    copy(child = newChild)

  override def prettyName: String = "utf8_prefix_long"
}

object Utf8PrefixLong {
  def prefix(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val b = s.getBytes
    val n = math.min(6, b.length)
    var r = 0L
    var i = 0
    while (i < n) { r = (r << 8) | (b(i) & 0xffL); i += 1 }
    r << (8 * (6 - n)) // zero-pad: shorter sorts below every extension
  }
}
