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

  /** PQ code assignment: `codebooks` is (subspace → code → sub-vector). */
  def pqEncode(v: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    GraftColumnBridge.column(PqEncode(GraftColumnBridge.expression(v), codebooks))

  /** Asymmetric-distance cosine between a raw query vector and a PQ code
    * array (≈ cosine(query, reconstruction)). */
  def pqAdcCosine(query: Column, codes: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    GraftColumnBridge.column(PqAdcCosine(GraftColumnBridge.expression(query),
      GraftColumnBridge.expression(codes), codebooks))

  /** Feature-hashed text embedding (hashing trick): unit-norm `dim`-vector
    * from whitespace tokens. */
  def hashEmbed(text: Column, dim: Int): Column =
    GraftColumnBridge.column(HashEmbed(GraftColumnBridge.expression(text), dim))
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

/**
 * Product-quantization code assignment: the vector is split into
 * `codebooks.length` contiguous subspaces and each sub-vector is replaced by
 * the index of its nearest (squared-L2) codebook entry — first-lowest index
 * on ties, so the assignment is deterministic given the (1e-6-rounded)
 * codebook. Output: array<int> of length M — at M=8, ksub=16 that is 8
 * small ints (packable to 4 bytes) standing in for 256 bytes of float32,
 * the compression that lets a 100 TB embedding corpus's search index live
 * in cluster memory.
 *
 * The codebook is a few KB of expression metadata (same literal-model
 * stance as the IVF coarse quantizer, ops/Similarity.scala); codegen
 * references it as a flat double[] via `addReferenceObj`, keeping the
 * per-row work a tight primitive loop inside whole-stage codegen.
 */
case class PqEncode(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val flat: Array[Double] = PqOps.flatten(codebooks)
  private def m: Int = codebooks.length
  private def k: Int = codebooks.head.length
  private def sub: Int = codebooks.head.head.length

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    PqOps.encode(input.asInstanceOf[ArrayData], flat, m, k, sub, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqFlatCodebook", flat, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqOps.encode($c, $cb, $m, $k, $sub, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/**
 * Asymmetric distance computation (ADC) as a cosine: cosine(query,
 * reconstruction(codes)) evaluated WITHOUT materializing the reconstructed
 * array — dot and reconstruction norm accumulate per subspace straight off
 * the flat codebook. This is the scan-side scorer of [[graft.ops.Similarity.ivfPqTopK]]:
 * the probe join touches only (id, cell, codes), never the raw vectors.
 */
case class PqAdcCosine(left: Expression, right: Expression,
    codebooks: Seq[Seq[Seq[Double]]]) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  @transient private lazy val flat: Array[Double] = PqOps.flatten(codebooks)
  private def k: Int = codebooks.head.length
  private def sub: Int = codebooks.head.head.length

  private def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(q: Any, codes: Any): Any =
    PqOps.adcCosine(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData],
      flat, k, sub, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqFlatCodebook", flat, "double[]")
    nullSafeCodeGen(ctx, ev, (q, c) =>
      s"${ev.value} = graft.functions.PqOps.adcCosine($q, $c, $cb, $k, $sub, $isFloat);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdcCosine =
    copy(left = newLeft, right = newRight)
}

object PqOps {
  /** (subspace → code → sub-vector) → flat row-major double[] (m·k·sub). */
  def flatten(codebooks: Seq[Seq[Seq[Double]]]): Array[Double] = {
    val m = codebooks.length
    val k = codebooks.head.length
    val sub = codebooks.head.head.length
    require(codebooks.forall(cb => cb.length == k && cb.forall(_.length == sub)),
      "ragged PQ codebook")
    val out = new Array[Double](m * k * sub)
    var i = 0
    for (cb <- codebooks; entry <- cb; x <- entry) { out(i) = x; i += 1 }
    out
  }

  def encode(v: ArrayData, flat: Array[Double], m: Int, k: Int, sub: Int,
      isFloat: Boolean): ArrayData = {
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < k) {
        var d = 0.0
        var i = 0
        val base = (s * k + j) * sub
        val voff = s * sub
        while (i < sub) {
          val x = if (isFloat) v.getFloat(voff + i).toDouble else v.getDouble(voff + i)
          val diff = x - flat(base + i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = j } // strict < keeps first-lowest tie
        j += 1
      }
      codes(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  def adcCosine(q: ArrayData, codes: ArrayData, flat: Array[Double],
      k: Int, sub: Int, isFloat: Boolean): Double = {
    val m = codes.numElements()
    var dot = 0.0
    var nr = 0.0
    var nq = 0.0
    var s = 0
    while (s < m) {
      val base = (s * k + codes.getInt(s)) * sub
      val voff = s * sub
      var i = 0
      while (i < sub) {
        val x = if (isFloat) q.getFloat(voff + i).toDouble else q.getDouble(voff + i)
        val c = flat(base + i)
        dot += x * c
        nq += x * x
        nr += c * c
        i += 1
      }
      s += 1
    }
    if (nq == 0.0 || nr == 0.0) 0.0
    else dot / (math.sqrt(nq) * math.sqrt(nr))
  }
}

/**
 * Feature-hashed text embedding (Weinberger et al. 2009, "Feature Hashing
 * for Large Scale Multitask Learning"): each whitespace token hashes to a
 * dimension index (and a sign bit, keeping the estimator unbiased), the
 * signed counts accumulate, and the vector is L2-normalized. Deterministic,
 * model-free, and computed in one pass inside codegen — the embedding that
 * unlocks the engine's ENTIRE vector stack (RHP-LSH near-dup, SemDeDup
 * clustering, IVF/IVF-PQ ANN) on corpora that ship no embedding column: at
 * 100 TB it rides the same text scan as the sketches, no model service in
 * the loop. Token hash = the splitmix64-finalized FNV used across the text
 * kit; empty/whitespace-only text → the zero vector (callers treat it as
 * cosine 0 to everything, matching [[CosineSim]]'s zero-norm contract).
 */
case class HashEmbed(child: Expression, dim: Int) extends UnaryExpression {
  require(dim >= 2, "dim must be at least 2")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    HashEmbedOps.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashEmbedOps.compute($c.toString(), $dim);")

  override protected def withNewChildInternal(newChild: Expression): HashEmbed =
    copy(child = newChild)
}

object HashEmbedOps {
  private def mix64(x0: Long): Long = {
    var z = x0 * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def compute(s: String, dim: Int): ArrayData = {
    val acc = new Array[Double](dim)
    val n = s.length
    var i = 0
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      if (i < n) {
        var h = 0xcbf29ce484222325L // FNV offset basis
        while (i < n && !Character.isWhitespace(s.charAt(i))) {
          h = (h ^ s.charAt(i)) * 0x100000001B3L
          i += 1
        }
        val m = mix64(h)
        // low bits pick the dimension, bit 63 the sign (independent bits)
        val idx = ((m & Long.MaxValue) % dim).toInt
        acc(idx) += (if (m < 0) -1.0 else 1.0)
      }
    }
    var norm = 0.0
    var d = 0
    while (d < dim) { norm += acc(d) * acc(d); d += 1 }
    if (norm > 0.0) {
      val inv = 1.0 / math.sqrt(norm)
      d = 0
      while (d < dim) { acc(d) *= inv; d += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(acc)
  }
}
