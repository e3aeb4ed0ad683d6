package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native fuzzy string-similarity expressions for entity resolution. Spark
 * ships only `levenshtein`; record linkage between dirty metadata and a
 * clean master additionally needs Jaro-Winkler (the standard name-matching
 * score — transposition-tolerant, prefix-weighted) and true
 * Damerau-Levenshtein (a swapped-character typo costs 1, not the 2 plain
 * Levenshtein charges). Both are codegen'd static calls like the rest of
 * the native kit — at 100 TB candidate volume the scorer sits inside the
 * verify join's codegen stage, never a UDF.
 *
 * Cross-engine parity: both functions are fuzz-verified against DuckDB's
 * `jaro_winkler_similarity` / `damerau_levenshtein` (20k random pairs each,
 * exact match — see `NativeFuzzySpec`): Jaro uses the greedy
 * left-to-right match within window `max(|s|,|t|)/2 - 1`, floor-halved
 * transposition count, and 0.0 for ANY empty side (including both empty —
 * the DuckDB convention); Winkler boosts only when jaro > 0.7, prefix
 * capped at 4, scale 0.1. Damerau is the unrestricted Lowrance-Wagner
 * distance (last-occurrence matrix), not the cheaper OSA restriction —
 * DuckDB's choice, and the one that is an actual metric.
 */
object NativeFuzzyKit {
  def jaroWinkler(l: Column, r: Column): Column =
    GraftColumnBridge.column(JaroWinkler(
      GraftColumnBridge.expression(l), GraftColumnBridge.expression(r)))

  def damerauLevenshtein(l: Column, r: Column): Column =
    GraftColumnBridge.column(DamerauLevenshtein(
      GraftColumnBridge.expression(l), GraftColumnBridge.expression(r)))
}

/** Jaro-Winkler similarity in [0, 1] (DuckDB-parity semantics). */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any =
    FuzzyOps.jaroWinkler(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.FuzzyOps.jaroWinkler($l, $r);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

/** Unrestricted Damerau-Levenshtein distance (DuckDB-parity semantics). */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(l: Any, r: Any): Any =
    FuzzyOps.damerauLevenshtein(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.FuzzyOps.damerauLevenshtein($l, $r);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object FuzzyOps {

  /** Jaro similarity with the DuckDB/RapidFuzz conventions: empty side →
    * 0.0, window = max/2 - 1 (≥ 0), greedy first-unmatched match,
    * transpositions = floor(mismatched-matched-positions / 2).
    */
  def jaro(a: UTF8String, b: UTF8String): Double = {
    val s = a.toString
    val t = b.toString
    val la = s.length
    val lb = t.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val ms = new Array[Boolean](la)
    val mt = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!mt(j) && s.charAt(i) == t.charAt(j)) {
          mt(j) = true
          ms(i) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // mismatches between the matched subsequences, in original order
    var mism = 0
    var si = 0
    var tj = 0
    var c = 0
    while (c < m) {
      while (!ms(si)) si += 1
      while (!mt(tj)) tj += 1
      if (s.charAt(si) != t.charAt(tj)) mism += 1
      si += 1
      tj += 1
      c += 1
    }
    val tr = mism / 2
    (m.toDouble / la + m.toDouble / lb + (m - tr).toDouble / m) / 3.0
  }

  /** Winkler boost: applied only when jaro > 0.7; common prefix capped at
    * 4; scale 0.1. */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) return j
    val s = a.toString
    val t = b.toString
    val lim = math.min(4, math.min(s.length, t.length))
    var p = 0
    while (p < lim && s.charAt(p) == t.charAt(p)) p += 1
    j + p * 0.1 * (1.0 - j)
  }

  /** Unrestricted Damerau-Levenshtein (Lowrance-Wagner): transposed
    * substrings can be edited between the swap. O(|s|·|t|) time and space —
    * for the short strings (names, titles, codes) edit distance is for.
    */
  def damerauLevenshtein(a: UTF8String, b: UTF8String): Int = {
    val s = a.toString
    val t = b.toString
    val la = s.length
    val lb = t.length
    if (la == 0) return lb
    if (lb == 0) return la
    val maxd = la + lb
    val da = new java.util.HashMap[Character, Integer]()
    val d = Array.ofDim[Int](la + 2, lb + 2)
    d(0)(0) = maxd
    var i = 0
    while (i <= la) { d(i + 1)(0) = maxd; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= lb) { d(0)(j + 1) = maxd; d(1)(j + 1) = j; j += 1 }
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val k: Int = { val v = da.get(t.charAt(j - 1)); if (v == null) 0 else v }
        val l = db
        val cost = if (s.charAt(i - 1) == t.charAt(j - 1)) { db = j; 0 } else 1
        var best = d(i)(j) + cost
        if (d(i + 1)(j) + 1 < best) best = d(i + 1)(j) + 1
        if (d(i)(j + 1) + 1 < best) best = d(i)(j + 1) + 1
        val transp = d(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        if (transp < best) best = transp
        d(i + 1)(j + 1) = best
        j += 1
      }
      da.put(s.charAt(i - 1), i)
      i += 1
    }
    d(la + 1)(lb + 1)
  }
}
