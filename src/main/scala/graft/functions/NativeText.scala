package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native single-pass text-sketch expressions. The composed higher-order-
 * function versions of MinHash/SimHash (128 `array_min(transform(...))` /
 * 64 `aggregate(...)` in one projection) blow past whole-stage-codegen's
 * method-size limits and fall back to interpreted eval — measured ~30 ms/row.
 * These expressions compute the identical sketch shapes in one tight loop
 * (~50 µs/row), and their codegen emits a single static call so they stay
 * inside the codegen'd pipeline. At 100 TB the sketch pass is a full-corpus
 * scan; this is the difference between hours and weeks.
 *
 * Hash parity note: only the *sketch-internal* hash changes vs the HOF
 * versions; every emitted near-dup pair is still verified by exact n-gram
 * Jaccard downstream, so operator semantics are unchanged.
 */
object NativeTextKit {
  def minhashSig(c: Column, numHashes: Int, shingleLen: Int,
      oph: Boolean = false): Column =
    GraftColumnBridge.column(
      MinHashSig(GraftColumnBridge.expression(c), numHashes, shingleLen, oph))

  /** LSH band-bucket hashes straight from the text — one sketch pass, one
    * long per band. Use this (not 32 × `hash(slice(minhashSig(...)))`):
    * Catalyst's project collapsing inlines the signature into every
    * band-hash expression, recomputing the full sketch per band.
    */
  def minhashBands(c: Column, numHashes: Int, shingleLen: Int, bands: Int,
      oph: Boolean = false): Column =
    GraftColumnBridge.column(
      MinHashBands(GraftColumnBridge.expression(c), numHashes, shingleLen, bands, oph))

  def simhash64(c: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(c)))

  /** BPE-encode a single word with a trained merge table (rank order). */
  def bpeEncodeWord(c: Column, merges: Seq[(String, String)]): Column =
    GraftColumnBridge.column(BpeEncodeWord(GraftColumnBridge.expression(c), merges))

  /** Canonical text normalization: Unicode NFC + whitespace collapse + trim,
    * optional ROOT-locale casefold. */
  def normalizeText(c: Column, casefold: Boolean = false): Column =
    GraftColumnBridge.column(NormalizeText(GraftColumnBridge.expression(c), casefold))
}

/**
 * Canonical text normalization — the preprocessing step in front of every
 * hash-keyed dedup/split/sampling operator: Unicode NFC (composed form, so
 * "e + combining acute" and "é" hash identically), whitespace runs
 * collapsed to single spaces, ends trimmed, and optionally a ROOT-locale
 * casefold. Spark ships no Unicode-normalization function; this is a
 * codegen'd static call (`java.text.Normalizer` + a compiled regex), NOT a
 * UDF — at 100 TB it rides inside the scan's codegen stage like the rest
 * of the text kit. Casefold is OFF in the gated query (engine lowercase
 * tables differ across locales/ICU versions; the NFC + whitespace contract
 * is the cross-engine-stable core).
 */
case class NormalizeText(child: Expression, casefold: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StringType

  override def nullSafeEval(input: Any): Any =
    NormalizeOps.normalize(input.asInstanceOf[UTF8String].toString, casefold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeOps.normalize($c.toString(), $casefold);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeOps {
  private val ws = java.util.regex.Pattern.compile("\\s+")

  def normalize(s: String, casefold: Boolean): UTF8String = {
    var n = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    if (casefold) n = n.toLowerCase(java.util.Locale.ROOT)
    // collapse BEFORE trim: after collapse every edge run is a single
    // ASCII space, which Java trim and SQL trim strip identically (Java
    // trim alone also eats \n/\t that SQL trim would keep)
    n = ws.matcher(n).replaceAll(" ")
    n = n.trim
    UTF8String.fromString(n)
  }
}

/**
 * BPE word encoder: splits the word into code-POINT symbols (Java's
 * zero-width regex split — what `split(w, "")` compiles to — advances by
 * code point, so both sides of the gated equivalence see identical initial
 * symbolization, surrogate pairs included) and applies each merge
 * of a TRAINED table in rank order as one left-to-right non-overlapping
 * pass — exactly [[graft.ops.Corpus.bpeMergePass]]'s fold semantics, so
 * the declarative and native paths are symbol-for-symbol interchangeable
 * (the `t_bpe_train` gate asserts it). The merge table rides along as flat
 * expression metadata (`addReferenceObj`) like the PQ codebooks: a trained
 * tokenizer is a model of a few hundred KB, shipped once per executor, and
 * the per-row work is a tight loop inside whole-stage codegen — this is
 * the encoder a 100 TB token-counting or packing pass runs inside the scan.
 */
case class BpeEncodeWord(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  @transient private lazy val flat: Array[String] =
    merges.flatMap(m => Seq(m._1, m._2)).toArray

  override def nullSafeEval(input: Any): Any =
    BpeOps.encodeWord(input.asInstanceOf[UTF8String].toString, flat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("bpeMerges", flat, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeOps.encodeWord($c.toString(), $tbl);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeWord =
    copy(child = newChild)
}

object BpeOps {
  /** Rank-ordered merge passes over the word's code-unit symbols; each pass
    * is greedy leftmost non-overlapping ("aaaa" + (a,a) → [aa, aa]). */
  def encodeWord(word: String, flat: Array[String]): ArrayData = {
    var syms = new Array[String](word.codePointCount(0, word.length))
    var i = 0
    var off = 0
    while (off < word.length) {
      val cp = word.codePointAt(off)
      syms(i) = new String(Character.toChars(cp))
      off += Character.charCount(cp)
      i += 1
    }
    var m = 0
    while (m < flat.length && syms.length > 1) {
      val l = flat(m); val r = flat(m + 1)
      val out = new Array[String](syms.length)
      var n = 0
      var j = 0
      while (j < syms.length) {
        if (n > 0 && out(n - 1).equals(l) && syms(j).equals(r)) {
          out(n - 1) = l + r
        } else {
          out(n) = syms(j); n += 1
        }
        j += 1
      }
      syms = java.util.Arrays.copyOf(out, n)
      m += 2
    }
    val res = new Array[Any](syms.length)
    var k = 0
    while (k < syms.length) { res(k) = UTF8String.fromString(syms(k)); k += 1 }
    new GenericArrayData(res)
  }
}

/**
 * MinHash signature over character `shingleLen`-grams in one pass.
 * `sig[i] = min over shingles s of (a_i * x31(s) + b_i) mod 2^31-1` where
 * `x31(s)` is a 64-bit polynomial hash of the shingle folded to 31 bits.
 * Shingles are NOT deduplicated: min over a multiset equals min over its
 * set, so the dedup would be pure overhead.
 */
case class MinHashSig(child: Expression, numHashes: Int, shingleLen: Int,
    oph: Boolean = false) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(MinHashSig.dispatch(
      input.asInstanceOf[UTF8String].toString, numHashes, shingleLen, oph))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.MinHashSig.dispatch($c.toString(), $numHashes, $shingleLen, $oph));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  private val M = 2147483647L // 2^31-1

  /** Kernel dispatch used by both eval and generated code. */
  def dispatch(s: String, numHashes: Int, shingleLen: Int, oph: Boolean): Array[Long] =
    if (oph) computeOph(s, numHashes, shingleLen)
    else compute(s, numHashes, shingleLen)

  /** Deterministic splitmix64 mixer (shared with the HOF kit). */
  private def mix64(x: Long): Long = {
    var z = x * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** (a_i, b_i) permutation constants, cached per signature width. */
  private val coefCache = new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def coefs(numHashes: Int): (Array[Long], Array[Long]) =
    coefCache.computeIfAbsent(numHashes, _ => {
      val a = new Array[Long](numHashes)
      val b = new Array[Long](numHashes)
      var i = 0
      while (i < numHashes) {
        a(i) = (mix64(2L * i + 1) & 0x7FFFFFFFL) | 1L
        b(i) = mix64(2L * i + 2) & 0x7FFFFFFFL
        i += 1
      }
      (a, b)
    })

  def compute(s: String, numHashes: Int, shingleLen: Int): Array[Long] = {
    val (as, bs) = coefs(numHashes)
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, M)
    val n = s.length - shingleLen + 1
    var i = 0
    while (i < n) {
      // 64-bit polynomial hash of the shingle window
      var h = 0xCBF29CE484222325L
      var j = 0
      while (j < shingleLen) {
        h = (h ^ s.charAt(i + j)) * 0x100000001B3L
        j += 1
      }
      val x = (h & Long.MaxValue) % M
      var k = 0
      while (k < numHashes) {
        val v = (as(k) * x + bs(k)) % M
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      i += 1
    }
    sig
  }

  /**
   * One-permutation-hashing signature (OPH, Li et al. 2012) with
   * rotation densification (Shrivastava & Li 2014): each shingle is hashed
   * ONCE, routed to bin `mix64(h) mod k`, and each bin keeps its minimum;
   * empty bins borrow from the next non-empty bin to the right (cyclic)
   * with a distance-dependent offset so different borrow distances can't
   * manufacture equal slots. Per-shingle cost is O(1) instead of O(k) —
   * at a 100 TB corpus scan this is the difference between the sketch
   * pass costing one hash per shingle and costing 128.
   *
   * Slot-collision probability still tracks Jaccard (the OPH estimator),
   * so the banding layer is unchanged; the near-dup gates re-verify
   * recall=1 against brute force empirically (deterministic family).
   */
  def computeOph(s: String, numHashes: Int, shingleLen: Int): Array[Long] = {
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = s.length - shingleLen + 1
    var i = 0
    while (i < n) {
      var h = 0xCBF29CE484222325L
      var j = 0
      while (j < shingleLen) {
        h = (h ^ s.charAt(i + j)) * 0x100000001B3L
        j += 1
      }
      val m = mix64(h)
      val bin = (((m >>> 1) % numHashes).toInt)
      val v = (m & Long.MaxValue) % M
      if (v < sig(bin)) sig(bin) = v
      i += 1
    }
    // rotation densification: empty bin i takes the value of the nearest
    // non-empty bin to its right (cyclic) plus distance*C, keeping the
    // signature total and deterministic even for very short texts. All-empty
    // (no shingles) stays a constant signature — matching the dense
    // kernel's all-M signature semantics for sub-length texts.
    var anyFilled = false
    var k = 0
    while (k < numHashes && !anyFilled) { anyFilled = sig(k) != Long.MaxValue; k += 1 }
    if (!anyFilled) {
      java.util.Arrays.fill(sig, M)
    } else {
      val C = 0x9E3779B97F4A7C15L & Long.MaxValue
      val orig = sig.clone() // borrow from ORIGINAL fills, not densified ones
      k = 0
      while (k < numHashes) {
        if (orig(k) == Long.MaxValue) {
          var d = 1
          while (orig((k + d) % numHashes) == Long.MaxValue) d += 1
          sig(k) = (orig((k + d) % numHashes) + d.toLong * C) & Long.MaxValue
        }
        k += 1
      }
    }
    sig
  }
}

/**
 * MinHash LSH band hashes: the `numHashes`-wide signature folded into
 * `bands` bucket keys (64-bit FNV over each band's minima). Equivalent to
 * banding the [[MinHashSig]] output; computed in the same single pass so
 * the signature is never materialized into the plan (no risk of Catalyst
 * duplicating the sketch per band, and no 8·numHashes bytes per row in the
 * explode shuffle).
 */
case class MinHashBands(child: Expression, numHashes: Int, shingleLen: Int,
    bands: Int, oph: Boolean = false) extends UnaryExpression {
  require(numHashes % bands == 0, "bands must divide numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(MinHashBands.compute(
      input.asInstanceOf[UTF8String].toString, numHashes, shingleLen, bands, oph))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.MinHashBands.compute($c.toString(), $numHashes, $shingleLen, $bands, $oph));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

object MinHashBands {
  def compute(s: String, numHashes: Int, shingleLen: Int, bands: Int,
      oph: Boolean = false): Array[Long] = {
    val sig = MinHashSig.dispatch(s, numHashes, shingleLen, oph)
    val rowsPerBand = numHashes / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0xCBF29CE484222325L ^ b
      var j = 0
      while (j < rowsPerBand) {
        h = (h ^ sig(b * rowsPerBand + j)) * 0x100000001B3L
        j += 1
      }
      out(b) = h
      b += 1
    }
    out
  }
}

/**
 * 64-bit SimHash over whitespace tokens in one pass: per-token 64-bit
 * polynomial hash, per-bit sign-sum, sign → bit.
 */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64.compute($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def compute(s: String): Long = {
    val counts = new Array[Int](64)
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      if (i < n) {
        var h = 0xCBF29CE484222325L
        while (i < n && !Character.isWhitespace(s.charAt(i))) {
          h = (h ^ s.charAt(i)) * 0x100000001B3L
          i += 1
        }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) >= 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/**
 * Distinct character-n-gram set as sorted 64-bit hashes in ONE native
 * pass — the hot sketch of every shingle-based dedup path
 * ([[graft.ops.Dedup.containmentPairs]]'s profile: the sketch is the
 * single largest stage). The declarative form
 * (`transform(sequence(...), i -> xxhash64(substr(...)))` +
 * `array_distinct` + `sort_array`) allocates a UTF8 substring and boxes a
 * long per shingle; this walks the UTF-8 bytes once, hashes each
 * char-aligned window with an FNV-style polynomial (hash choice is free:
 * every consumer uses the hashes only for equality/distinctness, and the
 * oracles count STRING n-grams), sorts and dedups a primitive long array.
 * Char-aligned windows keep the semantics of the substring form on any
 * Unicode input.
 */
case class NgramHashSet(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    NgramHashSet.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NgramHashSet.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): NgramHashSet =
    copy(child = newChild)
}

object NgramHashSet {
  def compute(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    // char-start byte offsets (UTF-8 continuation bytes are 10xxxxxx)
    var chars = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xC0) != 0x80) chars += 1
      i += 1
    }
    if (chars < n) return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    val starts = new Array[Int](chars + 1)
    var c = 0
    i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xC0) != 0x80) { starts(c) = i; c += 1 }
      i += 1
    }
    starts(chars) = bytes.length
    val m = chars - n + 1
    val hs = new Array[Long](m)
    var w = 0
    while (w < m) {
      var h = 0xCBF29CE484222325L
      var b = starts(w)
      val end = starts(w + n)
      while (b < end) { h = (h ^ (bytes(b) & 0xFF)) * 0x100000001B3L; b += 1 }
      hs(w) = h
      w += 1
    }
    java.util.Arrays.sort(hs)
    // in-place dedup of the sorted array
    var out = 0
    var r = 0
    while (r < m) {
      if (out == 0 || hs(r) != hs(out - 1)) { hs(out) = hs(r); out += 1 }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (out == m) hs else java.util.Arrays.copyOf(hs, out))
  }
}

/**
 * Directional containment in ppm over two SORTED 64-bit hash-set arrays
 * (the [[NgramHashSet]] output invariant): ⌊10⁶·|a∩b|/|a|⌋ by a single
 * merge scan — no hash-set build, no intersection array allocation (what
 * `size(array_intersect(ga, gb))` pays per pair) — with an EARLY EXIT:
 * once more than |a|−⌈minPpm·|a|/10⁶⌉ of a's elements have missed, the
 * pair cannot reach `minPpm` and the scan aborts returning −1. At the
 * verify stage's typical threshold (0.9) a non-matching candidate aborts
 * after ~10% of the scan, and verify is the containment pipeline's single
 * most expensive stage — candidates-only, but each pair intersects two
 * full shingle sets. Callers filter `>= minPpm`, so the −1 rows (whose
 * exact ppm is never observable downstream) drop exactly as before.
 */
case class SortedContainmentPpm(left: Expression, right: Expression,
    minPpm: Long) extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(minPpm >= 0 && minPpm <= 1000000L, "minPpm must be in [0, 1e6]")

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sorted_containment_ppm needs (ARRAY<BIGINT>, ARRAY<BIGINT>), got " +
        s"(${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    SortedContainmentPpm.compute(l.asInstanceOf[ArrayData],
      r.asInstanceOf[ArrayData], minPpm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.SortedContainmentPpm.compute($l, $r, ${minPpm}L);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedContainmentPpm =
    copy(left = newLeft, right = newRight)
}

object SortedContainmentPpm {
  def compute(a: ArrayData, b: ArrayData, minPpm: Long): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0) return -1L
    // abort once misses exceed na - ceil(minPpm*na/1e6): threshold unreachable
    val needed = (minPpm * na + 999999L) / 1000000L
    val maxMisses = na - needed
    var i = 0
    var j = 0
    var matches = 0L
    var misses = 0L
    while (i < na && j < nb) {
      val va = a.getLong(i)
      val vb = b.getLong(j)
      if (va == vb) { matches += 1; i += 1; j += 1 }
      else if (va < vb) {
        misses += 1
        if (misses > maxMisses) return -1L
        i += 1
      } else j += 1
    }
    if (misses + (na - i) > maxMisses) return -1L
    matches * 1000000L / na
  }
}

/**
 * Deflate compression ratio in ppm: ⌊10⁶·deflate(utf8(text)).length /
 * utf8(text).length⌋ — the classic "too compressible = too repetitive,
 * near-incompressible = noise/binary" corpus-quality signal (the Gopher /
 * CCNet filter family measures exactly this; the reference has no text
 * pipeline, so this is engine-extension surface). Raw-deflate (nowrap,
 * default level) on the JDK's bundled zlib; a Deflater is allocated once
 * per executor thread and reset per row — zlib's native state setup is
 * NOT paid per document, so the scan stays scan-speed. Empty text is
 * 1,000,000 by convention (incompressible). Note small documents can
 * legitimately exceed 10⁶ (deflate block overhead dominates) — callers
 * threshold, they don't assume an upper bound.
 */
case class DeflateRatioPpm(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    DeflateRatioPpm.compute(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DeflateRatioPpm.compute($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): DeflateRatioPpm =
    copy(child = newChild)
}

object DeflateRatioPpm {
  private val deflaters = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, /* nowrap = */ true)
  }
  private val buffers = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  def compute(bytes: Array[Byte]): Long = {
    if (bytes.length == 0) return 1000000L
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = buffers.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total * 1000000L / bytes.length
  }
}
