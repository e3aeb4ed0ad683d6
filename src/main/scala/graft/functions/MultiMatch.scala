package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Multi-pattern substring counting as ONE automaton pass — the blocklist /
 * policy-filter primitive of a corpus pipeline: a list of N banned or
 * tracked phrases applied to every document. A regex alternation or a
 * per-pattern `contains` loop costs O(N) (or a big NFA) per char; the
 * Aho–Corasick automaton (Aho & Corasick, CACM 1975) costs O(1) amortized
 * per char regardless of N, counting ALL occurrences of every pattern.
 *
 * The pattern list rides along as flat expression metadata
 * (`addReferenceObj`, like the BPE merge table); the automaton builds ONCE
 * per executor (content-keyed cache) and the per-row work is a tight
 * static-method loop inside whole-stage codegen.
 *
 * Returned value: per-pattern occurrence counts, in pattern order —
 * `aggregate(counts, sum)` is the total-hits score, `exists(counts, >0)`
 * the blocklist predicate, both staying in codegen'd HOFs.
 */
case class MultiPatternCounts(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "patterns must be non-empty strings")
  require(patterns.distinct.size == patterns.size, "patterns must be distinct")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val flat: Array[String] = patterns.toArray

  override def nullSafeEval(input: Any): Any =
    MultiMatchOps.counts(input.asInstanceOf[UTF8String].toString, flat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("acPatterns", flat, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MultiMatchOps.counts($c.toString(), $tbl);")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiPatternCounts =
    copy(child = newChild)
}

object MultiMatch {
  /** Column wrapper: per-pattern occurrence counts over `text`. */
  def patternCounts(text: Column, patterns: Seq[String]): Column =
    GraftColumnBridge.column(
      MultiPatternCounts(GraftColumnBridge.expression(text), patterns))
}

object MultiMatchOps {

  /** Aho–Corasick automaton over UTF-16 chars: trie + BFS failure links +
    * dictionary-suffix links, so matching walks each char once and each
    * reported occurrence once. */
  final class AC(patterns: Array[String]) {
    private val gotoMaps =
      scala.collection.mutable.ArrayBuffer(
        new java.util.HashMap[Character, Integer]())
    private val patEnd = scala.collection.mutable.ArrayBuffer[Int](-1)
    private val patLen = patterns.map(_.length)

    // trie
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var n = 0
      p.foreach { ch =>
        val m = gotoMaps(n)
        val nxt = m.get(ch)
        if (nxt != null) n = nxt
        else {
          gotoMaps += new java.util.HashMap[Character, Integer]()
          patEnd += -1
          m.put(ch, gotoMaps.size - 1)
          n = gotoMaps.size - 1
        }
      }
      patEnd(n) = pi // patterns are distinct by construction of callers
    }

    private val size = gotoMaps.size
    private val fail = new Array[Int](size)
    private val dictLink = new Array[Int](size) // nearest failing ancestor with a pattern
    // BFS failure links
    locally {
      val q = new java.util.ArrayDeque[Integer]()
      gotoMaps(0).forEach { (_, v) => fail(v) = 0; q.add(v) }
      while (!q.isEmpty) {
        val u = q.poll()
        dictLink(u) =
          if (patEnd(fail(u)) >= 0) fail(u) else dictLink(fail(u))
        gotoMaps(u).forEach { (ch, v) =>
          var f = fail(u)
          while (f != 0 && !gotoMaps(f).containsKey(ch)) f = fail(f)
          val t = gotoMaps(f).get(ch)
          fail(v) = if (t != null && t != v) t.intValue() else 0
          q.add(v)
        }
      }
    }

    def countAll(text: String): Array[Long] = {
      val out = new Array[Long](patterns.length)
      var n = 0
      var i = 0
      while (i < text.length) {
        val ch = text.charAt(i)
        var t = gotoMaps(n).get(ch)
        while (t == null && n != 0) { n = fail(n); t = gotoMaps(n).get(ch) }
        n = if (t == null) 0 else t.intValue()
        // report every pattern ending here via the dictionary-suffix chain
        var d = if (patEnd(n) >= 0) n else dictLink(n)
        while (d > 0) {
          out(patEnd(d)) += 1L
          d = dictLink(d)
        }
        i += 1
      }
      out
    }
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Seq[String], AC]()

  def automaton(patterns: Array[String]): AC =
    cache.computeIfAbsent(patterns.toSeq, _ => new AC(patterns))

  def counts(text: String, patterns: Array[String]): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(automaton(patterns).countAll(text))
}
