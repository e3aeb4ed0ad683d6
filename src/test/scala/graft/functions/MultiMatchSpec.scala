package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultiMatchSpec extends SparkSpec {
  import spark.implicits._

  private def counts(text: String, patterns: Seq[String]): Seq[Long] =
    MultiMatchOps.automaton(patterns.toArray).countAll(text).toSeq

  test("classic AC: dictionary-suffix chains report nested matches") {
    // "ushers" contains she, he, hers (he inside she via suffix chain)
    assert(counts("ushers", Seq("he", "she", "his", "hers")) ===
      Seq(1L, 1L, 0L, 1L))
  }

  test("overlapping and repeated occurrences all count") {
    assert(counts("aaaa", Seq("aa")) === Seq(3L)) // positions 0,1,2
    assert(counts("ababab", Seq("aba", "bab")) === Seq(2L, 2L))
    assert(counts("xyxyx", Seq("xyx", "yxy", "zz")) === Seq(2L, 1L, 0L))
  }

  test("empty text, no matches, and pattern-prefix patterns") {
    assert(counts("", Seq("a", "bb")) === Seq(0L, 0L))
    assert(counts("abcabc", Seq("abc", "ab", "b")) === Seq(2L, 2L, 2L))
  }

  test("expression path matches the direct automaton, codegen and interpreted") {
    val pats = Seq("table", "hash", "agg query")
    val df = Seq(
      (1L, "key agg query table hash value table"),
      (2L, "no hits here"),
      (3L, "hash hash hash")).toDF("id", "text")
    val out = df.select($"id",
        MultiMatch.patternCounts($"text", pats).as("c"))
      .select($"id", expr("aggregate(c, 0L, (a, x) -> a + x)").as("hits"),
        expr("size(filter(c, x -> x > 0))").as("pats"))
      .orderBy("id")
      .as[(Long, Long, Int)].collect().toSeq
    assert(out === Seq((1L, 4L, 3), (2L, 0L, 0), (3L, 3L, 1)))
    // direct replay
    assert(counts("key agg query table hash value table", pats) ===
      Seq(2L, 1L, 1L))
  }

  test("one automaton pass beats N contains calls in semantics: counts are per pattern") {
    val pats = (0 until 200).map(i => s"w$i needle")
    val text = "w7 needle and w42 needle and w7 needle"
    val c = counts(text, pats)
    assert(c(7) === 2L && c(42) === 1L && c.sum === 3L)
  }
}
