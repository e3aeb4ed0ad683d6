package graft.ops

import graft.SparkSpec

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps"),
    (2L, "quick quick brown"),
    (3L, "brown the quick"),     // both terms, never adjacent as "quick brown"
    (4L, "a b quick brown c quick brown"), // phrase twice
    (5L, ""),                    // tokenless
    (6L, "quick")).toDF("doc_id", "text")

  private lazy val idx = Search.invertedIndex(docs, "doc_id", "text")

  test("inverted index: positions are exact and sorted; tf matches") {
    val row = idx.filter($"token" === "quick" && $"doc" === 2L)
      .as[(String, Long, Long, Seq[Int])].head()
    assert(row._3 == 2L && row._4 == Seq(0, 1))
    assert(idx.filter($"doc" === 5L).count() == 0) // empty doc absent
  }

  test("andQuery: all terms required, order-free") {
    val got = Search.andQuery(idx, Seq("quick", "brown"))
      .as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L, 4L))
    assert(Search.andQuery(idx, Seq("quick", "fox")).as[Long].collect().toSet == Set(1L))
  }

  test("phraseQuery: adjacency required, occurrences counted, overlap exact") {
    val got = Search.phraseQuery(idx, Seq("quick", "brown"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 4L -> 2L)) // doc 3 has no adjacency
    // repeated-term phrase with overlapping occurrences: "quick quick"
    assert(Search.phraseQuery(idx, Seq("quick", "quick"))
      .as[(Long, Long)].collect().toMap == Map(2L -> 1L))
    // 3-term phrase
    assert(Search.phraseQuery(idx, Seq("the", "quick", "brown"))
      .as[(Long, Long)].collect().toMap == Map(1L -> 1L))
  }

  test("overlapping repeated-term phrase counts each start position") {
    val d = Seq((9L, "a a a a")).toDF("doc_id", "text")
    val i = Search.invertedIndex(d, "doc_id", "text")
    assert(Search.phraseQuery(i, Seq("a", "a")).as[(Long, Long)].head() == (9L, 3L))
  }
}
