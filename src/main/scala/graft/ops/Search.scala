package graft.ops

import graft.functions.TextKit
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Full-text search over a document corpus: positional inverted index +
 * conjunctive (AND) and exact-phrase queries.
 *
 * Engine extension (SURVEY §2.12): corpus tooling constantly needs "find
 * every document containing these terms / this phrase" (leak hunting,
 * eval-contamination triage, targeted sampling), and a 100 TB corpus
 * cannot regex-scan per question. The index is built ONCE (one explode +
 * one partial-agg'd shuffle keyed by (token, doc)) and persisted
 * token-partitioned, so a query touches only its terms' posting rows —
 * the classic search-engine asymmetry: O(corpus) build, O(postings)
 * query.
 *
 * Queries stay declarative: AND = per-doc distinct-term count equality;
 * phrase = the position-offset trick (term i at position p contributes
 * anchor p - i, so a full n-term phrase starting at s yields n hits on
 * anchor s) — both are partial-agg'd groupBys over the filtered posting
 * lists, with no per-document re-scan of text.
 */
object Search {

  /** Positional inverted index: (token, doc, tf, positions[sorted]). */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc"),
        posexplode(TextKit.tokens(col(textCol))).as(Seq("pos", "token")))
      .groupBy(col("token"), col("doc"))
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos"))).as("positions"))

  /** Documents containing ALL `terms` (conjunctive query). One pushdown
    * filter over the index + one per-doc distinct-term count.
    */
  def andQuery(index: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty && terms.distinct.size == terms.size)
    index.filter(col("token").isin(terms: _*))
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("__nt")) // (token, doc) unique in the index
      .filter(col("__nt") === terms.size)
      .select(col("doc"))
  }

  /**
   * BM25-ranked retrieval (Robertson–Spärck Jones): per-document relevance
   * over `terms`, `Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`
   * with idf = ln((N − df + 0.5)/(df + 0.5) + 1) (the Lucene-standard
   * non-negative form). Needs only the posting rows of the query terms
   * plus two corpus scalars (N, avgdl) and per-term dfs — all
   * partial-agg'd; the doc-length side joins on doc for just the candidate
   * docs. Scores are micro-quantized for cross-engine exactness.
   */
  def bm25Query(index: DataFrame, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.distinct.size == terms.size)
    val docLen = index.groupBy(col("doc")).agg(sum(col("tf")).as("dl"))
    val corpus = docLen.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val posting = index.filter(col("token").isin(terms: _*))
      .select(col("token"), col("doc"), col("tf"))
    val df_ = posting.groupBy(col("token")).agg(count(lit(1)).as("df"))
    posting
      .join(broadcast(df_), "token")
      .join(docLen, "doc")
      .crossJoin(broadcast(corpus))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("w", col("idf") * col("tf") * (lit(k1) + 1.0) /
        (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("doc"))
      .agg(round(sum(col("w")) * 1000000.0, 0).cast("long").as("score_micro"))
  }

  /** Documents containing the exact token phrase `terms`, with occurrence
    * counts. Position-offset anchors: full phrases are anchors hit by all
    * n terms; overlapping occurrences count separately.
    */
  def phraseQuery(index: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty)
    val anchored = index
      .filter(col("token").isin(terms.distinct: _*))
      .select(col("doc"), col("token"), explode(col("positions")).as("pos"))
    val perTerm = terms.zipWithIndex.map { case (t, i) =>
      anchored.filter(col("token") === t)
        .select(col("doc"), (col("pos") - i).as("anchor"))
    }
    perTerm.reduce(_ union _)
      .groupBy(col("doc"), col("anchor"))
      .agg(count(lit(1)).as("__hits"))
      .filter(col("anchor") >= 0 && col("__hits") === terms.size)
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_occurrences"))
  }
}
