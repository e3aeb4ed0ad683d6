package graft.ops

import graft.functions.VectorKit
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (`array<float>`). Two tiers:
 *
 *  - [[bruteForceTopK]]: exact cosine top-k, query side broadcast — the
 *    correctness baseline. Linear scan of the corpus per query batch; at
 *    100 TB this is the right shape ONLY for small query sets (the corpus
 *    scan parallelizes perfectly, no shuffle of the big side: broadcast
 *    hash join → per-partition heap).
 *  - [[lshTopK]]: random-hyperplane LSH bucketing; each query probes its
 *    own bucket (plus optional multi-probe neighbors) so the scan touches
 *    a ~2^-bits fraction of the corpus. The scale path for large query sets.
 */
object Similarity {

  /**
   * Exact top-k by cosine for each query vector. `queries` must be small
   * (it is broadcast). Ties broken by corpus id for determinism.
   * Output: (query_id, neighbor_id, cos) — self-matches excluded.
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", VectorKit.cosine(col("cv"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("__rk").as("rank"))
  }

  /**
   * LSH-bucketed approximate top-k: corpus and queries are both bucketed by
   * [[VectorKit.rhpBucket]]; candidates = same-bucket rows; exact cosine +
   * top-k within candidates. Recall is tunable via `nBits` (fewer bits →
   * bigger buckets → higher recall, more compute).
   */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, nBits: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      VectorKit.rhpBucket(col(vecCol), nBits).as("bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      VectorKit.rhpBucket(col(vecCol), nBits).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", VectorKit.cosine(col("cv"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("__rk").as("rank"))
  }
}
