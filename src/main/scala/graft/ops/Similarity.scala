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
   * IVF (inverted-file) approximate top-k — the classic coarse-quantizer
   * ANN layout: the corpus is partitioned into `nCentroids` cells by
   * nearest centroid; each query probes its `nProbe` nearest cells and
   * runs exact cosine only inside them. With nProbe = nCentroids this
   * degenerates to the exact search (asserted in the spec) — the
   * recall/cost dial is nProbe/nCentroids.
   *
   * Centroids here are sampled deterministically from the corpus (every
   * (n/nCentroids)-th vector by id rank) rather than k-means-trained: no
   * stored model, stable across runs/engines. At 100 TB the cell
   * assignment is one broadcast-join scan (centroids are tiny), cells are
   * hash-partitioned by centroid id, and each query's probe list turns
   * the search into an equi-join on cell id — no all-pairs anywhere.
   */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCentroids: Int, nProbe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(nProbe >= 1 && nProbe <= nCentroids)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))

    // deterministic coarse quantizer: hash-sample ~2·nCentroids corpus rows
    // (a distributed filter — no global rank over the full corpus), then
    // rank only that tiny candidate set. May yield slightly fewer cells
    // than requested on tiny corpora; fine for a quantizer.
    val n = math.max(1L, corpus.count())
    val everyN = math.max(1L, n / math.max(1, nCentroids * 2))
    val sampled = c.filter(pmod(xxhash64(col("neighbor_id")), lit(everyN)) === 0)
    val wRank = Window.orderBy(col("neighbor_id")) // over ~2·nCentroids rows
    val centroids = sampled.withColumn("__rn", row_number().over(wRank))
      .filter(col("__rn") <= nCentroids)
      .select((col("__rn") - 1).cast("int").as("centroid_id"),
        col("cv").as("centv"))

    // cell assignment: argmax cosine over the broadcast centroid set
    def assign(df: DataFrame, vc: String, keep: Seq[String], top: Int): DataFrame = {
      val scored = df.crossJoin(broadcast(centroids))
        .withColumn("__cs", VectorKit.cosine(col(vc), col("centv")))
      val w = Window.partitionBy(keep.map(col): _*)
        .orderBy(col("__cs").desc, col("centroid_id"))
      scored.withColumn("__cr", row_number().over(w))
        .filter(col("__cr") <= top)
        .select((keep :+ vc).map(col) :+ col("centroid_id"): _*)
    }

    val cells = assign(c, "cv", Seq("neighbor_id"), 1)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val probes = assign(q, "qv", Seq("query_id"), nProbe)

    val scored = cells.join(broadcast(probes), Seq("centroid_id"))
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
