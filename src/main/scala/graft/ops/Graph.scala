package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Graph analytics over edge lists — the domain-authority shape used to
 * rank crawl sources (a page/domain link graph at corpus scale is billions
 * of edges; the rank vector it produces is the standard quality prior for
 * crawl scheduling and training-data source weighting).
 *
 * All rank arithmetic is INTEGER (scaled fixed-point with truncating
 * division): floating-point summation is order-dependent and so differs
 * between engines and between runs at different parallelism; integer sums
 * are associative, making every iteration bit-for-bit deterministic and
 * replayable in any SQL engine — the same portability trick as the exact
 * integer-log2 bits in [[Corpus.unigramSurprisal]].
 *
 * Scale posture: per iteration, one hash-join of the cached edge list
 * against the previous rank vector and one map-side-combined sum by
 * destination — the same two-shuffle round as [[Dedup.nearDupClusters]];
 * no windows, no driver-side state (the damping constants are literals).
 * The edge list is cached once and reused by every round; the result is
 * node-bound, cut from its O(iters)-deep lineage with a local checkpoint
 * so the caches can be dropped on exit.
 */
object Graph {

  /**
   * Fixed-iteration PageRank on `edges` (columns `srcCol`, `dstCol`).
   * Returns (node, rank) with rank in fixed-point units of `scale`
   * (initial rank = `scale`; teleport term = 0.15·scale, damping 0.85,
   * both applied as exact integer multiply-divide). Dangling nodes keep
   * the teleport term; their outflow leaks rather than redistributing —
   * deterministic, and the standard simplification when ranks are used
   * as a relative quality prior rather than a probability distribution.
   */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, scale: Long = 1000000L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("__deg"))
    // every round joins the degreed edge list — cache it once
    val eDeg = e.join(deg.hint("shuffle_hash"), "src").cache()
    val nodes = eDeg.select(col("src").as("node"))
      .union(eDeg.select(col("dst").as("node"))).distinct().cache()
    val teleport = (15L * scale) / 100L
    var ranks = nodes.select(col("node"), lit(scale).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = eDeg
        .join(ranks.select(col("node").as("src"), col("rank")), "src")
        .select(col("dst"), expr("rank div __deg").as("__c"))
        .groupBy("dst").agg(sum(col("__c")).as("__s"))
      ranks = nodes.join(contrib.withColumnRenamed("dst", "node"),
          Seq("node"), "left_outer")
        .select(col("node"),
          (lit(teleport) + expr("(85 * coalesce(__s, 0L)) div 100"))
            .as("rank"))
    }
    val out = ranks.localCheckpoint(eager = true)
    eDeg.unpersist()
    nodes.unpersist()
    out
  }
}
