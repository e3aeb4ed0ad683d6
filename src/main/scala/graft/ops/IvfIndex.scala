package graft.ops

import graft.functions.VectorKit
import graft.sources.Layout
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Persisted IVF index — build once, probe many. [[Similarity.ivfTopK]]
 * retrains its coarse quantizer and reassigns every corpus vector per
 * call: right for a one-shot job, wrong for a served index over a 100 TB
 * corpus. This materializes the classic inverted-file layout as a
 * lakehouse table instead:
 *
 *   - `path/model/` — one row per centroid (centroid_id, centroid)
 *   - `path/cells/` — the corpus as (id, vector), hive-PARTITIONED by
 *     centroid_id via [[Layout.writePartitioned]] (pre-shuffle routing,
 *     no small-files explosion)
 *
 * so a probe is partition PRUNING: the query batch's probed cells become
 * a static `IN` filter on the partition column, the scan plans only those
 * directories (`PartitionFilters`, metric-asserted in `IvfIndexSpec`),
 * and the other (nCentroids − nProbe)/nCentroids of the corpus is never
 * opened. The trainer is deterministic and build/probe use the exact
 * assignment/probe expressions of the in-memory path, so probe results
 * are bit-identical to `ivfTopK` at the same dials — gated end to end in
 * `sim_topk_ivf_persisted`.
 */
object IvfIndex {

  /** Train the coarse quantizer and write the model + partitioned cells. */
  def build(corpus: DataFrame, path: String, nCentroids: Int,
      lloydIters: Int = 2, idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    val spark = corpus.sparkSession
    val centroids =
      Similarity.trainIvfCentroids(corpus, nCentroids, lloydIters, idCol, vecCol)
    import spark.implicits._
    centroids.toDF("centroid_id", "centroid").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/model")
    Layout.writePartitioned(
      corpus.select(col(idCol), col(vecCol)).withColumn("centroid_id",
        Similarity.nearestCentroid(col(vecCol), centroids)),
      s"$path/cells", Seq("centroid_id"))
  }

  /**
   * Incremental maintenance: assign NEW vectors with the STORED model and
   * append them into the cell partitions — no retraining, no rewrite of
   * existing cells (the crawl-grows-daily contract every served ANN index
   * lives under; FAISS calls this add-without-train). Probe results after
   * an append are identical to rebuilding the cells from the unioned
   * corpus with the same model, because assignment is a pure function of
   * (vector, model) — asserted in `IvfIndexSpec`. Quantizer drift under
   * heavy growth is the operator's documented limit: retrain via [[build]]
   * when cell-size skew says so (the census below is the dashboard row).
   */
  def append(newVectors: DataFrame, path: String, idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    val spark = newVectors.sparkSession
    val centroids = loadModel(spark, path)
    newVectors.select(col(idCol), col(vecCol)).withColumn("centroid_id",
        Similarity.nearestCentroid(col(vecCol), centroids))
      .repartition(col("centroid_id"))
      .write.partitionBy("centroid_id").mode("append")
      .parquet(s"$path/cells")
  }

  /** Per-cell size census — the skew/drift dashboard a served index
    * watches to decide when [[append]] growth warrants a retrain. */
  def cellStats(spark: SparkSession, path: String): DataFrame =
    Layout.readPartitioned(spark, s"$path/cells")
      .groupBy(col("centroid_id")).agg(count(lit(1)).as("n_vectors"))
      .orderBy(col("centroid_id"))

  /**
   * Streaming ANN serving: probe the persisted index with every
   * micro-batch of query vectors and write (query_id, neighbor_id, cos,
   * rank) into an epoch-keyed OVERWRITE sink (`batch=<epoch>` dirs) — a
   * replayed epoch rewrites its own directory, so serving is exactly-once
   * under crash replay (the MediationApp analytics-sink discipline). The
   * index is the stable side; only the small query batch moves per
   * trigger, and each batch's scan still partition-prunes to its own
   * probed cells.
   */
  def startServing(queries: DataFrame, path: String, k: Int, nProbe: Int,
      outPath: String, checkpoint: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        probe(batch.sparkSession, path, batch, k, nProbe, idCol, vecCol)
          .write.mode("overwrite").parquet(s"$outPath/batch=$epochId")
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** The KB quantizer model back from disk (sorted by centroid id). */
  def loadModel(spark: SparkSession, path: String): Seq[(Int, Seq[Double])] =
    spark.read.parquet(s"$path/model").select("centroid_id", "centroid")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toSeq))
      .sortBy(_._1).toSeq

  /**
   * Top-k by cosine for each query against the persisted index, probing
   * `nProbe` cells per query. Queries are small by the ANN-batch contract
   * (every searcher broadcasts them); the probed CELL SET is smaller
   * still, and collecting it buys STATIC partition pruning on the cells
   * table — which a broadcast join's dynamic pruning cannot guarantee.
   * Ranking is the k-bounded aggregator (O(k) per query map-side, no
   * corpus-sized sort task), same as every other `sim_*` path.
   */
  def probe(spark: SparkSession, path: String, queries: DataFrame, k: Int,
      nProbe: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val centroids = loadModel(spark, path)
    require(nProbe >= 1 && nProbe <= centroids.size,
      s"nProbe must be in [1, ${centroids.size}]")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val probes = q.select(col("query_id"), col("qv"),
      explode(Similarity.probeCells(col("qv"), centroids, nProbe))
        .as("centroid_id"))
    val probedCells = probes.select("centroid_id").distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    val cells = Layout.readPartitioned(spark, s"$path/cells")
      .filter(col("centroid_id").isin(probedCells: _*))
      .select(col("centroid_id"), col(idCol).as("neighbor_id"),
        col(vecCol).as("cv"))
    val scored = cells.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", VectorKit.cosine(col("cv"), col("qv")))
    TopK.topKPerGroupByDouble(scored, "query_id", col("cos"),
        col("neighbor_id"), k)
      .select(col("group").as("query_id"), col("payload").as("neighbor_id"),
        col("ord").as("cos"), col("rank"))
  }
}
