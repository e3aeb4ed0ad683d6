package graft.ops

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/**
 * Frequency sketches: count-min over a key column, and a heavy-hitter
 * report that cross-checks the sketch against the exact counts.
 *
 * Engine extension (SURVEY §2.12): corpus curation needs "which domains /
 * URLs / fingerprints are flooding the crawl" continuously; at 100 TB the
 * exact answer is a full shuffle of the key universe while the CMS is a
 * fixed KB-sized, MERGEABLE summary — partial aggregation combines
 * per-partition sketches, so one pass, no shuffle of the keys, and
 * day-over-day sketches merge for free. The deterministic seed makes the
 * whole report replayable.
 */
object Sketches {

  /** One-pass count-min sketch build (Spark's `count_min_sketch` aggregate:
    * per-partition sketches merged in partial aggregation — the driver
    * receives exactly one `depth x width` counter table, independent of
    * data volume).
    */
  def countMin(df: DataFrame, keyCol: String, eps: Double,
               confidence: Double, seed: Int): CountMinSketch = {
    val bytes = df
      .agg(count_min_sketch(col(keyCol), lit(eps), lit(confidence), lit(seed)))
      .head.getAs[Array[Byte]](0)
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
  }

  /**
   * Exact heavy hitters (count > minCount) with sketch cross-check columns:
   * `est_ge_exact` is the CMS one-sided-error THEOREM (estimates never
   * undercount — hash collisions only add), `within_eps` the probabilistic
   * bound est <= exact + eps*n at the build confidence, realized
   * deterministically by the fixed seed.
   *
   * The exact side is one partial-agg'd hash shuffle; the driver
   * materializes only the heavy set, which is theorem-bounded at
   * n/minCount keys regardless of data volume (at most n/minCount keys can
   * each exceed minCount occurrences) — model-sized, like an IVF quantizer.
   */
  def heavyHittersChecked(spark: SparkSession, df: DataFrame, keyCol: String,
                          minCount: Long, eps: Double = 1e-4,
                          confidence: Double = 0.99, seed: Int = 42): DataFrame = {
    import spark.implicits._
    val n = df.count()
    // cast once so the sketch hashes the same physical type it is probed with
    val keyed = df.select(col(keyCol).cast("long").as(keyCol))
    val cms = countMin(keyed, keyCol, eps, confidence, seed)
    val slack = math.ceil(eps * n).toLong
    val heavy = df.groupBy(col(keyCol).cast("long").as("key"))
      .agg(count(lit(1)).as("n_exact"))
      .filter(col("n_exact") > minCount)
      .as[(Long, Long)].collect()
    val rows: Seq[(Long, Long, Boolean, Boolean)] = heavy.toSeq.map {
      case (k, exact) =>
        val est = cms.estimateCount(k)
        (k, exact, est >= exact, est <= exact + slack)
    }
    rows.toDF("key", "n_exact", "est_ge_exact", "within_eps")
      .orderBy(col("key"))
  }
}
