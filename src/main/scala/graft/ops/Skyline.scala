package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exact distributed 2-D skyline (Pareto frontier), both dimensions
 * maximized. A row is on the frontier iff no other row is >= in both
 * dimensions and strictly greater in at least one (exact duplicates are
 * mutually non-dominating and are all kept). Negate a column to minimize
 * that dimension.
 *
 * Engine extension (SURVEY §2.12): the reference has no multi-objective
 * operator; a training-data curator uses this shape constantly ("longest
 * AND highest-quality documents", "cheapest AND freshest snapshot").
 *
 * Scale shape — the naive formulations both die at 100 TB: the NOT EXISTS
 * self-join is all-pairs O(n²), and the classic sort-based sweep is a
 * single global sort with a sequential running max (one task). Instead:
 *
 *   1. per-x reduction: `groupBy(x).agg(max(y))` — one hash shuffle with
 *      map-side partial aggregation; after it x values are unique, so
 *      "strictly greater x" is exactly a rows-frame `(-inf, -1)` window.
 *   2. coarse bucket b(x) (caller-supplied monotone non-decreasing
 *      bucketing, e.g. `shiftright(x, k)`): per-bucket y-max is a tiny
 *      aggregate (B rows); the prefix max over strictly-greater buckets
 *      is a window over those B rows — bounded driver-independent state,
 *      the same O(B) scalar footprint as an AQE statistic.
 *   3. within-bucket running y-max over strictly-greater x: a window
 *      PARTITIONED BY bucket — every bucket sorts independently in
 *      parallel; no global sort, no single-task stage.
 *   4. dominance bound M(x) = max(carry from higher buckets, running max
 *      within bucket); frontier = rows with y > coalesce(M, -inf).
 *   5. the (small) frontier key set broadcast-joins back to the input to
 *      recover full rows, including frontier duplicates.
 *
 * Total cost: one hash shuffle + one per-bucket window + one broadcast
 * join — every stage partial-aggregable and skew-bounded by the caller's
 * bucket granularity.
 */
object Skyline {

  /**
   * @param df     input rows
   * @param xCol   first maximized dimension (numeric, exact type — use
   *               scaled longs, not doubles, for cross-engine determinism)
   * @param yCol   second maximized dimension (numeric, exact type)
   * @param bucket monotone non-decreasing coarse bucketing of `xCol`
   *               (e.g. `c => shiftright(c, 22)`); granularity bounds the
   *               per-bucket window sort
   * @return the input rows on the Pareto frontier (all original columns)
   */
  def skyline2D(df: DataFrame, xCol: String, yCol: String,
                bucket: Column => Column): DataFrame = {
    val x = col(xCol)
    val y = col(yCol)

    // 1. unique-x reduction (partial-agg'd hash shuffle)
    val perX = df.groupBy(x.as("__x")).agg(max(y).as("__ymax"))
      .withColumn("__b", bucket(col("__x")))

    // 2. per-bucket maxima + prefix max over strictly-greater buckets.
    // B rows total: the single-partition window here is over bounded,
    // pre-aggregated state (like a driver-side model), not the data.
    val wB = Window.orderBy(col("__b").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketCarry = perX.groupBy(col("__b")).agg(max(col("__ymax")).as("__bmax"))
      .withColumn("__carry", max(col("__bmax")).over(wB))
      .select(col("__b"), col("__carry"))

    // 3.–4. within-bucket running max (parallel per bucket) + dominance test
    val wIn = Window.partitionBy(col("__b")).orderBy(col("__x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontierKeys = perX
      .join(broadcast(bucketCarry), "__b")
      .withColumn("__inb", max(col("__ymax")).over(wIn))
      .withColumn("__m", greatest(coalesce(col("__carry"), lit(Long.MinValue)),
        coalesce(col("__inb"), lit(Long.MinValue))))
      .filter(col("__ymax") > col("__m"))
      .select(col("__x"), col("__ymax"))

    // 5. recover full frontier rows (duplicates included)
    df.join(broadcast(frontierKeys),
      x === col("__x") && y === col("__ymax"), "inner")
      .drop("__x", "__ymax")
  }
}
