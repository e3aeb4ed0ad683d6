package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Range (interval) join — left points `t` against right intervals
 * `[start, end)`, optionally sharing equi-keys. Spark plans a bare
 * inequality join as BroadcastNestedLoop (O(|L|·|R|) compares); the scale
 * path chunks time into fixed buckets: every interval explodes over the
 * buckets it covers, points map to exactly one bucket, and the join
 * becomes an equi-join on (keys..., bucket) + an exact residual filter.
 * A point lies in one bucket, so no duplicate matches and no dedup pass.
 *
 * Shuffle volume: |R| × avg-buckets-per-interval + |L| — choose
 * `bucketMs` ≈ the typical interval length so intervals explode to ~1-2
 * buckets. (Same technique as Spark's own AQE-era range-join hints in
 * other engines; composed here from public operators.)
 */
object RangeJoin {

  def byBucket(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      t: String, start: String, end: String, bucketMs: Long,
      joinType: String = "inner"): DataFrame = {
    require(bucketMs > 0)
    val lb = left.withColumn("__b", expr(s"$t div $bucketMs"))
    val rb = right.withColumn("__b",
      explode(sequence(expr(s"$start div $bucketMs"),
        expr(s"($end - 1) div $bucketMs"))))
    lb.join(rb, (keyCols :+ "__b").toSeq, joinType)
      .filter(col(t) >= col(start) && col(t) < col(end))
      .drop("__b")
  }

  /**
   * Interval OVERLAP join — both sides carry `[start, end)` intervals
   * (column names must be distinct across the two sides); pairs with a
   * non-empty intersection are emitted, once each. Same chunking idea as
   * [[byBucket]] with one extra wrinkle: both sides explode over their
   * covered buckets, so an overlapping pair can meet in SEVERAL buckets —
   * each match is therefore kept only in the bucket containing the
   * overlap's left edge, `max(lStart, rStart)`, which exists and is
   * unique, so no distinct pass over the (potentially wide) output is
   * needed. Shuffle volume: Σ buckets-per-interval on each side; pick
   * `bucketMs` ≈ the typical interval length.
   */
  def intervalOverlap(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketMs: Long): DataFrame = {
    require(bucketMs > 0)
    def chunk(df: DataFrame, start: String, end: String) =
      df.withColumn("__b", explode(sequence(expr(s"$start div $bucketMs"),
        expr(s"($end - 1) div $bucketMs"))))
    chunk(left, lStart, lEnd)
      .join(chunk(right, rStart, rEnd), (keyCols :+ "__b").toSeq)
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .filter(col("__b") === expr(s"greatest($lStart, $rStart) div $bucketMs"))
      .drop("__b")
  }
}
