package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * AS-OF join — for every left row, the single right row with the same key
 * and the greatest `rightTime <= leftTime` (backward, inclusive). Spark has
 * no built-in; the naive composition (equi-join on key + time filter +
 * max-by) explodes to O(|matches|) pairs before pruning.
 *
 * This is the scalable merge formulation instead: union both sides tagged,
 * hash-partition by key, sort by (time, side) within the partition, and
 * carry the right side's values forward with `last(ignoreNulls)` over an
 * unbounded-preceding window — ONE shuffle + sort, no pair explosion, the
 * same plan shape Spark uses for any window aggregate. At equal timestamps
 * the right row sorts first, so `rightTime == leftTime` matches (ASOF
 * backward semantics, as in DuckDB/kdb).
 *
 * Contract: the right side should be unique per (key, rightTime) — with
 * duplicates, the later row in (key, time) order wins; pre-aggregate for
 * determinism. Left rows with no prior right row keep nulls (left-outer
 * flavor).
 */
object Asof {

  /** Tagged union of both sides on a common (key, __t, __is_l) spine; left
    * rows carry null right values and vice versa. `leftTag` fixes which
    * side sorts first at timestamp ties (the side with the SMALLER tag). */
  private def merged(left: DataFrame, right: DataFrame, keyCol: String,
      leftTime: String, rightTime: String, leftTag: Int)
      : (DataFrame, Seq[String], Seq[String]) = {
    val rightVals = right.columns.filter(c => c != keyCol && c != rightTime).toSeq
    val leftCols = left.columns.toSeq
    require(rightVals.intersect(leftCols).isEmpty,
      s"right value columns ${rightVals.mkString(",")} must not clash with left columns")
    val rightTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val leftTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap
    val l = left.select(
      (col(keyCol) +: col(leftTime).as("__t") +: lit(leftTag).as("__is_l") +:
        leftCols.filter(_ != keyCol).map(col)) ++
        rightVals.map(c => lit(null).cast(rightTypes(c)).as(c)): _*)
    val r = right.select(
      (col(keyCol) +: col(rightTime).as("__t") +: lit(1 - leftTag).as("__is_l") +:
        leftCols.filter(_ != keyCol).map(c => lit(null).cast(leftTypes(c)).as(c))) ++
        rightVals.map(col): _*)
    (l.unionByName(r), leftCols, rightVals)
  }

  def joinBackward(left: DataFrame, right: DataFrame, keyCol: String,
      leftTime: String, rightTime: String): DataFrame = {
    // left tag 1: right (0) sorts before left at ties, so rightTime ==
    // leftTime matches (inclusive backward, as in DuckDB/kdb)
    val (u, leftCols, rightVals) =
      merged(left, right, keyCol, leftTime, rightTime, leftTag = 1)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__t"), col("__is_l"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightVals.foldLeft(u) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__is_l") === 1)
      .select(leftCols.map(col) ++ rightVals.map(col): _*)
  }

  /**
   * Forward AS-OF: for every left row, the single right row with the same
   * key and the SMALLEST `rightTime >= leftTime` (inclusive) — the shape
   * that answers "the next reading after this event". Mirror of
   * [[joinBackward]]: left tag 0 puts left BEFORE the tied right row, and
   * the right values are carried backward with `first(ignoreNulls)` over
   * the current-row-to-unbounded-FOLLOWING frame. Same single
   * shuffle + per-key sort, no pair explosion.
   */
  def joinForward(left: DataFrame, right: DataFrame, keyCol: String,
      leftTime: String, rightTime: String): DataFrame = {
    val (u, leftCols, rightVals) =
      merged(left, right, keyCol, leftTime, rightTime, leftTag = 0)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__t"), col("__is_l"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = rightVals.foldLeft(u) { (df, c) =>
      df.withColumn(c, first(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__is_l") === 0)
      .select(leftCols.map(col) ++ rightVals.map(col): _*)
  }

  /**
   * Time-series interpolation at grid points: for every `grid` row, the
   * linear interpolation of `obs`'s `valCol` between the bracketing
   * observations per key — the resample/align step in front of any
   * time-series feature pipeline. Composed from [[joinBackward]] +
   * [[joinForward]] (two single-shuffle as-of passes, no pair explosion):
   * exact hits return the observation itself, one-sided gaps extend the
   * nearest value flat, keys with no observations yield null.
   *
   * Observations must be unique per (key, time) — pre-aggregate ties
   * (e.g. max per timestamp) or the carried value is undefined; the
   * interpolation arithmetic is `pv + (nv - pv) · (t - pt) / (nt - pt)`
   * with double division, written identically in the SQL oracle.
   * Output: grid columns + (prev_t, next_t, value).
   */
  def interpolateAt(grid: DataFrame, obs: DataFrame, keyCol: String,
      gridTime: String, obsTime: String, valCol: String): DataFrame = {
    val prev = joinBackward(grid,
      obs.select(col(keyCol), col(obsTime).as("__bt"),
        col(obsTime).as("prev_t"), col(valCol).as("__pv")),
      keyCol, gridTime, "__bt")
    val both = joinForward(prev,
      obs.select(col(keyCol), col(obsTime).as("__ft"),
        col(obsTime).as("next_t"), col(valCol).as("__nv")),
      keyCol, gridTime, "__ft")
    both.withColumn("value",
        when(col("prev_t").isNull, col("__nv"))
          .when(col("next_t").isNull, col("__pv"))
          .when(col("next_t") === col("prev_t"), col("__pv"))
          .otherwise(col("__pv") + (col("__nv") - col("__pv")) *
            ((col(gridTime) - col("prev_t")).cast("double") /
              (col("next_t") - col("prev_t")).cast("double"))))
      .drop("__pv", "__nv")
  }
}
