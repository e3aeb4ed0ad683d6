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

  def joinBackward(left: DataFrame, right: DataFrame, keyCol: String,
      leftTime: String, rightTime: String): DataFrame = {
    val rightVals = right.columns.filter(c => c != keyCol && c != rightTime).toSeq
    val leftCols = left.columns.toSeq
    require(rightVals.intersect(leftCols).isEmpty,
      s"right value columns ${rightVals.mkString(",")} must not clash with left columns")
    val rightTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val leftTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap

    // union by explicit select lists: left rows carry null right values,
    // right rows carry null left values
    val l = left.select(
      (col(keyCol) +: col(leftTime).as("__t") +: lit(1).as("__is_l") +:
        leftCols.filter(_ != keyCol).map(col)) ++
        rightVals.map(c => lit(null).cast(rightTypes(c)).as(c)): _*)
    val r = right.select(
      (col(keyCol) +: col(rightTime).as("__t") +: lit(0).as("__is_l") +:
        leftCols.filter(_ != keyCol).map(c => lit(null).cast(leftTypes(c)).as(c))) ++
        rightVals.map(col): _*)

    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__t"), col("__is_l")) // right (0) before left (1) at ties
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = rightVals.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__is_l") === 1)
      .select(leftCols.map(col) ++ rightVals.map(col): _*)
  }
}
