package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-quality constraint checking (the deequ/Great-Expectations shape):
 * declare constraints, get back one row per constraint with its violation
 * count and verdict — the report a pipeline gates a publish step on.
 *
 * Scale posture: ALL column constraints evaluate in ONE scan — each is a
 * violation predicate folded into a single aggregate row (map-side
 * combined sums), then unpivoted driver-free with `stack`. Uniqueness is
 * the only constraint that inherently needs a shuffle (a count-distinct on
 * the key), and it runs as its own grouped aggregate rather than dragging
 * the scan-speed checks into a shuffle with it.
 */
object Quality {

  /**
   * Evaluate `checks` (name → VIOLATION predicate: true = row violates) in
   * one pass over `df`. Returns (constraint, violations, total, passed)
   * rows, one per check, in the given order.
   */
  def checkColumns(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "no constraints given")
    val agg = df.agg(count(lit(1)).as("__total"),
      checks.zipWithIndex.map { case ((_, pred), i) =>
        sum(when(pred, 1L).otherwise(0L)).as(s"__v$i")
      }: _*)
    // stack(n, name0, __v0, name1, __v1, ...) unpivots the single aggregate
    // row into one row per constraint without collecting anything
    val stackArgs = checks.zipWithIndex
      .map { case ((name, _), i) => s"'${name.replace("'", "''")}', __v$i" }
      .mkString(", ")
    agg.selectExpr(s"stack(${checks.length}, $stackArgs) as (constraint, violations)",
        "__total as total")
      .select(col("constraint"), col("violations"), col("total"),
        (col("violations") === 0L).as("passed"))
  }

  /** Uniqueness constraint on a composite key: violations = number of rows
    * beyond the first within any duplicated key (0 ⇔ the key is unique).
    * One map-side-combined groupBy on the key — the minimum an exact
    * uniqueness proof costs.
    */
  def checkUnique(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val name = s"unique(${keyCols.mkString(",")})"
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(sum(col("__n") - 1L).as("violations"),
        sum(col("__n")).as("total"))
      .select(lit(name).as("constraint"),
        coalesce(col("violations"), lit(0L)).as("violations"),
        coalesce(col("total"), lit(0L)).as("total"),
        (coalesce(col("violations"), lit(0L)) === 0L).as("passed"))
  }

  /** Full report: the single-scan column checks plus one uniqueness check
    * per key in `uniqueKeys`, unioned in declaration order.
    */
  def report(df: DataFrame, checks: Seq[(String, Column)],
      uniqueKeys: Seq[Seq[String]] = Nil): DataFrame =
    uniqueKeys.foldLeft(checkColumns(df, checks)) { (acc, key) =>
      acc.unionByName(checkUnique(df, key))
    }

  /**
   * Robust outlier statistics per group: discrete median and MAD (median
   * absolute deviation) over an INTEGER value column, plus the count of
   * rows beyond `k`·MAD — the outlier detector that, unlike mean/stddev,
   * a few extreme values cannot drag. Discrete (inverted-CDF) medians:
   * the smallest value whose cumulative count reaches ⌈n/2⌉ — exact
   * integer parity across engines, no interpolation.
   *
   * Scale posture: the [[Corpus.quantileGate]] trick, per group — both
   * medians compute over (group, value) HISTOGRAMS, so the only orderings
   * in the plan are windows over histogram rows (value-domain-bounded, KBs
   * per group at any corpus size); the raw data is touched by two
   * map-side-combined counts and one scan-speed flagging join.
   */
  def madOutlierStats(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def discreteMedian(vals: DataFrame, vCol: String, out: String): DataFrame = {
      val hist = vals.groupBy(col(groupCol), col(vCol))
        .agg(count(lit(1)).as("__c"))
      val w = Window.partitionBy(col(groupCol)).orderBy(col(vCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist.withColumn("__cum", sum(col("__c")).over(w))
      val tot = hist.groupBy(col(groupCol)).agg(sum(col("__c")).as("__n"))
      // integer div: ⌈n/2⌉ = (n+1) div 2 on both engines (a double
      // quotient would shift the threshold at odd counts)
      cum.join(tot, Seq(groupCol))
        .filter(col("__cum") >= expr("(__n + 1) div 2"))
        .groupBy(col(groupCol)).agg(min(col(vCol)).as(out))
    }
    val v = df.select(col(groupCol), col(valueCol).as("__v"))
    val med = discreteMedian(v, "__v", "median")
    val dev = v.join(med, Seq(groupCol))
      .withColumn("__d", abs(col("__v") - col("median")))
    val mad = discreteMedian(dev.select(col(groupCol), col("__d")), "__d", "mad")
    dev.join(mad, Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        first(col("median")).as("median"),
        first(col("mad")).as("mad"),
        sum(when(col("__d") > col("mad") * k, 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /**
   * SCD2 interval construction — collapse a change-event stream into
   * slowly-changing-dimension rows: per key, consecutive runs of the same
   * `valueCol` become one row with `valid_from_ms` (first event),
   * `valid_to_ms` (next run's start, null while current) and `n_events`.
   * The warehouse-standard "latest value as of T" join target, built from
   * an append-only event log.
   *
   * Scale posture: one hash shuffle on the key; every window is
   * partitioned by key and ordered by the (ts, id) unique tiebreak —
   * per-key-bounded, never global. Run detection is the classic
   * change-flag running sum (lag + cumulative sum), then one grouped
   * aggregate and a lead over runs.
   */
  def scd2Intervals(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wRow = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val runs = df
      .withColumn("__chg",
        when(lag(col(valueCol), 1).over(wRow).isNull ||
          lag(col(valueCol), 1).over(wRow) =!= col(valueCol), 1L).otherwise(0L))
      .withColumn("__run", sum(col("__chg")).over(
        wRow.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("__run"))
      .agg(first(col(valueCol)).as("value"),
        min(col(tsCol)).as("valid_from_ms"),
        count(lit(1)).as("n_events"))
    val wRun = Window.partitionBy(col(keyCol)).orderBy(col("valid_from_ms"))
    runs
      .withColumn("valid_to_ms", lead(col("valid_from_ms"), 1).over(wRun))
      .select(col(keyCol), col("value"), col("valid_from_ms"),
        col("valid_to_ms"), col("n_events"))
  }
}
