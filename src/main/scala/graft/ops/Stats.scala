package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed descriptive statistics: correlation matrix, per-group OLS
 * regression, z-score outlier detection, chi-square independence, a
 * grid-blocked planar distance join, and basket association rules.
 *
 * Cross-engine determinism contract (the DuckDB oracle hashes values): every
 * statistic here is computed from EXACT integer sums (callers pass
 * integer-scaled columns — cents/bps — so `sum(x)`, `sum(x*x)`, `sum(x*y)`
 * are exact BIGINTs; Spark runs ANSI mode so overflow fails loudly instead
 * of wrapping), then finished with a fixed IEEE-754 double expression tree
 * that the oracle mirrors operation-for-operation. Identical inputs +
 * identical op order → bit-identical doubles → identical micro-rounding.
 *
 * Scale posture: every op is one scan + map-side-combined aggregation (the
 * moment sums), or an equi-join on a blocking key (grid cells, baskets).
 * Nothing collects to the driver; nothing is quadratic without a documented
 * cap.
 */
object Stats {

  private def dd(c: Column): Column = c.cast("double")

  /**
   * Pearson correlation for every pair of `cols` (assumed integer-valued;
   * cast to long internally) in ONE scan: a single aggregate row holds all
   * moment sums (n, Σx, Σx², Σxy — all exact bigints, partial-agg
   * combined), then the pair rows are exploded from that one row — no
   * second pass, no driver collect. At 100 TB this is a full scan plus a
   * 1-row reduce, the minimum any correlation needs.
   *
   * Output: (col_x, col_y, n, corr) with corr =
   * (n·Σxy − Σx·Σy) / sqrt((n·Σx² − Σx²ₛ)·(n·Σy² − Σy²ₛ)) in doubles.
   */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val d = df.select(cols.map(c => col(c).cast("long").as(c)): _*)
    val pairs = for { i <- cols.indices; j <- cols.indices if i < j }
      yield (cols(i), cols(j))
    val aggs =
      cols.flatMap(c => Seq(sum(col(c)).as(s"__s_$c"),
        sum(col(c) * col(c)).as(s"__ss_$c"))) ++
      pairs.map { case (a, b) => sum(col(a) * col(b)).as(s"__sp_${a}_$b") }
    val g = d.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = pairs.map { case (a, b) =>
      val n = dd(col("__n"))
      val sx = dd(col(s"__s_$a")); val sy = dd(col(s"__s_$b"))
      val sxx = dd(col(s"__ss_$a")); val syy = dd(col(s"__ss_$b"))
      val sxy = dd(col(s"__sp_${a}_$b"))
      val corr = (n * sxy - sx * sy) /
        sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      struct(lit(a).as("col_x"), lit(b).as("col_y"),
        col("__n").as("n"), corr.as("corr"))
    }
    g.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /**
   * Per-group ordinary-least-squares fit of y on x (both integer-valued):
   * one grouped aggregation for the five moment sums, then
   * slope = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²ₛ), intercept = (Σy − slope·Σx)/n,
   * r² = cov² / (varx·vary). Groups with zero x-variance yield nulls.
   * One shuffle on the group key, partials combined map-side.
   *
   * Output: (group, n, slope, intercept, r2).
   */
  def olsRegression(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val d = df.select(col(groupCol).as("group"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
    val g = d.groupBy(col("group")).agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"))
    val n = dd(col("n"))
    val sx = dd(col("sx")); val sy = dd(col("sy"))
    val sxx = dd(col("sxx")); val syy = dd(col("syy")); val sxy = dd(col("sxy"))
    val cov = n * sxy - sx * sy
    val varx = n * sxx - sx * sx
    val vary = n * syy - sy * sy
    val slope = when(varx =!= 0.0, cov / varx)
    g.select(col("group"), col("n"), slope.as("slope"),
      when(varx =!= 0.0, (sy - (cov / varx) * sx) / n).as("intercept"),
      when(varx =!= 0.0 && vary =!= 0.0, (cov * cov) / (varx * vary)).as("r2"))
  }

  /**
   * Population z-score outliers per group: rows where |v − mean| > z·std.
   * Two passes over the (already small, integer-scaled) projection: a
   * grouped moment aggregate (group cardinality-sized — broadcast back),
   * then a per-row filter. mean = Σv/n, var = (Σv² − Σv²ₛ/n)/n — fixed op
   * order, mirrored by the oracle.
   *
   * Output: original (group, id, v) rows that are outliers, plus zscore.
   */
  def zscoreOutliers(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String, z: Double): DataFrame = {
    val d = df.select(col(groupCol).as("group"), col(idCol).as("id"),
      col(valueCol).cast("long").as("v"))
    val stats = d.groupBy(col("group")).agg(count(lit(1)).as("n"),
      sum(col("v")).as("s"), sum(col("v") * col("v")).as("ss"))
    val n = dd(col("n")); val s = dd(col("s")); val ss = dd(col("ss"))
    val withStats = d.join(broadcast(
      stats.select(col("group"), (s / n).as("mean"),
        sqrt((ss - (s * s) / n) / n).as("std"))), Seq("group"))
    withStats
      .filter(abs(dd(col("v")) - col("mean")) > lit(z) * col("std"))
      .select(col("group"), col("id"), col("v"),
        ((dd(col("v")) - col("mean")) / col("std")).as("zscore"))
  }

  /**
   * Chi-square test of independence between two categorical columns,
   * via the zero-cell-free identity chi2 = Σ_cells (obs−exp)²/exp =
   * Σ_OBSERVED obs²/exp − n (the never-observed (a,b) combinations each
   * contribute exactly their expectation, and all expectations sum to n —
   * so they need not be generated). Each observed cell's obs²/exp term
   * (exp = rowTot·colTot/n, exact marginals) is rounded to micro-units
   * BEFORE the final sum so the statistic is an order-free exact BIGINT
   * sum (distributed double addition is order-dependent; rounded-integer
   * addition is not).
   *
   * Output: one row (n_cells — observed cells, dof, chi2_micro).
   */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val d = df.select(col(aCol).as("a"), col(bCol).as("b"))
    val obs = d.groupBy(col("a"), col("b")).agg(count(lit(1)).as("o"))
    val rowTot = obs.groupBy(col("a")).agg(sum(col("o")).as("rt"))
    val colTot = obs.groupBy(col("b")).agg(sum(col("o")).as("ct"))
    val tot = obs.agg(sum(col("o")).as("n"), countDistinct(col("a")).as("ra"),
      countDistinct(col("b")).as("cb"))
    val exp = (dd(col("rt")) * dd(col("ct"))) / dd(col("n"))
    val contrib = (dd(col("o")) * dd(col("o"))) / exp
    obs.join(broadcast(rowTot), Seq("a")).join(broadcast(colTot), Seq("b"))
      .crossJoin(broadcast(tot))
      .select(round(contrib * lit(1e6), 0).cast("long").as("c_micro"),
        col("n"), col("ra"), col("cb"))
      .groupBy(col("n"), col("ra"), col("cb"))
      .agg(count(lit(1)).as("n_cells"), sum(col("c_micro")).as("chi2_micro"))
      .select(col("n_cells"), ((col("ra") - 1) * (col("cb") - 1)).as("dof"),
        (col("chi2_micro") - col("n") * lit(1000000L)).as("chi2_micro"))
  }

  /**
   * All point pairs within `radius` (planar euclidean), found with uniform
   * grid blocking: cell side = radius, so a point's partners can only live
   * in its own or the 8 neighboring cells. The left side is replicated to
   * the 3×3 neighborhood (9 rows), the right side stays in its own cell,
   * and the match is a plain equi-join on (cellX, cellY) — each qualifying
   * pair appears exactly once (the right row's cell is unique). This is
   * the standard spatial self-join shape: shuffle on cell, no all-pairs.
   *
   * Cells holding more than `maxCellSize` points are dropped WHOLE from
   * both sides (quadratic-blowup guard for pathological point stacks —
   * same posture as the LSH bucket caps); the default never triggers at
   * gate scale, so the brute-force oracle stays exact.
   *
   * Output: (id_a, id_b, d2) with id_a < id_b and d2 = squared distance
   * (no sqrt/trig — the whole chain is IEEE mult/add, oracle-mirrorable).
   */
  def gridDistanceJoin(points: DataFrame, idCol: String, xCol: String,
      yCol: String, radius: Double, maxCellSize: Int = 1 << 20): DataFrame = {
    require(radius > 0, "radius must be positive")
    val p0 = points.select(col(idCol).as("id"),
        col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
      .withColumn("cx", floor(col("x") / lit(radius)).cast("long"))
      .withColumn("cy", floor(col("y") / lit(radius)).cast("long"))
    val cellCounts = p0.groupBy(col("cx"), col("cy"))
      .agg(count(lit(1)).as("__cn"))
      .filter(col("__cn") <= maxCellSize)
      .select(col("cx"), col("cy"))
    val p = p0.join(cellCounts, Seq("cx", "cy"), "left_semi")
    val offsets = for { ox <- -1 to 1; oy <- -1 to 1 } yield (ox, oy)
    val lhs = p
      .withColumn("__o", explode(array(offsets.map { case (ox, oy) =>
        struct(lit(ox).as("ox"), lit(oy).as("oy")) }: _*)))
      .select(col("id").as("id_a"), col("x").as("xa"), col("y").as("ya"),
        (col("cx") + col("__o.ox")).as("jx"), (col("cy") + col("__o.oy")).as("jy"))
    val rhs = p.select(col("id").as("id_b"), col("x").as("xb"),
      col("y").as("yb"), col("cx").as("jx"), col("cy").as("jy"))
    lhs.join(rhs, Seq("jx", "jy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("d2",
        (col("xa") - col("xb")) * (col("xa") - col("xb")) +
        (col("ya") - col("yb")) * (col("ya") - col("yb")))
      .filter(col("d2") <= lit(radius * radius))
      .select(col("id_a"), col("id_b"), col("d2"))
  }

  /**
   * Equi-join output-cardinality estimation by DETERMINISTIC key sampling
   * (the CBO/AQE primitive: |A ⋈ B| = Σ_k a_k·b_k): keep only join keys
   * with `xxhash64(key) mod rate == 0` — a coordinated sample, the SAME
   * keys on both sides, which is what makes the estimator unbiased for
   * joins (independent row samples would hit a_k·b_k/rate² and square the
   * variance) — count per surviving key on each side, and scale the
   * sampled Σ a_k·b_k back up by `rate`. Hash-based, so the "sample" is
   * reproducible run-to-run and engine-independent: no RNG state.
   *
   * Cost: two filtered scans + a rate-fold-smaller aggregate/join —
   * exactly the footprint a planner can afford before committing to a
   * 100 TB shuffle strategy.
   *
   * Output: one row (est_rows, sampled_keys).
   */
  def joinSizeEstimate(left: DataFrame, right: DataFrame, keyCol: String,
      rate: Int = 8): DataFrame = {
    require(rate >= 1, "rate must be >= 1")
    def sampledCounts(df: DataFrame, out: String): DataFrame = df
      .select(col(keyCol).as("k"))
      .filter(pmod(xxhash64(col("k")), lit(rate.toLong)) === 0L)
      .groupBy(col("k")).agg(count(lit(1)).as(out))
    sampledCounts(left, "a").join(sampledCounts(right, "b"), "k")
      .agg(coalesce(sum(col("a") * col("b")), lit(0L)).as("__s"),
        count(lit(1)).as("sampled_keys"))
      .select((col("__s") * lit(rate.toLong)).as("est_rows"),
        col("sampled_keys"))
  }

  /**
   * Pairwise association rules over (basket, item) transactions — the
   * market-basket staple: for every ordered pair A→B of items co-occurring
   * in ≥ `minPairCount` baskets, support = pairN/nBaskets, confidence =
   * pairN/count(A), lift = pairN·nBaskets/(count(A)·count(B)).
   *
   * Shape: distinct (basket, item) → per-basket self-join with item_a <
   * item_b (quadratic ONLY in basket size, and baskets over
   * `maxBasketItems` items are dropped whole — the Apriori-style guard),
   * pair counts shuffled on the pair, item counts broadcast back. The
   * ratios are exact-count divisions in a fixed double op order.
   *
   * Output: (ante, cons, pair_n, n_baskets, support, confidence, lift) —
   * both directions of each unordered pair.
   */
  def assocRules(tx: DataFrame, basketCol: String, itemCol: String,
      minPairCount: Long = 1L, maxBasketItems: Int = 100): DataFrame = {
    val items0 = tx.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct()
    val smallBaskets = items0.groupBy(col("basket"))
      .agg(count(lit(1)).as("__bn")).filter(col("__bn") <= maxBasketItems)
      .select(col("basket"))
    val items = items0.join(smallBaskets, Seq("basket"), "left_semi")
    val itemCnt = items.groupBy(col("item")).agg(count(lit(1)).as("item_n"))
    val nB = items.agg(countDistinct(col("basket")).as("n_baskets"))
    val a = items.select(col("basket"), col("item").as("ia"))
    val b = items.select(col("basket"), col("item").as("ib"))
    val pairs = a.join(b, Seq("basket")).filter(col("ia") < col("ib"))
      .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= minPairCount)
    val directed = pairs.select(col("ia").as("ante"), col("ib").as("cons"),
        col("pair_n"))
      .unionAll(pairs.select(col("ib").as("ante"), col("ia").as("cons"),
        col("pair_n")))
    directed
      .join(broadcast(itemCnt.select(col("item").as("ante"),
        col("item_n").as("ante_n"))), Seq("ante"))
      .join(broadcast(itemCnt.select(col("item").as("cons"),
        col("item_n").as("cons_n"))), Seq("cons"))
      .crossJoin(broadcast(nB))
      .select(col("ante"), col("cons"), col("pair_n"), col("n_baskets"),
        (dd(col("pair_n")) / dd(col("n_baskets"))).as("support"),
        (dd(col("pair_n")) / dd(col("ante_n"))).as("confidence"),
        ((dd(col("pair_n")) * dd(col("n_baskets"))) /
          (dd(col("ante_n")) * dd(col("cons_n")))).as("lift"))
  }

  /**
   * Welch's two-sample t-test (unequal variances) between groups `a` and
   * `b` of `groupCol`, over an INTEGER-scaled value column — the A/B-test
   * primitive. ONE scan computes both groups' exact moment sums
   * (n, Σv, Σv² as bigints via `sum(when(...))`, map-side combined), then
   * the statistic finishes in a fixed double tree the oracle mirrors:
   *   mᵢ = Σvᵢ/nᵢ,  s²ᵢ = (Σv²ᵢ − Σvᵢ²/nᵢ)/(nᵢ−1),
   *   t  = (m₁ − m₂) / sqrt(s²₁/n₁ + s²₂/n₂)
   * plus the Welch–Satterthwaite df. sqrt and / are IEEE
   * correctly-rounded, so identical op order → bit-identical t on any
   * engine. Output: one row (n_a, n_b, mean_a, mean_b, t_stat, df).
   *
   * Scale posture: a full scan reduced to ONE row of six bigints; the
   * test itself is driver-free arithmetic on that row.
   */
  /**
   * Deterministic half-sample bootstrap CI for the mean of an
   * integer-scaled value — uncertainty quantification in ONE scan with no
   * resampling shuffles: resample r (r < `b` ≤ 48) keeps a row iff bit r
   * of its id's md5-derived 60-bit hash is set (each bit an independent
   * fair coin, so each resample is a ~n/2 subsample; half-sampling is the
   * classic McCarthy balanced-half-sample estimator, and a hash tape makes
   * it deterministic/retry-stable like everything in [[Sampling]]).
   * All 2b moment sums accumulate in the SAME map-side-combined aggregate
   * row; the resample means sort in-plan (a b-element array) and the CI
   * bounds are the 2nd-smallest / 2nd-largest — ≈96% coverage at b=48.
   *
   * Output: one row (n, mean, ci_lo, ci_hi). Fixed double op order; the
   * oracle regenerates the identical 2b CASE-sums, so the doubles are
   * bit-identical.
   */
  def bootstrapMeanCI(df: DataFrame, idCol: Column, valueIntCol: Column,
      b: Int = 48): DataFrame = {
    require(b >= 4 && b <= 48, "b must be in [4, 48] (60 hash bits, 48 used)")
    val h = conv(substring(md5(idCol.cast("string")), 1, 15), 16, 10)
      .cast("long")
    val pre = df.select(h.as("__h"), valueIntCol.cast("long").as("__v"))
    val sums = (0 until b).flatMap { r =>
      val bit = expr(s"shiftright(__h, $r) & 1L")
      Seq(sum(col("__v") * bit).as(s"__s$r"), sum(bit).as(s"__n$r"))
    } ++ Seq(sum(col("__v")).as("__s"), count(lit(1)).as("n"))
    val base = pre.agg(sums.head, sums.tail: _*)
    val means = array((0 until b).map(r =>
      dd(col(s"__s$r")) / dd(col(s"__n$r"))): _*)
    base
      .withColumn("__ms", array_sort(means))
      .select(col("n"), (dd(col("__s")) / dd(col("n"))).as("mean"),
        element_at(col("__ms"), 2).as("ci_lo"),
        element_at(col("__ms"), b - 1).as("ci_hi"))
  }

  def welchTTest(df: DataFrame, groupCol: String, valueIntCol: Column,
      a: String, b: String): DataFrame = {
    def side(tag: String, g: String) = Seq(
      sum(when(col(groupCol) === g, lit(1L)).otherwise(lit(0L))).as(s"n_$tag"),
      sum(when(col(groupCol) === g, valueIntCol).otherwise(lit(0L))).as(s"s_$tag"),
      sum(when(col(groupCol) === g, valueIntCol * valueIntCol)
        .otherwise(lit(0L))).as(s"q_$tag"))
    val agg = side("a", a) ++ side("b", b)
    val base = df.agg(agg.head, agg.tail: _*)
    def mean(t: String) = dd(col(s"s_$t")) / dd(col(s"n_$t"))
    def varOverN(t: String) =
      ((dd(col(s"q_$t")) - dd(col(s"s_$t")) * dd(col(s"s_$t")) / dd(col(s"n_$t"))) /
        (dd(col(s"n_$t")) - lit(1.0))) / dd(col(s"n_$t"))
    base
      .withColumn("mean_a", mean("a")).withColumn("mean_b", mean("b"))
      .withColumn("__va", varOverN("a")).withColumn("__vb", varOverN("b"))
      .withColumn("t_stat",
        (col("mean_a") - col("mean_b")) / sqrt(col("__va") + col("__vb")))
      .withColumn("df",
        (col("__va") + col("__vb")) * (col("__va") + col("__vb")) /
          (col("__va") * col("__va") / (dd(col("n_a")) - lit(1.0)) +
            col("__vb") * col("__vb") / (dd(col("n_b")) - lit(1.0))))
      .select(col("n_a"), col("n_b"), col("mean_a"), col("mean_b"),
        col("t_stat"), col("df"))
  }
}
