package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

class StatsSpec extends SparkSpec {
  import spark.implicits._

  private def pearson(xs: Seq[Long], ys: Seq[Long]): Double = {
    val n = xs.size.toDouble
    val sx = xs.sum.toDouble; val sy = ys.sum.toDouble
    val sxx = xs.map(x => x * x).sum.toDouble
    val syy = ys.map(y => y * y).sum.toDouble
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum.toDouble
    (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
  }

  test("corrMatrix matches brute-force Pearson on seeded data, one row per pair") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 400).map { i =>
      val x = rnd.nextInt(1000).toLong
      (x, x * 2 + 3, rnd.nextInt(1000).toLong) // b = perfect linear in a
    }
    val df = rows.toDF("a", "b", "c")
    val got = Stats.corrMatrix(df, Seq("a", "b", "c"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(3))).toMap
    assert(got.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    assert(math.abs(got(("a", "b")) - 1.0) < 1e-12)
    val (as, cs) = (rows.map(_._1), rows.map(_._3))
    assert(math.abs(got(("a", "c")) - pearson(as, cs)) < 1e-12)
  }

  test("olsRegression recovers an exact line per group and isolates groups") {
    val g1 = (1L to 50L).map(x => ("g1", x, 3 * x + 5)) // slope 3, icept 5
    val g2 = (1L to 50L).map(x => ("g2", x, -2 * x + 7))
    val out = Stats.olsRegression((g1 ++ g2).toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val (s1, i1, r1) = out("g1")
    assert(math.abs(s1 - 3.0) < 1e-9 && math.abs(i1 - 5.0) < 1e-9 &&
      math.abs(r1 - 1.0) < 1e-12)
    val (s2, i2, _) = out("g2")
    assert(math.abs(s2 + 2.0) < 1e-9 && math.abs(i2 - 7.0) < 1e-9)
  }

  test("olsRegression: zero x-variance group yields nulls, not a crash") {
    val df = Seq(("g", 4L, 1L), ("g", 4L, 9L)).toDF("g", "x", "y")
    val r = Stats.olsRegression(df, "g", "x", "y").collect()(0)
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
  }

  test("zscoreOutliers flags only the planted extreme, per group") {
    // g1: 100 values near 50 plus one at 5000; g2: uniform junk, no plant
    val base = (1L to 100L).map(i => ("g1", i, 45L + (i % 11)))
    val plant = Seq(("g1", 999L, 5000L))
    val other = (1L to 100L).map(i => ("g2", 1000L + i, (i % 13) * 3L))
    val df = (base ++ plant ++ other).toDF("g", "id", "v")
    val got = Stats.zscoreOutliers(df, "g", "id", "v", z = 3.0)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("g1", 999L)))
  }

  test("chiSquare: perfectly dependent columns give chi2 = n*(k-1)*1e6 micro") {
    // b == a over k=4 uniform categories, n rows: chi2 = n*(k-1) exactly
    val n = 400
    val df = (0 until n).map(i => (s"c${i % 4}", s"c${i % 4}")).toDF("a", "b")
    val r = Stats.chiSquare(df, "a", "b").collect()(0)
    assert(r.getLong(0) == 4L) // only diagonal cells observed
    assert(r.getLong(1) == 9L) // dof (4-1)*(4-1)
    assert(r.getLong(2) == n.toLong * 3L * 1000000L)
  }

  test("chiSquare: independent uniform columns give chi2 = 0") {
    // every (a,b) combination equally frequent -> obs == exp in every cell
    val df = (for { a <- 0 until 3; b <- 0 until 5; _ <- 0 until 7 }
      yield (s"a$a", s"b$b")).toDF("a", "b")
    val r = Stats.chiSquare(df, "a", "b").collect()(0)
    assert(r.getLong(0) == 15L && r.getLong(1) == 8L && r.getLong(2) == 0L)
  }

  test("gridDistanceJoin equals brute force incl. cross-cell pairs") {
    val rnd = new scala.util.Random(23)
    val pts = (1L to 300L).map(i =>
      (i, rnd.nextInt(2000) / 100.0, rnd.nextInt(2000) / 100.0))
    val brute = (for {
      (ia, xa, ya) <- pts; (ib, xb, yb) <- pts if ia < ib
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) if d2 <= 1.0
    } yield (ia, ib)).toSet
    val got = Stats.gridDistanceJoin(
        pts.toDF("id", "x", "y").repartition(5), "id", "x", "y", radius = 1.0)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(got.length == got.distinct.length, "pair emitted twice")
    assert(got.toSet == brute)
    // sanity: blocking actually crossed cell borders
    assert(brute.nonEmpty)
  }

  test("gridDistanceJoin: overfull cells are dropped whole, rest survives") {
    val stack = (1L to 50L).map(i => (i, 5.05, 5.05)) // one hot cell
    val pair = Seq((100L, 20.0, 20.0), (101L, 20.1, 20.1))
    val df = (stack ++ pair).toDF("id", "x", "y")
    val got = Stats.gridDistanceJoin(df, "id", "x", "y", radius = 1.0,
      maxCellSize = 10).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((100L, 101L)))
  }

  test("assocRules: hand-computed support/confidence/lift, both directions") {
    // baskets: 1:{x,y} 2:{x,y} 3:{x} 4:{y,z} -> n=4, x:3 y:3 z:1, xy:2, yz:1
    val tx = Seq((1, "x"), (1, "y"), (2, "x"), (2, "y"), (2, "x"), // dup row
      (3, "x"), (4, "y"), (4, "z")).toDF("b", "i")
    val got = Stats.assocRules(tx, "b", "i")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    assert(got.keySet == Set(("x", "y"), ("y", "x"), ("y", "z"), ("z", "y")))
    val (pn, supp, conf, lift) = got(("x", "y"))
    assert(pn == 2L && supp == 0.5 && math.abs(conf - 2.0 / 3) < 1e-12 &&
      math.abs(lift - 2.0 * 4 / (3 * 3)) < 1e-12)
    val (_, _, confZy, liftZy) = got(("z", "y"))
    assert(confZy == 1.0 && math.abs(liftZy - 4.0 / 3) < 1e-12)
  }

  test("assocRules: baskets over maxBasketItems are dropped whole") {
    val mega = (0 until 20).map(i => (1, s"i$i"))
    val ok = Seq((2, "a"), (2, "b"), (3, "a"), (3, "b"))
    val got = Stats.assocRules((mega ++ ok).toDF("b", "i"), "b", "i",
        maxBasketItems = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSet == Set(("a", "b", 2L, 2L), ("b", "a", 2L, 2L)))
  }

  test("plan: gridDistanceJoin is an equi-join on cells — no nested loop") {
    val pts = (1L to 100L).map(i => (i, (i % 17).toDouble, (i % 23).toDouble))
    val plan = Stats.gridDistanceJoin(pts.toDF("id", "x", "y"), "id", "x", "y",
      radius = 1.0).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"spatial join fell back to an all-pairs plan:\n$plan")
  }

  test("plan: corrMatrix moment sums combine map-side (partial aggregation)") {
    val df = (1L to 100L).map(i => (i, i * 2, i % 7)).toDF("a", "b", "c")
    val plan = Stats.corrMatrix(df, Seq("a", "b", "c"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      s"expected partial aggregation before the exchange:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("joinSizeEstimate: rate=1 is exact; disjoint keys estimate 0") {
    val left = Seq(1L, 1L, 1L, 2L, 3L).toDF("k")   // a = {1:3, 2:1, 3:1}
    val right = Seq(1L, 2L, 2L, 5L).toDF("k")      // b = {1:1, 2:2, 5:1}
    val r = Stats.joinSizeEstimate(left, right, "k", rate = 1).collect()(0)
    assert(r.getLong(0) == 3L * 1 + 1L * 2) // sum over shared keys {1,2}
    assert(r.getLong(1) == 2L)
    val none = Stats.joinSizeEstimate(left,
      Seq(9L).toDF("k"), "k", rate = 1).collect()(0)
    assert(none.getLong(0) == 0L && none.getLong(1) == 0L)
  }

  test("joinSizeEstimate: sampled estimate is deterministic and scaled") {
    val df = (1L to 2000L).map(k => k % 200).toDF("k") // 200 keys x 10 rows
    val a = Stats.joinSizeEstimate(df, df, "k", rate = 4).collect()(0)
    val b = Stats.joinSizeEstimate(df.repartition(7), df, "k", rate = 4)
      .collect()(0)
    assert((a.getLong(0), a.getLong(1)) == (b.getLong(0), b.getLong(1)))
    // uniform multiplicities: est = rate x sampledKeys x 10x10 exactly
    assert(a.getLong(1) > 0 && a.getLong(0) == 4L * a.getLong(1) * 100L)
  }

  test("knnClassify: majority label wins, ties break to smallest label") {
    // query 0 at origin-ish; labels: two 1s and one 2 among 3-NN -> 1.
    // query 10: exactly balanced 1-vs-2 votes in 2-NN -> smaller label 1.
    def v(parts: Float*): Array[Float] = parts.toArray
    val rows = Seq(
      (0L, v(1f, 0f), 9), // query (own label ignored — leave-one-out)
      (1L, v(0.99f, 0.01f), 1), (2L, v(0.98f, 0.02f), 1),
      (3L, v(0.97f, 0.03f), 2), (4L, v(-1f, 0f), 2),
      (10L, v(0f, 1f), 9),
      (11L, v(0.01f, 0.99f), 2), (12L, v(0.02f, 0.98f), 1))
    val df = rows.toDF("vec_id", "embedding", "label")
    val q = df.filter($"vec_id" === 0L || $"vec_id" === 10L)
    val got3 = Similarity.knnClassify(df, q.filter($"vec_id" === 0L), k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got3 == Seq((0L, 1, 2L)))
    val got2 = Similarity.knnClassify(df, q.filter($"vec_id" === 10L), k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got2 == Seq((10L, 1, 1L, 2L))) // 1 vote each; label 1 < label 2
  }

  test("bootstrapMeanCI: locally-replayed resample means, invariant to partitioning") {
    val rows = Seq.tabulate(500)(i => (i.toLong, (i * 13 % 97).toLong))
    val df = rows.toDF("id", "v")
    def hash(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(8).map(b => f"${b & 0xff}%02x").mkString.take(15), 16)
    }
    val b = 16
    val means = (0 until b).map { r =>
      val kept = rows.filter { case (id, _) => ((hash(id) >> r) & 1L) == 1L }
      kept.map(_._2).sum.toDouble / kept.size.toDouble
    }.sorted
    val overall = rows.map(_._2).sum.toDouble / rows.size
    def run(parts: Int) = Stats.bootstrapMeanCI(
      df.repartition(parts), $"id", $"v", b)
      .as[(Long, Double, Double, Double)].collect().head
    val r1 = run(1)
    assert(r1 === ((500L, overall, means(1), means(b - 2))))
    assert(run(7) === r1)
  }

  test("welchTTest: hand-computed statistic, invariant to partitioning") {
    // a: {10, 20, 30}; b: {40, 40, 70, 50} (integer-scaled values)
    val rows = Seq(("a", 10L), ("a", 20L), ("a", 30L),
      ("b", 40L), ("b", 40L), ("b", 70L), ("b", 50L))
    def expected: (Double, Double) = {
      val (na, nb) = (3.0, 4.0)
      val (sa, sb) = (60.0, 200.0)
      val (qa, qb) = (1400.0, 10600.0)
      val (ma, mb) = (sa / na, sb / nb)
      val va = ((qa - sa * sa / na) / (na - 1.0)) / na
      val vb = ((qb - sb * sb / nb) / (nb - 1.0)) / nb
      val t = (ma - mb) / math.sqrt(va + vb)
      val dfree = (va + vb) * (va + vb) /
        (va * va / (na - 1.0) + vb * vb / (nb - 1.0))
      (t, dfree)
    }
    def run(parts: Int) = Stats.welchTTest(
      rows.toDF("g", "v").repartition(parts), "g", $"v", "a", "b")
      .as[(Long, Long, Double, Double, Double, Double)].collect().head
    val r1 = run(1)
    val (t, dfree) = expected
    assert(r1 === ((3L, 4L, 20.0, 50.0, t, dfree)))
    assert(run(5) === r1) // exact bigint moments → partitioning-invariant
  }
}
