package graft.ops

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("count-min estimates never undercount and are exact off-collision") {
    val rnd = new scala.util.Random(11)
    val keys = (1 to 5000).map(_ => rnd.nextInt(200).toLong)
    val df = keys.toDF("k").repartition(6)
    val cms = Sketches.countMin(df, "k", eps = 1e-4, confidence = 0.99, seed = 42)
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (k, c) =>
      val est = cms.estimateCount(k)
      assert(est >= c, s"CMS undercounted key $k: $est < $c")
      // width 2/eps = 20000 cells >> 200 keys: no collisions expected
      assert(est == c, s"unexpected collision for $k: $est != $c")
    }
    assert(cms.totalCount() == keys.size)
  }

  test("sketch build is deterministic across partitionings (fixed seed)") {
    val keys = (1L to 1000L).map(_ % 50)
    val a = Sketches.countMin(keys.toDF("k").repartition(3), "k", 1e-3, 0.95, 7)
    val b = Sketches.countMin(keys.toDF("k").repartition(11), "k", 1e-3, 0.95, 7)
    (0L until 50L).foreach(k => assert(a.estimateCount(k) == b.estimateCount(k)))
  }

  test("heavyHittersChecked reports exactly the keys above threshold, gated") {
    // 3 heavy keys (40, 30, 21 copies), 100 light singletons
    val keys = Seq.fill(40)(1L) ++ Seq.fill(30)(2L) ++ Seq.fill(21)(3L) ++
      (100L until 200L)
    val df = keys.toDF("k").repartition(5)
    val out = Sketches.heavyHittersChecked(spark, df, "k", minCount = 20L)
      .as[(Long, Long, Boolean, Boolean)].collect().toSeq
    assert(out == Seq((1L, 40L, true, true), (2L, 30L, true, true),
      (3L, 21L, true, true)))
  }
}
