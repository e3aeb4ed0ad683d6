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

  test("KLL aggregator: merged quantiles within the sketch's rank-error bound") {
    // known distribution: 0..99999 uniform => quantile q ~ 100000*q
    val df = spark.range(100000L).toDF("v").repartition(8)
    val out = Sketches.kllQuantilesChecked(spark, df, "v",
      Seq(0.1, 0.5, 0.9)).as[(Long, Long, Boolean)].collect().toSeq
    assert(out.map(_._1) == Seq(1000L, 5000L, 9000L))
    assert(out.forall(r => r._2 == 100000L && r._3))
  }

  test("KLL buffer survives serialization (exchange boundary round trip)") {
    val sk = org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(200)
    (1 to 1000).foreach(i => sk.update(i.toDouble))
    val buf = new Sketches.KllBuf(sk)
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos); oos.writeObject(buf); oos.close()
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[Sketches.KllBuf]
    assert(back.sk.getN == 1000L)
    assert(math.abs(back.sk.getQuantile(0.5) - 500.0) <= 50.0)
  }
}
