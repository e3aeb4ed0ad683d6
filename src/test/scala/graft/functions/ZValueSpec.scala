package graft.functions

import graft.SparkSpec
import graft.sources.Layout
import graft.sources.lake.GraftLake
import org.apache.spark.sql.functions._

/**
 * N-column Morton clustering: the native [[ZValueN]] interleave, the
 * [[QuantileBucket]] range-id expression that makes it distribution-free,
 * and the end-to-end proof that `OPTIMIZE ... ZORDER BY (x, y, z)` lets a
 * 3-column box predicate prune most files from footer stats alone.
 */
class ZValueSpec extends SparkSpec {

  import spark.implicits._

  test("ZValueN.spread places bit i at bit i*n; 2-column form is " +
    "bit-identical to the magic-number zValue2") {
    assert(ZValueN.spread(1L, 3, 16) == 1L)
    assert(ZValueN.spread(2L, 3, 16) == 8L)         // bit 1 -> bit 3
    assert(ZValueN.spread(5L, 2, 16) == 17L)        // bits 0,2 -> 0,4
    assert(ZValueN.spread(0xFFFFL, 4, 16) == 0x1111111111111111L)
    assert(ZValueN.spread(-1L, 2, 16) == 0x55555555L) // masked to 16 bits

    val df = spark.range(0, 4096).select(
      (col("id") * 2654435761L % 65536).as("x"),
      (col("id") * 40503L % 65536).as("y"))
    val mismatches = df.select(
      ZValueKit.zValueN(Seq(col("x"), col("y")), 16).as("zn"),
      Layout.zValue2(col("x"), col("y")).as("z2"))
      .filter(col("zn") =!= col("z2")).count()
    assert(mismatches == 0, "2-D ZValueN must replay zValue2 bit-exactly")
  }

  test("ZValueN: 3-column interleave is monotone per column and null-safe") {
    // fixing two coordinates, the z-value is strictly monotone in the third
    val rows = spark.range(0, 64).select(
      ZValueKit.zValueN(Seq(col("id"), lit(7L), lit(42L)), 6).as("z"))
      .as[Long].collect()
    assert(rows.sliding(2).forall(p => p(0) < p(1)))
    // null in any column -> null z (layout helpers keep nulls together)
    val n = spark.range(1).select(
      ZValueKit.zValueN(Seq(lit(1L), lit(null).cast("long")), 8).as("z"))
      .filter(col("z").isNull).count()
    assert(n == 1L)
  }

  test("ZValueN and QuantileBucket run inside whole-stage codegen (no " +
    "interpreted fallback in the hot clustering path)") {
    val df = spark.range(0, 100).select(
      ZValueKit.zValueN(Seq(
        ZValueKit.quantileBucket(col("id"), Seq(25.0, 50.0, 75.0)),
        col("id") % 7), bits = 4).as("z"))
    // the "*(n)" prefix marks operators fused into a WholeStageCodegen
    // stage; an interpreted fallback would print a bare "Project"
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"),
      s"clustering expressions must codegen:\n$plan")
    assert(df.count() == 100)
  }

  test("QuantileBucket: binary-search id = count of boundaries <= value") {
    val b = Array(10.0, 20.0, 30.0)
    assert(QuantileBucket.bucket(5.0, b) == 0L)
    assert(QuantileBucket.bucket(10.0, b) == 1L)
    assert(QuantileBucket.bucket(25.0, b) == 2L)
    assert(QuantileBucket.bucket(30.0, b) == 3L)
    assert(QuantileBucket.bucket(1e9, b) == 3L)
    assert(QuantileBucket.bucket(Double.NaN, b) == 3L)
    // codegen path agrees with the oracle above
    val got = spark.createDataset(Seq(5.0, 10.0, 25.0, 30.0, 1e9))
      .select(ZValueKit.quantileBucket(col("value"), b.toIndexedSeq).as("q"))
      .as[Long].collect().toSeq
    assert(got == Seq(0L, 1L, 2L, 3L, 3L))
  }

  test("clusteredZValue buckets a SKEWED column near-uniformly (the " +
    "range-id property that keeps interleaving meaningful)") {
    // x is heavily skewed (cubed residues), y uniform
    val df = spark.range(0, 20000).select(
      (col("id") % 181 * (col("id") % 181) * (col("id") % 181)).as("x"),
      (col("id") % 512).as("y"))
    val z = Layout.clusteredZValue(df, Seq("x", "y"), bits = 6)
    // bucket occupancy of the top-3 z-bits: near-uniform despite skew
    val shares = df.select(shiftright(z, 9).as("b")) // top 3 interleaved bits
      .groupBy("b").count().select("count").as[Long].collect()
    assert(shares.length >= 6, s"skew collapsed buckets: ${shares.length}")
    assert(shares.max.toDouble / shares.min < 3.0,
      s"quantile ids must be near-uniform under skew: ${shares.toSeq}")
  }

  test("OPTIMIZE ZORDER BY (x, y, z): a 3-column box predicate prunes to " +
    "a small file subset with rows intact") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_zorder3").toString + "/t"
    // 32^3 grid; created deliberately scattered (hash-partitioned) so the
    // pre-zorder layout has NO per-file locality on any column
    val grid = spark.range(0, 32768).select(
      (col("id") % 32).as("x"),
      (shiftright(col("id"), 5) % 32).as("y"),
      (shiftright(col("id"), 10) % 32).as("z"),
      col("id").as("payload"))
      .repartition(16, col("payload"))
    spark.sql("DROP TABLE IF EXISTS lake_z3")
    grid.createOrReplaceTempView("lake_z3_src")
    spark.sql(
      s"""CREATE TABLE lake_z3 USING `graft-lake` OPTIONS (path '$dir')
         |AS SELECT * FROM lake_z3_src""".stripMargin)
    try {
      val box = col("x").between(0, 7) && col("y").between(8, 15) &&
        col("z").between(16, 23)
      val expected = (0L until 32768L).map(i => (i % 32, i / 32 % 32, i / 1024 % 32, i))
        .filter(t => t._1 <= 7 && t._2 >= 8 && t._2 <= 15 && t._3 >= 16 && t._3 <= 23)
        .map(_._4).sorted

      // scattered layout: the box prunes (almost) nothing
      val (_, before, totalBefore) = GraftLake.scanFiltered(spark, dir, box)
      assert(before > totalBefore / 2,
        s"scattered layout should not prune: $before/$totalBefore")

      val v = spark.sql(
        s"OPTIMIZE lake_z3 ZORDER BY (x, y, z) INTO 64 FILES").head().getLong(0)
      assert(v == 1L)

      val (df, after, total) = GraftLake.scanFiltered(spark, dir, box)
      assert(total.toInt == 64)
      assert(after <= total / 4,
        s"3-D clustering must prune the box scan: opened $after of $total")
      assert(df.select("payload").as[Long].collect().sorted.toSeq == expected)
    } finally spark.sql("DROP TABLE lake_z3")
  }
}
