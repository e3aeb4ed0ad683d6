package graft.sources.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Inline auto-compaction latency (measured, VERDICT r12 item 3): with
 * `autoCompact = true`, the append that tips the small-file census over
 * the threshold runs a bare OPTIMIZE INSIDE the append call — so the
 * tipping writer's latency is the interesting number, especially on a
 * table with a LARGE small-file backlog (a converted table, a burst of
 * tiny streaming batches). r13 caps one inline run at
 * [[GraftLake.AutoCompactMaxVictims]] (64) victims, smallest first:
 * the tipping append pays a bounded fold and the backlog amortizes
 * across subsequent appends instead.
 *
 * This bench builds a table of B small files, flips autoCompact on, and
 * times (a) a plain append BEFORE the property is set (baseline), (b)
 * the TIPPING append with the cap (what ships), (c) an explicit
 * uncapped OPTIMIZE of the remaining backlog (what the cap avoided
 * inlining). Run: `sbt "runMain graft.sources.lake.LakeAutoCompactBench"`.
 *
 * Committed figures (local[8], ~100-row small files): plain append
 * 0.15–0.19 s; tipping append with the cap 0.56–0.62 s, folding
 * exactly ~62 files inline, INVARIANT from a 128- to a 256-file
 * backlog; the uncapped fold of the remainder instead GROWS with the
 * backlog (0.41 s at 128 → 0.79 s at 256, and at a converted table's
 * 10⁴ files it would be the whole table's fold) — which is exactly
 * what the cap keeps out of a single writer's append path.
 */
object LakeAutoCompactBench {

  def measure(spark: SparkSession, backlog: Int): (Double, Double, Double, Int) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ac_bench")
      .toString + "/t"
    GraftLake.create(spark.range(0, 100).select(col("id"), col("id").as("v")),
      dir, checkpointEvery = 64)
    (1 to backlog).foreach { i =>
      spark.range(i * 1000L, i * 1000L + 100)
        .select(col("id"), col("id").as("v")).coalesce(1)
        .write.format("graft-lake").mode("append").save(dir)
    }
    def appendOnce(tag: Long): Double = {
      val t0 = System.nanoTime()
      spark.range(tag, tag + 100).select(col("id"), col("id").as("v"))
        .coalesce(1).write.format("graft-lake").mode("append").save(dir)
      (System.nanoTime() - t0) / 1e9
    }
    val plainS = appendOnce(90000000L) // autoCompact off: pure append
    GraftLake.setProperties(spark, dir, Map("autoCompact" -> "true"))
    val filesBefore = GraftLake.snapshot(spark, dir).files.size
    val tipS = appendOnce(91000000L) // tips the census: capped inline fold
    val filesAfterTip = GraftLake.snapshot(spark, dir).files.size
    require(filesAfterTip < filesBefore, "the tipping append must compact")
    GraftLake.setProperties(spark, dir, Map.empty, unsets = Seq("autoCompact"))
    val t1 = System.nanoTime()
    GraftLake.optimize(spark, dir) // uncapped: the fold the cap avoided
    val fullS = (System.nanoTime() - t1) / 1e9
    require(GraftLake.read(spark, dir).count() == 100L * (backlog + 3))
    (plainS, tipS, fullS, filesBefore - filesAfterTip)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("lake-autocompact-bench").master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      measure(spark, 32) // warmup
      val rows = Seq(128, 256).map { b =>
        val (plain, tip, full, folded) = measure(spark, b)
        val line = f"""{"backlog":$b,"plain_append_s":$plain%.2f,""" +
          f""""tipping_append_s":$tip%.2f,"uncapped_optimize_s":$full%.2f,""" +
          f""""files_folded_inline":$folded}"""
        println(line)
        line
      }
      println(s"""{"metric":"lake_autocompact_inline","points":[${rows.mkString(",")}]}""")
    } finally spark.stop()
  }
}
