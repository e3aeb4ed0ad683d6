package graft

import graft.apps.DataGen
import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Skewed-vs-uniform stress bench for the dedup family (VERDICT r5 item 3):
 * times each operator on a corpus where one viral document is 20% of all
 * rows (simultaneously a hot dedup key, a hot MinHash bucket, and a hot
 * SimHash chunk bucket) against a same-size uniform control. Also times the
 * row_number-window formulation of exact dedup that [[Dedup.exactDedup]]
 * deliberately does NOT use, to quantify the single-task-straggler cost the
 * min_by aggregate avoids.
 *
 * Usage: SPARK_GRAFT_SKEW_N=200000 sbt "runMain graft.SkewBench"
 * Prints one markdown table row per (corpus, op) and a final JSON line.
 */
object SkewBench {

  private def time(f: => Long): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  /** The window formulation exactDedup replaced — kept here (bench-only) as
    * the straggler baseline.
    */
  private def windowDedup(df: DataFrame, key: String, order: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(key)).orderBy(col(order))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_SKEW_N", "200000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // materialize both corpora to parquet so every timed op pays the same
    // scan and none of the generation
    val skewDir = "target/skewbench/skewed"
    val unifDir = "target/skewbench/uniform"
    DataGen.skewedDocuments(spark, n, hotFrac = 0.2)
      .write.mode("overwrite").parquet(skewDir)
    DataGen.uniformDocuments(spark, n).write.mode("overwrite").parquet(unifDir)

    def ops(docs: DataFrame): Seq[(String, () => Long)] = {
      val hashed = docs.withColumn("__h", md5(col("text").cast("binary")))
      Seq(
        "exact_dedup_min_by" -> (() =>
          Dedup.exactDedup(hashed, Seq("__h"), Seq("doc_id")).count()),
        "exact_dedup_window" -> (() =>
          windowDedup(hashed, "__h", "doc_id").count()),
        "minhash_candidates_capped" -> (() =>
          Dedup.minhashCandidatePairs(docs, "doc_id", "text",
            numHashes = 128, shingleLen = 5, bands = 16, oph = true).count()),
        "simhash_pairs_capped" -> (() =>
          Dedup.simhashNearDupPairs(docs, "doc_id", "text").count()))
    }

    val results = for {
      (corpus, dir) <- Seq("skewed" -> skewDir, "uniform" -> unifDir)
      (op, run) <- ops(spark.read.parquet(dir))
    } yield {
      run() // warm codegen + page cache; timed run below
      val sec = time(run())
      println(f"| $corpus%-7s | $op%-26s | $sec%8.2f s |")
      (s"${corpus}_$op", sec)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"skewbench","n":$n,"unit":"sec","queries":$qs}""")
    spark.stop()
  }
}
