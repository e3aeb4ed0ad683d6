package graft.apps

import java.nio.file.Files

import graft.sources.Bus
import graft.sources.lake.GraftLake
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/**
 * Composed ingestion throughput: publish n records to the runnable log
 * bus, stream them through foreachBatch into a [[GraftLake]] table under
 * the (appId, epochId) exactly-once fence, and measure the drain — the
 * "message log in, ACID table out" rate a continuous corpus store
 * sustains all day. Counterpart of [[MediationBench]] (which measures
 * the stateful notification pipeline); here the cost is the bus decode +
 * lake commit protocol (stage, footer stats, fenced link).
 */
object LakeIngestBench {

  /** Returns (rowsLanded, seconds, recordsPerSec). */
  def run(spark: SparkSession, n: Long, partitions: Int = 8): (Long, Double, Double) = {
    val base = Files.createTempDirectory("lakeingest").toString
    val tbl = s"$base/table"; val ckpt = s"$base/ckpt"
    spark.range(n).select(
        pmod(col("id"), lit(partitions)).cast("int").as("partition"),
        col("id").cast("string").cast("binary").as("value"))
      .write.format(Bus.logBusFmt)
      .option("root", s"$base/bus").option("topic", "ingest")
      .option("partitions", partitions.toString)
      .mode("append").save()
    GraftLake.create(
      spark.range(0).select(col("id"), lit(0L).as("landed_epoch")), tbl)

    val t0 = System.nanoTime()
    val q = spark.readStream.format(Bus.logBusFmt)
      .option("root", s"$base/bus").option("topic", "ingest")
      .option("partitions", partitions.toString)
      .load()
      .select(col("value").cast("string").cast("long").as("id"))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        GraftLake.appendStreamBatch(
          batch.withColumn("landed_epoch", lit(epochId)), tbl,
          "lake-ingest-bench", epochId)
        ()
      }
      .start()
    q.awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9
    val rows = GraftLake.read(spark, tbl).count()
    (rows, secs, rows / secs)
  }

  /** Prints one JSON line. Env knobs: SPARK_GRAFT_LAKE_N (default
    * 500000), SPARK_GRAFT_CPUS (default 32). */
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_LAKE_N", "500000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (rows, secs, rate) = run(spark, n)
    println(f"""{"metric":"lake_ingest","records":$n,"rows_out":$rows,""" +
      f""""seconds":$secs%.2f,"records_per_sec":$rate%.0f,""" +
      f""""completed":${rows == n}}""")
    spark.stop()
  }
}
