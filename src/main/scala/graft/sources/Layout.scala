package graft.sources

import org.apache.spark.sql.{Column, DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Data-layout management: hive-partitioned writes with bounded file sizes,
 * and the read-side proof that the layout pays off (partition pruning).
 *
 * At 100 TB the table LAYOUT is the first-order performance decision — a
 * date/key-partitioned corpus turns "scan everything and filter" into
 * "never open the irrelevant 99%" (the reference leans on the same idea
 * with its date-directory GCS layout and existence-pruned path lists,
 * mediation/MediationService.scala:274-303; Spark's hive-style
 * `partitionBy` is the engine-native version, with pruning planned from
 * the filter instead of hand-built path lists).
 */
object Layout {

  /**
   * Write `df` hive-partitioned by `partitionCols` with at most
   * `maxRecordsPerFile` rows per file. The pre-shuffle `repartition` on the
   * partition columns routes each output partition's rows to one task
   * (without it, EVERY task holding a few rows of every partition emits one
   * small file per partition — the classic small-files explosion:
   * tasks × partitions files); `maxRecordsPerFile` then re-splits oversized
   * partitions so a hot date cannot produce a single multi-GB file. AQE
   * coalesces the shuffle's empty/small slots, so partition count stays
   * bounded by the data, not by `spark.sql.shuffle.partitions`.
   */
  def writePartitioned(df: DataFrame, dir: String, partitionCols: Seq[String],
      maxRecordsPerFile: Long = 5000000L): Unit = {
    df.repartition(partitionCols.map(col): _*)
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(dir)
  }

  /** Read back a partitioned layout. Partition-column filters on the result
    * prune directories at PLANNING time (visible as `PartitionFilters` in
    * the scan node — asserted in `LayoutSpec`). */
  def readPartitioned(spark: SparkSession, dir: String): DataFrame = {
    Tables.configure(spark)
    spark.read.parquet(dir)
  }

  /**
   * Number of live data files under a layout — the small-files health
   * metric a compaction job watches. Driver-side Hadoop-FS metadata walk
   * (like [[Tables.existingPaths]]), no data scan.
   */
  def dataFileCount(spark: SparkSession, dir: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(conf)
    val it = fs.listFiles(root, true)
    var n = 0L
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) n += 1
    }
    n
  }

  /**
   * Compact a partitioned layout in place-adjacent fashion: read, re-route
   * one task per partition, rewrite to `outDir` with the same partition
   * scheme. The cure for a layout that accumulated small files through
   * many incremental appends (the streaming-ingest case).
   */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      partitionCols: Seq[String], maxRecordsPerFile: Long = 5000000L): Unit =
    writePartitioned(readPartitioned(spark, inDir), outDir, partitionCols,
      maxRecordsPerFile)
}
