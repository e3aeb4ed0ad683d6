package graft.streaming

import graft.ops.Cdc
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/**
 * Streaming snapshot maintenance from a CDC changelog — the unbounded half
 * of [[graft.ops.Cdc.applyChangelog]]: change events land as files, every
 * micro-batch folds them into a persistent keyed snapshot. This is the
 * lakehouse MERGE loop (what a Delta/Iceberg `MERGE INTO` schedule does)
 * built on plain parquet + deterministic layout.
 *
 * Layout: `dir/v=<version>/__bucket=<b>/…parquet`, where `__bucket` =
 * `pmod(xxhash64(key), nBuckets)` — a STABLE hash partitioning of the key
 * space. A batch rewrites ONLY the buckets that contain changed keys; the
 * current snapshot is, per bucket, the newest version that wrote it (a
 * bucket whose rewrite came out EMPTY — every key deleted — is recorded as
 * an empty marker directory, so stale data in older versions cannot
 * resurrect). That is the whole scale story: a nightly changelog touching
 * 0.1% of keys rewrites ~min(nBuckets, changes) buckets, not a 100 TB
 * table — rewrite cost is proportional to the changed-key footprint, while
 * the naive full-snapshot rewrite rescans the world per batch.
 *
 * Idempotent under micro-batch replay: version = the Structured Streaming
 * batch id, written with `mode(overwrite)` into its own `v=<id>` directory,
 * and the previous state is read from versions STRICTLY BELOW the current
 * batch id — a replayed epoch overwrites its own torn output and never
 * reads it as input (the same replay-exclusion contract as
 * [[CorpusIngest.admitBatch]]).
 *
 * Old versions accumulate (they are the time-travel/rollback surface);
 * [[compact]] folds the live buckets into one version when the metadata
 * listing grows, after which older directories can be archived.
 */
object CdcStream {

  /** `keyCols`/`seqCols`/`opCol`/`deleteOp` as in [[Cdc.applyChangelog]];
    * `nBuckets` fixes the snapshot's hash layout FOREVER (changing it
    * requires a full rewrite), so size it for the target table: ~(table
    * size / healthy-file-size) at the horizon scale.
    */
  case class Config(keyCols: Seq[String], seqCols: Seq[String],
      opCol: String = "op", deleteOp: String = "D", nBuckets: Int = 16)

  private def bucketExpr(cfg: Config) =
    pmod(xxhash64(cfg.keyCols.map(col): _*), lit(cfg.nBuckets.toLong))

  private def hadoopFs(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Committed versions, ascending: (version, bucket → has-data-files).
    * An empty marker bucket (deleted-everything rewrite) lists with
    * `false`. Driver-side metadata listing only, like the reference's
    * existence-pruned path scan (utils/GCSCommonUtilsInterim.scala:11-40).
    */
  private def versionDirs(spark: SparkSession,
      dir: String): Seq[(Long, Map[Long, Boolean])] = {
    val (fs, p) = hadoopFs(spark, dir)
    if (!fs.exists(p)) return Seq.empty
    fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map { s =>
        val v = s.getPath.getName.stripPrefix("v=").toLong
        val buckets = fs.listStatus(s.getPath).toSeq
          .filter(b => b.isDirectory && b.getPath.getName.startsWith("__bucket="))
          .map { b =>
            val hasData = fs.listStatus(b.getPath)
              .exists(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
            (b.getPath.getName.stripPrefix("__bucket=").toLong, hasData)
          }.toMap
        (v, buckets)
      }
      .filter(_._2.nonEmpty)
      .sortBy(_._1)
  }

  /** bucket → (newest version strictly below `beforeExclusive`, has-data). */
  private def latestPerBucket(spark: SparkSession, dir: String,
      beforeExclusive: Long): Map[Long, (Long, Boolean)] =
    versionDirs(spark, dir).filter(_._1 < beforeExclusive)
      .foldLeft(Map.empty[Long, (Long, Boolean)]) { case (m, (v, bs)) =>
        m ++ bs.map { case (b, hasData) => b -> (v, hasData) }
      }

  /** Union of each requested bucket's newest state below `beforeExclusive`
    * — one pruned read per contributing version directory (partition
    * pruning on `__bucket` keeps skipped buckets at metadata cost), or None
    * when no requested bucket has data.
    */
  private def readAsOf(spark: SparkSession, dir: String, beforeExclusive: Long,
      restrictTo: Option[Set[Long]]): Option[DataFrame] = {
    val lpb = latestPerBucket(spark, dir, beforeExclusive)
      .filter { case (b, (_, hasData)) =>
        hasData && restrictTo.forall(_.contains(b))
      }
    if (lpb.isEmpty) return None
    val byVersion = lpb.toSeq.groupBy(_._2._1).view
      .mapValues(_.map(_._1)).toSeq
    Some(byVersion.map { case (v, buckets) =>
      spark.read.parquet(s"$dir/v=$v")
        .filter(col("__bucket").isin(buckets: _*))
    }.reduce(_ unionByName _).drop("__bucket"))
  }

  /** The current snapshot (or as of strictly below `beforeVersion`), or
    * None if nothing has been written.
    */
  def snapshot(spark: SparkSession, dir: String,
      beforeVersion: Long = Long.MaxValue): Option[DataFrame] =
    readAsOf(spark, dir, beforeVersion, restrictTo = None)

  /** Bootstrap the snapshot from a bounded read (version -1). */
  def seed(snapshot: DataFrame, dir: String, cfg: Config): Unit =
    write(snapshot, snapshot.sparkSession, dir, -1L, cfg,
      expectBuckets = Set.empty)

  /** One partitionBy job for the data, then empty marker dirs for any
    * changed bucket whose rewrite produced no rows (parquet cannot write
    * an empty partition, but the listing must know the bucket's newest
    * state is "empty").
    */
  private def write(df: DataFrame, spark: SparkSession, dir: String,
      version: Long, cfg: Config, expectBuckets: Set[Long]): Unit = {
    df.withColumn("__bucket", bucketExpr(cfg))
      .write.partitionBy("__bucket").mode("overwrite")
      .parquet(s"$dir/v=$version")
    val (fs, _) = hadoopFs(spark, dir)
    expectBuckets.foreach { b =>
      val bp = new org.apache.hadoop.fs.Path(s"$dir/v=$version/__bucket=$b")
      if (!fs.exists(bp)) fs.mkdirs(bp)
    }
  }

  /** Apply one changelog micro-batch: rewrite exactly the buckets holding
    * changed keys. Callable from any batch context (backfills, tests).
    */
  def applyBatch(changes: DataFrame, batchId: Long, dir: String,
      cfg: Config): Unit = {
    val spark = changes.sparkSession
    if (changes.isEmpty) return
    val payloadCols = changes.columns
      .filterNot(c => cfg.seqCols.contains(c) || c == cfg.opCol)
    // the handful of touched bucket ids (≤ nBuckets) is genuinely
    // driver-sized: it DRIVES the metadata pruning below
    val changedBuckets = changes.select(bucketExpr(cfg).as("__bucket"))
      .distinct().collect().map(_.getLong(0)).toSet
    val emptyPrev = changes.filter(lit(false)).select(payloadCols.map(col): _*)
    val prev = readAsOf(spark, dir, beforeExclusive = batchId,
      restrictTo = Some(changedBuckets)).getOrElse(emptyPrev)
    val next = Cdc.applyChangelog(prev, changes, cfg.keyCols, cfg.seqCols,
      cfg.opCol, cfg.deleteOp)
    // localCheckpoint severs the merge plan from the version dirs the
    // write is about to extend, and stops the write re-executing it
    write(next.localCheckpoint(eager = true), spark, dir, batchId, cfg,
      expectBuckets = changedBuckets)
  }

  /** Fold all live buckets into one new version, so the per-bucket
    * newest-version map points at a single directory and older versions
    * become archivable.
    */
  def compact(spark: SparkSession, dir: String, cfg: Config): Unit = {
    val vs = versionDirs(spark, dir)
    if (vs.isEmpty) return
    snapshot(spark, dir).foreach { s =>
      val allBuckets = vs.flatMap(_._2.keys).toSet
      write(s.localCheckpoint(eager = true), spark, dir, vs.last._1 + 1L,
        cfg, expectBuckets = allBuckets)
    }
  }

  /** Watch `inputDir` for changelog file drops and maintain the snapshot. */
  def start(spark: SparkSession, inputDir: String, snapshotDir: String,
      checkpointDir: String, schema: StructType, cfg: Config,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .writeStream
      .queryName("cdc-snapshot-maintain")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, snapshotDir, cfg)
        ()
      }
      .start()
}
