package graft.apps

import java.io.File
import java.nio.file.Files

import graft.sources.lake.GraftLake
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Write amplification of point deletes, copy-on-write vs merge-on-read:
 * the number that justifies deletion vectors at 100 TB. A CoW point
 * delete rewrites the ENTIRE victim parquet file to remove one row, so
 * its cost scales with file size (at a healthy 128 MB file target, one
 * GDPR-style row erasure writes ~128 MB); a MoR delete writes a
 * roaring-bitmap sidecar of the deleted positions — tens of BYTES —
 * regardless of file size. Same victim-finding plan on both paths
 * (footer-stats prune), so the delta is purely the write side.
 *
 * Measured per delete from the transaction log itself: CoW bytes = the
 * replacement AddFiles' bytes; MoR bytes = the new DV sidecars' on-disk
 * size. Reports mean/p99/max over K random point deletes on each of two
 * table COPIES built from the same rows (same files, same layout).
 */
object LakeDvBench {

  final case class Amp(mean: Double, p99: Double, max: Double)

  private def stats(xs: Seq[Long]): Amp = {
    val s = xs.sorted
    Amp(xs.sum.toDouble / xs.size,
      s((0.99 * (s.size - 1)).round.toInt).toDouble, s.last.toDouble)
  }

  private def mkTable(spark: SparkSession, n: Long, files: Int): String = {
    val dir = Files.createTempDirectory("lakedv_bench").toString + "/t"
    GraftLake.create(
      spark.range(n).select(col("id"), (col("id") % 97).as("score"),
        concat(lit("payload-string-of-some-size-"), col("id")).as("payload"))
        .repartitionByRange(files, col("id")), dir)
    dir
  }

  private def sidecarBytes(dir: String, paths: Seq[String]): Long =
    paths.map(p => new File(dir, p).length()).sum

  /** Returns (cowBytesPerDelete, morBytesPerDelete, cowSecs, morSecs). */
  def run(spark: SparkSession, n: Long, files: Int, k: Int)
      : (Amp, Amp, Double, Double) = {
    val keys = (1 to k).map(i => (i * 2654435761L) % n)

    val cowDir = mkTable(spark, n, files)
    val t0 = System.nanoTime()
    val cowBytes = keys.map { key =>
      val before = GraftLake.snapshot(spark, cowDir)
      GraftLake.delete(spark, cowDir, col("id") === key)
      val beforePaths = before.files.map(_.path).toSet
      GraftLake.snapshot(spark, cowDir).files
        .filterNot(f => beforePaths.contains(f.path)).map(_.bytes).sum
    }
    val cowSecs = (System.nanoTime() - t0) / 1e9

    val morDir = mkTable(spark, n, files)
    val t1 = System.nanoTime()
    val morBytes = keys.map { key =>
      val before = GraftLake.snapshot(spark, morDir)
      GraftLake.deleteMoR(spark, morDir, col("id") === key)
      val beforeDvs = before.files.flatMap(_.dv).map(_.path).toSet
      sidecarBytes(morDir, GraftLake.snapshot(spark, morDir).files
        .flatMap(_.dv).map(_.path).filterNot(beforeDvs.contains))
    }
    val morSecs = (System.nanoTime() - t1) / 1e9

    // both paths deleted exactly the same rows
    val live = n - keys.distinct.size
    require(GraftLake.read(spark, cowDir).count() == live, "CoW row count")
    require(GraftLake.read(spark, morDir).count() == live, "MoR row count")
    (stats(cowBytes), stats(morBytes), cowSecs, morSecs)
  }

  /** Prints one JSON line. Env knobs: SPARK_GRAFT_LAKE_N (default
    * 2000000), SPARK_GRAFT_LAKE_FILES (default 32), SPARK_GRAFT_DELETES
    * (default 64), SPARK_GRAFT_CPUS. */
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_LAKE_N", "2000000").toLong
    val files = sys.env.getOrElse("SPARK_GRAFT_LAKE_FILES", "32").toInt
    val k = sys.env.getOrElse("SPARK_GRAFT_DELETES", "64").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (cow, mor, cowSecs, morSecs) = run(spark, n, files, k)
    println(f"""{"metric":"lake_point_delete_amp","rows":$n,"files":$files,""" +
      f""""deletes":$k,"cow_bytes_mean":${cow.mean}%.0f,""" +
      f""""cow_bytes_p99":${cow.p99}%.0f,"cow_bytes_max":${cow.max}%.0f,""" +
      f""""mor_bytes_mean":${mor.mean}%.0f,"mor_bytes_p99":${mor.p99}%.0f,""" +
      f""""mor_bytes_max":${mor.max}%.0f,""" +
      f""""amplification_x":${cow.mean / math.max(1.0, mor.mean)}%.0f,""" +
      f""""cow_seconds":$cowSecs%.1f,"mor_seconds":$morSecs%.1f}""")
    spark.stop()
  }
}
