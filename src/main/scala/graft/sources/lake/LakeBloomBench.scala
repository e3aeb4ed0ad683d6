package graft.sources.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Bloom-filter point-lookup skipping, measured: two tables with
 * IDENTICAL data — a pseudo-random (unsorted) high-cardinality long key
 * whose every row group spans the whole domain, so footer/stats/page
 * pruning disproves NOTHING — one bare, one with
 * `bloomFilter.columns = k`. Rows are WIDE (a ~200 B payload:
 * the document-corpus shape), and the lookup is a SELECT *, because
 * that is where skipping pays: a disproven row group saves the full
 * row width, not just the key column.
 *
 * SIZING RULE the bench encodes (and the scaladoc on
 * [[GraftLake.BloomColsKey]] states): parquet writes ONE bloom per
 * row group per column, sized by expected NDV (~1.2 MB at 1M NDV /
 * 1% FPP, hard-capped by parquet's 1 MB default). Keep row groups at
 * the default (large) size and set ndv ≈ distinct keys per row group:
 * under-sized NDV degrades FPP toward useless, tiny row groups make
 * the bloom larger than the data it guards. An earlier 256 KB-row-
 * group variant of this bench measured exactly that pathology: 180 KB
 * blooms guarding 36 KB row groups, no win (0.16 s vs 0.16 s).
 *
 * Run: `sbt "runMain graft.sources.lake.LakeBloomBench"`.
 *
 * Committed figures (local[8], 8M rows x ~220 B, 16 files, default row
 * groups, ndv 600k): absent-key SELECT * 0.443 s bare → 0.073 s
 * bloom'd (6.1×: every row group disproven before page IO; the
 * residual is footer+bloom decode), present-key 0.407 s → 0.252 s
 * (1.6×: one row group survives and is actually read); append cost
 * within noise (8.4 s bare, run cold first, vs 7.4 s bloom'd — the
 * filter build is a per-row hash insert riding the write). The absent
 * ratio also PROVES Spark's stock read path applies the blooms: no
 * graft-side reader change exists to explain it. At 100 TB the ratio
 * is the story: a stats-blind takedown/audit probe stops being a
 * table scan, planning cost stays zero (blooms live in the files,
 * never in the driver's log fold), and each task consults only its
 * own splits' filters.
 */
object LakeBloomBench {

  private def mkTable(spark: SparkSession, bloom: Boolean, rows: Long,
      files: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory(
      if (bloom) "graft_bloom_on" else "graft_bloom_off").toString + "/t"
    val df = spark.range(0, rows).select(
      xxhash64(col("id")).as("k"), // bit-mixed, unsorted, collision-free in practice
      col("id").as("v"),
      // ~200 B payload: the wide-document shape where a skipped row
      // group saves real IO
      rpad(concat(lit("doc-"), col("id")), 200, "x").as("text"))
    GraftLake.create(df.limit(1), dir)
    if (bloom) GraftLake.setProperties(spark, dir, Map(
      "bloomFilter.columns" -> "k", "bloomFilter.ndv.k" -> "600000"))
    val t0 = System.nanoTime()
    GraftLake.append(df, dir, numFiles = files)
    val appendS = (System.nanoTime() - t0) / 1e9
    println(f"""{"table":"${if (bloom) "bloom" else "bare"}","append_s":$appendS%.2f}""")
    dir
  }

  /** Median-of-3 SELECT * point lookup (collect forces the full row
    * width through the scan, as a real fetch-the-document probe would). */
  private def lookup(spark: SparkSession, dir: String, key: Long): Double = {
    val runs = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      LakeFileIndex.readPruned(spark, dir).where(col("k") === key)
        .collect()
      (System.nanoTime() - t0) / 1e9
    }
    runs.sorted.apply(1)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("lake-bloom-bench").master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val rows = 8000000L
      val bare = mkTable(spark, bloom = false, rows, files = 16)
      val bloomed = mkTable(spark, bloom = true, rows, files = 16)
      // probes: the hash of an id the table HOLDS is present; the hash
      // of an id far outside [0, rows) is absent (deterministic), and
      // in-range for every row group because the key is uniform
      import spark.implicits._
      def keyOf(id: Long): Long =
        Seq(id).toDF("id").select(xxhash64(col("id"))).head().getLong(0)
      val absent = keyOf(rows + 999L)
      val present = keyOf(12345L)
      lookup(spark, bare, absent); lookup(spark, bloomed, absent) // warm
      val bAbs = lookup(spark, bare, absent)
      val fAbs = lookup(spark, bloomed, absent)
      val bPre = lookup(spark, bare, present)
      val fPre = lookup(spark, bloomed, present)
      require(LakeFileIndex.readPruned(spark, bloomed)
        .where(col("k") === present).count() == 1L)
      println(f"""{"metric":"lake_bloom_lookup","rows":$rows,""" +
        f""""absent_bare_s":$bAbs%.3f,"absent_bloom_s":$fAbs%.3f,""" +
        f""""present_bare_s":$bPre%.3f,"present_bloom_s":$fPre%.3f}""")
    } finally spark.stop()
  }
}
