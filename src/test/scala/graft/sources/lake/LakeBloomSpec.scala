package graft.sources.lake

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.parquet.HadoopReadOptions
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.FilterApi
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.functions._

/**
 * Per-column parquet bloom filters as a table property
 * (`bloomFilter.columns`) — point-lookup data skipping where footer
 * min/max stats are blind. A uniformly distributed high-cardinality key
 * (document id, content hash) overlaps every file's [min,max], so a
 * takedown / audit lookup under stats-only pruning scans the whole
 * table; the bloom lets each TASK drop disproven row groups before any
 * page IO, with ZERO planning-time cost (the filters live in the data
 * files, never in the log fold). Backfill contract = Delta's bloom
 * index: files written after the property is set carry blooms, OPTIMIZE
 * rewrites the rest. Rename/drop/replace keep the property consistent
 * in the same commit, like clusterBy.
 */
class LakeBloomSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_bloom").toString + "/t"

  /** k: high-cardinality even longs (odd values are in-range ABSENT
    * probes that min/max stats can never disprove), doc: string ids. */
  private def batch(from: Long, n: Long) =
    spark.range(from, from + n).select(
      (col("id") * 2).as("k"),
      concat(lit("doc-"), lpad(col("id").cast("string"), 8, "0")).as("doc"),
      (col("id") % 97).as("v"))

  test("files staged after the property is set carry blooms for exactly " +
    "the listed columns; membership holds; pre-property files are bare") {
    val dir = tmp()
    GraftLake.create(batch(0, 3000), dir, numFiles = 2)
    GraftLake.setProperties(spark, dir, Map(
      "bloomFilter.columns" -> "k,doc",
      "bloomFilter.ndv.k" -> "10000"))
    GraftLake.append(batch(3000, 3000), dir, numFiles = 2)

    val v0Files = GraftLake.snapshot(spark, dir, asOf = Some(0L))
      .files.map(_.path).toSet
    val snap = GraftLake.snapshot(spark, dir)
    val appended = snap.files.filterNot(f => v0Files.contains(f.path))
    assert(appended.nonEmpty)
    appended.foreach { f =>
      val abs = GraftLake.absPath(dir, f.path)
      val bk = GraftLake.readBloom(spark, abs, "k")
      val bd = GraftLake.readBloom(spark, abs, "doc")
      assert(bk.isDefined && bd.isDefined,
        s"appended file $abs must carry blooms for k and doc")
      // the UNLISTED column gets none
      assert(GraftLake.readBloom(spark, abs, "v").isEmpty)
      // an in-range ABSENT value (odd key) is disproven — exactly what
      // min/max cannot do
      assert(!bk.get.findHash(bk.get.hash(6001L)))
      assert(!bd.get.findHash(bd.get.hash(
        Binary.fromString("doc-99999999"))))
    }
    // no false negatives: the appended batch holds k=6000, so the file
    // holding it MUST find it
    assert(appended.exists { f =>
      GraftLake.readBloom(spark, GraftLake.absPath(dir, f.path), "k")
        .exists(b => b.findHash(b.hash(6000L)))
    }, "a present key must be found by the bloom of the file holding it")
    // pre-property v0 files are bare until OPTIMIZE backfills
    v0Files.foreach { p =>
      assert(GraftLake.readBloom(spark, GraftLake.absPath(dir, p), "k").isEmpty)
    }

    // OPTIMIZE rewrites the v0 files through stage() -> backfilled
    GraftLake.optimize(spark, dir, smallBytes = Long.MaxValue,
      targetBytes = 64L << 20)
    val after = GraftLake.snapshot(spark, dir)
    after.files.foreach { f =>
      assert(GraftLake.readBloom(spark, GraftLake.absPath(dir, f.path), "k").isDefined,
        "every active file must carry blooms after OPTIMIZE backfill")
    }
    // rows intact through the backfill
    assert(GraftLake.read(spark, dir).count() == 6000L)
  }

  test("parquet-mr drops disproven row groups at open time: the task-side " +
    "skip needs no planner cooperation (stats and dictionary filtering " +
    "disabled to isolate the bloom)") {
    val dir = tmp()
    GraftLake.create(batch(0, 1), dir)
    GraftLake.setProperties(spark, dir,
      Map("bloomFilter.columns" -> "k,doc", "bloomFilter.ndv" -> "20000"))
    GraftLake.append(batch(0, 5000), dir, numFiles = 1)
    val snap = GraftLake.snapshot(spark, dir)
    val file = snap.files.maxBy(_.rows).path
    val abs = GraftLake.absPath(dir, file)
    def rowGroupsWith(filter: FilterCompat.Filter): Int = {
      val conf = spark.sessionState.newHadoopConf()
      val opts = HadoopReadOptions.builder(conf, new Path(abs))
        .useStatsFilter(false).useDictionaryFilter(false)
        .useBloomFilter(true).withRecordFilter(filter).build()
      val r = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(abs), conf), opts)
      try r.getRowGroups.size() finally r.close()
    }
    // absent in-range key: bloom disproves every row group
    assert(rowGroupsWith(FilterCompat.get(FilterApi.eq(
      FilterApi.longColumn("k"), java.lang.Long.valueOf(4001L)))) == 0)
    // present key keeps its row group
    assert(rowGroupsWith(FilterCompat.get(FilterApi.eq(
      FilterApi.longColumn("k"), java.lang.Long.valueOf(4000L)))) > 0)
    // string column, same shape
    assert(rowGroupsWith(FilterCompat.get(FilterApi.eq(
      FilterApi.binaryColumn("doc"),
      Binary.fromString("doc-99999999")))) == 0)
    assert(rowGroupsWith(FilterCompat.get(FilterApi.eq(
      FilterApi.binaryColumn("doc"),
      Binary.fromString("doc-00002500")))) > 0)
    // and the Spark read path stays correct over the bloom'd table
    assert(GraftLake.read(spark, dir).where(col("k") === 4000L).count() == 1L)
    assert(GraftLake.read(spark, dir).where(col("k") === 4001L).count() == 0L)
  }

  test("rename follows the bloom property (and its NDV override) in the " +
    "same commit; drop shrinks it; REPLACE unsets what dangles") {
    val dir = tmp()
    GraftLake.create(batch(0, 100), dir)
    GraftLake.setProperties(spark, dir, Map(
      "bloomFilter.columns" -> "k,doc", "bloomFilter.ndv.k" -> "5000"))
    GraftLake.renameColumn(spark, dir, "k", "kk")
    val s1 = GraftLake.snapshot(spark, dir)
    assert(s1.props("bloomFilter.columns") == "kk,doc")
    assert(!s1.props.contains("bloomFilter.ndv.k"))
    assert(s1.props("bloomFilter.ndv.kk") == "5000")
    // new writes bloom under the NEW name
    GraftLake.append(
      batch(100, 100).withColumnRenamed("k", "kk"), dir, numFiles = 1)
    val newest = GraftLake.snapshot(spark, dir).files
      .filterNot(f => s1.files.map(_.path).contains(f.path))
    assert(newest.nonEmpty && newest.forall(f =>
      GraftLake.readBloom(spark, GraftLake.absPath(dir, f.path), "kk").isDefined))

    GraftLake.dropColumn(spark, dir, "kk")
    val s2 = GraftLake.snapshot(spark, dir)
    assert(s2.props("bloomFilter.columns") == "doc")
    assert(!s2.props.contains("bloomFilter.ndv.kk"))

    // REPLACE with a schema that lacks every bloom column unsets the list
    GraftLake.replaceTable(spark.range(5).select(col("id").as("z")), dir)
    val s3 = GraftLake.snapshot(spark, dir)
    assert(!s3.props.contains("bloomFilter.columns"))
  }

  test("validation: unknown columns, non-bloomable types, and malformed " +
    "NDV are rejected before any commit") {
    val dir = tmp()
    GraftLake.create(
      spark.range(10).select(col("id").as("k"), (col("id") % 2 === 0).as("flag")),
      dir)
    val v = GraftLake.latestVersion(dir)
    intercept[IllegalArgumentException] {
      GraftLake.setProperties(spark, dir, Map("bloomFilter.columns" -> "nope"))
    }
    intercept[IllegalArgumentException] {
      GraftLake.setProperties(spark, dir, Map("bloomFilter.columns" -> "flag"))
    }
    intercept[IllegalArgumentException] {
      GraftLake.setProperties(spark, dir,
        Map("bloomFilter.columns" -> "k", "bloomFilter.ndv.k" -> "zero"))
    }
    intercept[IllegalArgumentException] {
      GraftLake.setProperties(spark, dir,
        Map("bloomFilter.columns" -> "k", "bloomFilter.ndv.nope" -> "10"))
    }
    intercept[IllegalArgumentException] {
      GraftLake.setProperties(spark, dir, Map("bloomFilter.ndv" -> "-3"))
    }
    assert(GraftLake.latestVersion(dir) == v, "rejected props must not commit")
  }
}
