package graft.sources.lake

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Protocol feature gating (the Delta table-features shape): commits
 * that use a gated capability — deletion vectors, column mapping,
 * CHECK constraints, clustering — are auto-stamped at the tryCommit
 * choke point, the log folds their union, and a reader that meets a
 * feature it does not support FAILS FAST with a clear upgrade message
 * instead of silently misreading (a fold that ignored an unknown `dv`
 * field would resurrect deleted rows; one that ignored
 * `graft.physical` metadata would bind renamed columns to the wrong
 * parquet names). Features are monotone and ride checkpoints, so a
 * truncated-log fold still knows them.
 */
class LakeProtocolSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_proto").toString + "/t"

  private def mk(n: Long = 100): String = {
    val dir = tmp()
    GraftLake.create(
      spark.range(0, n).select(col("id").as("k"), (col("id") % 5).as("v")),
      dir, checkpointEvery = 2)
    dir
  }

  test("commits auto-record exactly the gated capabilities they use; " +
    "the folded set is monotone") {
    val dir = mk()
    assert(GraftLake.snapshot(spark, dir).features.isEmpty,
      "a plain table records no features")
    GraftLake.deleteMoR(spark, dir, col("k") % 10 === 0)
    assert(GraftLake.snapshot(spark, dir).features == Set("deletionVectors"))
    GraftLake.setProperties(spark, dir, Map("constraint.v_pos" -> "v >= 0"))
    assert(GraftLake.snapshot(spark, dir).features ==
      Set("deletionVectors", "checkConstraints"))
    // monotone: unsetting the constraint does not un-record the feature
    GraftLake.setProperties(spark, dir, Map.empty,
      unsets = Seq("constraint.v_pos"))
    assert(GraftLake.snapshot(spark, dir).features
      .contains("checkConstraints"))
    // time travel sees the features of THAT version
    assert(GraftLake.snapshot(spark, dir, asOf = Some(0L)).features.isEmpty)
  }

  test("an id-less rename records columnMapping; a converted clone " +
    "re-detects from what it carries") {
    val src = tmp()
    spark.range(0, 50).select(col("id").as("a"), col("id").as("b"))
      .write.parquet(src)
    GraftLake.convert(spark, src)
    assert(GraftLake.snapshot(spark, src).features.isEmpty)
    GraftLake.renameColumn(spark, src, "a", "doc")
    assert(GraftLake.snapshot(spark, src).features == Set("columnMapping"))
    val dst = tmp()
    GraftLake.shallowClone(spark, src, dst)
    assert(GraftLake.snapshot(spark, dst).features == Set("columnMapping"),
      "the clone's v0 schema carries the mapping, so the stamp follows")
  }

  test("a log recording an UNKNOWN feature fails fast — reads and writes " +
    "both stop with the upgrade message, nothing misreads") {
    val dir = mk()
    val v = GraftLake.latestVersion(dir) + 1
    // what a future library version would write for a capability this
    // build has never heard of
    val json =
      s"""{"version":$v,"ts":${System.currentTimeMillis()},
         |"op":"epoch-fence","features":["epoch-fencing-v2"],
         |"adds":[],"removes":[]}""".stripMargin
    Files.write(new File(dir, f"_log/v$v%020d.json").toPath,
      json.getBytes(StandardCharsets.UTF_8))
    val e = intercept[GraftLake.LakeUnsupportedFeatureException] {
      GraftLake.snapshot(spark, dir)
    }
    assert(e.getMessage.contains("epoch-fencing-v2"))
    assert(e.getMessage.contains("upgrade"))
    intercept[GraftLake.LakeUnsupportedFeatureException] {
      GraftLake.append(spark.range(5).select(col("id").as("k"),
        col("id").as("v")), dir)
    }
    // PRE-feature versions stay readable: the gate protects
    // interpretation of the versions that USE the feature
    assert(GraftLake.read(spark, dir, asOf = Some(0L)).count() == 100L)
  }

  test("features ride checkpoints: a fold that never sees the early " +
    "commits still knows them") {
    val dir = mk()
    GraftLake.deleteMoR(spark, dir, col("k") === 1L) // v1: deletionVectors
    (1 to 3).foreach { i =>
      GraftLake.append(spark.range(i * 100L, i * 100L + 10)
        .select(col("id").as("k"), (col("id") % 5).as("v")), dir, 1)
    }
    val log = new File(dir, "_log")
    assert(log.listFiles((_, n) => n.startsWith("ckpt-v")).nonEmpty)
    (0L to 1L).foreach(v =>
      new File(log, f"v$v%020d.json").delete()) // fold must use the ckpt
    assert(GraftLake.snapshot(spark, dir).features
      .contains("deletionVectors"))
  }
}
