package graft.sources.lake

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/**
 * Checkpoint scaling measurement: the lake's log checkpoint is O(active
 * files) JSON; Delta switches to parquet checkpoints around 10⁶–10⁷
 * files. Before swapping formats, MEASURE where JSON actually breaks:
 * this bench synthesizes a LogState with F realistic AddFiles (40-char
 * paths, 3 stat columns each) and times checkpoint write + parse at
 * F ∈ {10k, 100k, 1M} — the parse is the cost every cold snapshot()
 * pays, the write is amortized over ckptEvery commits.
 *
 * No SparkSession: the checkpoint path is deliberately driver-side
 * Jackson (commits must not depend on executor availability), so the
 * measurement is too.
 */
object LakeCkptBench {

  private def synthState(files: Int): GraftLake.LogState = {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("score", LongType), StructField("payload", StringType)))
    val adds = (0 until files).iterator.map { i =>
      val stats = Map(
        "id" -> GraftLake.ColStats(Some(s"${i * 1000L}"),
          Some(s"${i * 1000L + 999}"), 0L, "long"),
        "score" -> GraftLake.ColStats(Some("0"), Some("96"), 0L, "long"),
        "payload" -> GraftLake.ColStats(Some(s"payload-$i"),
          Some(s"payload-${i}z"), 3L, "string"))
      val path = f"data/part-$i%05d-0123456789abcdef0123456789abcdef.parquet"
      path -> GraftLake.AddFile(path, 1000000L, 128L << 20, stats,
        dv = if (i % 10 == 0)
          Some(GraftLake.DvRef(f"dv/dv-$i%05d.bin", 17L)) else None)
    }
    GraftLake.LogState(files.toLong, schema.json,
      scala.collection.immutable.VectorMap(adds.toSeq: _*),
      txns = Map("app-1" -> 42L, "app-2" -> 7L), maxColId = 3,
      retired = Map("old_col" -> 9L), ckptEvery = 10)
  }

  /** Returns (jsonBytes, writeMs, parseMs) for a synthetic F-file state. */
  def measure(files: Int): (Long, Double, Double) = {
    val st = synthState(files)
    val tmp = Files.createTempFile("ckpt_bench", ".json").toFile
    val t0 = System.nanoTime()
    GraftLake.writeCkpt(tmp, st)
    val writeMs = (System.nanoTime() - t0) / 1e6
    val t1 = System.nanoTime()
    val back = GraftLake.parseCkpt(tmp)
    val parseMs = (System.nanoTime() - t1) / 1e6
    require(back.files.size == files && back.version == files.toLong,
      "roundtrip must preserve the state")
    val size = tmp.length()
    tmp.delete()
    (size, writeMs, parseMs)
  }

  def main(args: Array[String]): Unit = {
    measure(1000) // JIT warmup
    val rows = Seq(10000, 100000, 1000000).map { f =>
      val (bytes, w, p) = measure(f)
      val line =
        f"""{"files":$f,"mb":${bytes / 1e6}%.1f,"write_ms":$w%.0f,"parse_ms":$p%.0f}"""
      println(line) // per-point progress (the 1M point takes a while)
      line
    }
    println(s"""{"metric":"lake_ckpt_scaling","points":[${rows.mkString(",")}]}""")
  }
}
