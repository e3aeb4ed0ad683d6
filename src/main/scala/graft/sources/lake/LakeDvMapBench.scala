package graft.sources.lake

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

/**
 * Deletion-vector descriptor-map ceiling (measured, VERDICT r11 item 3):
 * [[DvDeleted]] carries a basename → sidecar-path map as a plan
 * reference object, so its serialized size rides the ONE taskBinary
 * broadcast per stage (Spark serializes the codegen references array
 * once per stage, not per task). Delta instead ships per-file DV
 * descriptors inside the scan's file index. Before adopting that shape,
 * measure where the map actually hurts: this bench synthesizes maps of
 * F DV-carrying files with realistic 60-char basenames / 70-char
 * sidecar paths and times (a) building the map the way
 * [[GraftLake.dvPathsFor]] does, (b) Java-serializing the [[DvDeleted]]
 * expression (the exact object `addReferenceObj` puts in the plan), and
 * (c) deserializing it (the per-executor cost on first task).
 *
 * No SparkSession: the object under test is driver-side plan state.
 */
object LakeDvMapBench {

  private def synthSnap(dvFiles: Int): GraftLake.Snapshot = {
    val files = (0 until dvFiles).map { i =>
      val path = f"data/part-$i%06d-0123456789abcdef0123456789abcdef.parquet"
      GraftLake.AddFile(path, 1000000L, 128L << 20, Map.empty,
        dv = Some(GraftLake.DvRef(
          f"dv/dv-$i%06d-fedcba9876543210fedcba9876543210.bin", 1234L)))
    }
    GraftLake.Snapshot("/warehouse/t", dvFiles.toLong,
      new org.apache.spark.sql.types.StructType(), files)
  }

  /** (mapBuildMs, serializedBytes, serializeMs, deserializeMs). */
  def measure(dvFiles: Int): (Double, Long, Double, Double) = {
    val snap = synthSnap(dvFiles)
    val paths = snap.files.map(f => s"${snap.dir}/${f.path}")
    val t0 = System.nanoTime()
    val m = GraftLake.dvPathsFor(snap, paths)
    val buildMs = (System.nanoTime() - t0) / 1e6
    require(m.size == dvFiles)
    val expr = DvDeleted(
      org.apache.spark.sql.catalyst.expressions.Literal("f"),
      org.apache.spark.sql.catalyst.expressions.Literal(0L), m)
    val bos = new ByteArrayOutputStream()
    val t1 = System.nanoTime()
    val oos = new ObjectOutputStream(bos)
    oos.writeObject(expr); oos.close()
    val serMs = (System.nanoTime() - t1) / 1e6
    val bytes = bos.size().toLong
    val t2 = System.nanoTime()
    val back = new ObjectInputStream(new ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[DvDeleted]
    val deserMs = (System.nanoTime() - t2) / 1e6
    require(back.dvPathByFile.size == dvFiles, "roundtrip must preserve the map")
    (buildMs, bytes, serMs, deserMs)
  }

  def main(args: Array[String]): Unit = {
    measure(1000) // JIT warmup
    val rows = Seq(10000, 100000, 1000000).map { f =>
      val (b, bytes, s, d) = measure(f)
      val line = f"""{"dv_files":$f,"map_build_ms":$b%.0f,"mb":${bytes / 1e6}%.1f,""" +
        f""""serialize_ms":$s%.0f,"deserialize_ms":$d%.0f}"""
      println(line)
      line
    }
    println(s"""{"metric":"lake_dv_map_scaling","points":[${rows.mkString(",")}]}""")
  }
}
