package graft.sources

import java.io.File

import graft.SparkSpec
import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** S3/K1/K2 — Avro object-container files on avro-core. */
class AvroFilesSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit(); d.toString
  }

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType), StructField("tags", ArrayType(StringType)),
    StructField("raw", BinaryType)))

  private val rows = Seq(
    Row(1L, "a", 1.5, Seq("x", "y"), Array[Byte](1, 2)),
    Row(2L, null, null, Seq.empty[String], null),
    Row(3L, "c", -0.0, null, Array.empty[Byte]))

  private def normalize(r: Row): Seq[Any] = r.toSeq.map {
    case b: Array[Byte] => b.toSeq
    case x => x
  }

  test("write -> read round trip (shards, nulls, arrays, binary)") {
    val dir = tmp("avro-rt")
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    AvroFiles.write(df, dir)
    assert(new File(dir).listFiles().count(_.getName.endsWith(".avro")) == 2)
    val back = AvroFiles.read(spark, Seq(dir), schema)
    assert(back.collect().map(normalize).toSet == rows.map(normalize).toSet)
  }

  test("reader-schema resolution loads foreign non-union files") {
    // a plain writer (no null unions) — written with avro directly
    val dir = tmp("avro-foreign")
    val fSchema = new Schema.Parser().parse(
      """{"type":"record","name":"F","fields":[
        |{"name":"id","type":"long"},{"name":"name","type":"string"}]}""".stripMargin)
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](fSchema))
    w.create(fSchema, new File(dir, "f.avro"))
    val rec = new GenericData.Record(fSchema)
    rec.put(0, 7L); rec.put(1, "seven")
    w.append(rec); w.close()

    val st = StructType(Seq(StructField("id", LongType), StructField("name", StringType)))
    val got = AvroFiles.read(spark, Seq(dir), st).collect()
    assert(got.toSeq == Seq(Row(7L, "seven")))
  }

  test("MediationApp bootstrap reads avro container dirs (S3 native format)") {
    import graft.model.MockData
    val dir = tmp("avro-boot")
    val ds = spark.createDataset(Seq(
      MockData.notSentDebitQuique, MockData.notSentDebitAbuela))(
      org.apache.spark.sql.Encoders.product[graft.model.MyEventRecord])
    AvroFiles.write(ds.toDF(), dir)
    val boot = graft.apps.MediationApp.bootstrap(spark, Seq(dir, s"$dir-missing"),
      format = "avro").collect()
    assert(boot.length == 2)
    assert(boot.forall(_.isInitialLoad))
  }

  test("windowed write lands rows under window_name dirs, readable back (K1 layout)") {
    val dir = tmp("avro-win")
    val st = StructType(Seq(StructField("window_name", StringType),
      StructField("id", LongType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("20260812T100000_100030", 1L), Row("20260812T100000_100030", 2L),
      Row("20260812T100030_100100", 3L)), 2), st)
    AvroFiles.writeWindowed(df, dir)
    val dirs = new File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("window_name=20260812T100000_100030",
      "window_name=20260812T100030_100100"))
    val back = AvroFiles.read(spark,
      Seq(s"$dir/window_name=20260812T100000_100030"),
      StructType(Seq(StructField("id", LongType))))
    assert(back.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }
}
