package graft.sources

import java.net.URI

import scala.jdk.CollectionConverters._

import graft.functions.AvroCodec
import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/**
 * S3/K1/K2 — Avro OBJECT-CONTAINER file IO on avro-core (the reference's
 * GCS Avro file surface: `sc.avroFile` scans
 * mediation/MediationService.scala:301,309 and the windowed/batch sinks
 * streaming/utils/SinkUtils.scala:36-71). The environment has no spark-avro
 * datasource, so this module implements container files directly: read =
 * `binaryFiles` + `DataFileStream` with reader-schema resolution (so files
 * written by other writers — e.g. non-union schemas — still load), write =
 * per-partition `DataFileWriter` against Hadoop FS (one shard per task, the
 * classic distributed-sink layout; no driver materialization).
 *
 * The wire codec ([[graft.functions.AvroCodec]]) and these files share one
 * schema derivation, so a record published to the bus and a record written
 * to a container file carry identical Avro layouts.
 */
object AvroFiles {

  /** External Row ↔ Avro datum converters (the RDD boundary uses external
    * rows; the column codec's InternalRow twins live in [[AvroCodec]]).
    */
  private[sources] def rowToDatum(value: Any, dt: DataType, schema: Schema): Any = {
    if (value == null) return null
    val nonNull =
      if (schema.getType == Schema.Type.UNION)
        schema.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
      else schema
    dt match {
      case StringType => value.asInstanceOf[String]
      case LongType | IntegerType | BooleanType | DoubleType | FloatType => value
      case BinaryType => java.nio.ByteBuffer.wrap(value.asInstanceOf[Array[Byte]])
      case st: StructType =>
        val row = value.asInstanceOf[Row]
        val rec = new GenericData.Record(nonNull)
        var i = 0
        while (i < st.length) {
          rec.put(i, rowToDatum(row.get(i), st.fields(i).dataType,
            nonNull.getFields.get(i).schema()))
          i += 1
        }
        rec
      case ArrayType(elem, _) =>
        val out = new java.util.ArrayList[Any]()
        value.asInstanceOf[scala.collection.Seq[Any]].foreach(v =>
          out.add(rowToDatum(v, elem, nonNull.getElementType)))
        out
      case other => throw new IllegalArgumentException(s"unsupported avro-file type: $other")
    }
  }

  private[sources] def datumToRowValue(value: Any, dt: DataType): Any = {
    if (value == null) return null
    dt match {
      case StringType => value.toString
      case LongType | IntegerType | BooleanType | DoubleType | FloatType => value
      case BinaryType =>
        val bb = value.asInstanceOf[java.nio.ByteBuffer]
        val out = new Array[Byte](bb.remaining())
        bb.duplicate().get(out)
        out
      case st: StructType =>
        val rec = value.asInstanceOf[GenericRecord]
        Row.fromSeq(st.fields.indices.map(i =>
          datumToRowValue(rec.get(i), st.fields(i).dataType)))
      case ArrayType(elem, _) =>
        value.asInstanceOf[java.util.Collection[Any]].asScala
          .map(datumToRowValue(_, elem)).toSeq
      case other => throw new IllegalArgumentException(s"unsupported avro-file type: $other")
    }
  }

  /**
   * Batch scan of Avro container files into rows of `schema` (S3). Paths
   * may be files, dirs, or globs (anything `binaryFiles` takes). Reader-
   * schema resolution applies: the canonical ["null", T]-union reader
   * schema accepts both this module's files and plain non-union writers.
   * The per-file stream decodes lazily — executors hold one block at a
   * time, not the file.
   */
  def read(spark: SparkSession, paths: Seq[String], schema: StructType): DataFrame = {
    val readerSchemaJson = AvroCodec.avroSchemaFor(schema).toString
    val rdd = spark.sparkContext.binaryFiles(paths.mkString(","))
      .flatMap { case (_, stream) =>
        val readerSchema = new Schema.Parser().parse(readerSchemaJson)
        val in = stream.open()
        val files = new DataFileStream[GenericRecord](in,
          new GenericDatumReader[GenericRecord](null, readerSchema))
        new Iterator[GenericRecord] {
          def hasNext: Boolean = {
            val h = files.hasNext
            if (!h) { files.close(); in.close() }
            h
          }
          def next(): GenericRecord = files.next()
        }
      }
      .map(rec => datumToRowValue(rec, schema).asInstanceOf[Row])
    spark.createDataFrame(rdd, schema)
  }

  /**
   * Batch write as container files (K2): one `part-NNNNN.avro` shard per
   * partition (`saveAsAvroFile`'s shard layout,
   * streaming/utils/SinkUtils.scala:58-71). `repartition` upstream to pick
   * the shard count.
   */
  def write(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    val writerSchemaJson = AvroCodec.avroSchemaFor(schema).toString
    df.toDF().rdd.foreachPartition { it =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val writerSchema = new Schema.Parser().parse(writerSchemaJson)
        val fs = FileSystem.get(new URI(path), new Configuration())
        // task id + uuid → append semantics across batches (no clobbering)
        val out = fs.create(new Path(path,
          f"part-$pid%05d-${java.util.UUID.randomUUID()}.avro"), false)
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](writerSchema))
        w.create(writerSchema, out)
        try it.foreach(row =>
          w.append(rowToDatum(row, schema, writerSchema).asInstanceOf[GenericRecord]))
        finally w.close()
      }
    }
  }

  /**
   * K1 — window-partitioned container write: rows carrying a
   * `window_name` column land in `window_name=<start_end>/part-NNNNN.avro`,
   * the reference's one-dir-per-window Avro layout with the same file
   * parallelism as [[write]] (writers opened lazily per window per task).
   */
  def writeWindowed(df: DataFrame, path: String,
      windowCol: String = "window_name"): Unit = {
    val schema = StructType(df.schema.filterNot(_.name == windowCol))
    val writerSchemaJson = AvroCodec.avroSchemaFor(schema).toString
    val idx = df.schema.fieldIndex(windowCol)
    df.toDF().rdd.foreachPartition { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val writerSchema = new Schema.Parser().parse(writerSchemaJson)
      val writers = scala.collection.mutable.Map[String, DataFileWriter[GenericRecord]]()
      def writerFor(w: String): DataFileWriter[GenericRecord] =
        writers.getOrElseUpdate(w, {
          val fs = FileSystem.get(new URI(path), new Configuration())
          val out = fs.create(new Path(path,
            f"$windowCol=$w/part-$pid%05d-${java.util.UUID.randomUUID()}.avro"), false)
          val dw = new DataFileWriter[GenericRecord](
            new GenericDatumWriter[GenericRecord](writerSchema))
          dw.create(writerSchema, out)
          dw
        })
      try it.foreach { row =>
        val stripped = Row.fromSeq(row.toSeq.patch(idx, Nil, 1))
        writerFor(row.getString(idx)).append(
          rowToDatum(stripped, schema, writerSchema).asInstanceOf[GenericRecord])
      } finally writers.values.foreach(_.close())
    }
  }
}
