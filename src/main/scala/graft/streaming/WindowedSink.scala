package graft.streaming

import graft.functions.Kit
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.{DataFrame, Row}

/**
 * K1 — windowed file sink (streaming/utils/SinkUtils.scala:36-56): group a
 * stream into event-time tumbling windows and write one directory of files
 * per window, named `yyyyMMdd'T'HHmmss_HHmmss` from the window bounds
 * (name gen utils/time/TimeUtils.scala:38-57). Used by the reference for
 * the toxic-record quarantine (mediation/MediationService.scala:129-131).
 *
 * Spark-first shape: `window()` struct column + `partitionBy(window_name)`
 * inside `foreachBatch` — the datasource writes each window's rows under
 * `window_name=<start_end>/` with no driver-side grouping. At 100 TB the
 * write parallelism is the batch's partitioning; no collect, no per-window
 * job. Late data (allowedLateness=0, W5) is dropped by the watermark before
 * the sink sees it.
 */
object WindowedSink {

  /** Tag rows with their tumbling window's name from an event-time column. */
  def withWindowName(df: DataFrame, eventTime: String, duration: String): DataFrame =
    df.withColumn("w", window(col(eventTime), duration))
      .withColumn("window_name", Kit.windowName(col("w.start"), col("w.end")))
      .drop("w")

  /** Batch write: one `window_name=.../` dir per window (K1's batch twin K2
    * keeps the same layout so bootstrap reads can glob either).
    * `format="avro"` routes through [[graft.sources.AvroFiles]] — real Avro
    * object-container files, the reference's windowed-sink format — since
    * this environment has no spark-avro datasource; any other format is a
    * plain datasource write.
    */
  def writeBatch(df: DataFrame, eventTime: String, duration: String,
      path: String, format: String = "parquet"): Unit = {
    val named = withWindowName(df, eventTime, duration)
    if (format == "avro") graft.sources.AvroFiles.writeWindowed(named, path)
    else named.write.mode("append").format(format)
      .partitionBy("window_name").save(path)
  }

  /** Streaming write, immediate mode: every micro-batch appends its rows
    * under their window dirs right away — the analogue of the reference's
    * per-element-trigger DISCARDING panes (W3/W4: a window may receive
    * files from several panes). NB a stateless watermark does NOT drop late
    * rows in Spark — late arrivals land in their (old) window dir; use
    * [[streamFinalized]] for drop-late/write-once-per-window semantics.
    * Delivery is AT-LEAST-ONCE under crash replay (a replayed epoch
    * re-appends its panes) — the same contract as the reference's
    * discarding panes on an at-least-once bus; the finalized mode below is
    * the exactly-once path.
    */
  def stream(df: DataFrame, eventTime: String, duration: String,
      watermarkDelay: String, path: String,
      format: String = "parquet"): DataStreamWriter[Row] =
    df.withWatermark(eventTime, watermarkDelay)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          writeBatch(batch, eventTime, duration, path, format)
      }

  /**
   * Streaming write, finalized-window mode: rows are grouped into event-time
   * windows under the watermark and each window is written exactly once,
   * when the watermark passes its end — so late data (beyond
   * `watermarkDelay`; W5 allowedLateness) is dropped by the aggregation.
   * This is the Beam on-watermark pane firing. The per-window
   * `collect_list` bounds memory by window contents — same contract as the
   * reference's `(IntervalWindow, Iterable[T])` grouping
   * (streaming/utils/SinkUtils.scala:36-56); size windows accordingly.
   */
  def streamFinalized(df: DataFrame, eventTime: String, duration: String,
      watermarkDelay: String, path: String,
      format: String = "parquet"): DataStreamWriter[Row] = {
    import org.apache.spark.sql.streaming.OutputMode
    val cols = df.columns.toSeq
    df.withWatermark(eventTime, watermarkDelay)
      .groupBy(window(col(eventTime), duration).as("w"))
      .agg(collect_list(struct(cols.map(col): _*)).as("rows"))
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          // exactly-once under crash replay: append-mode emits each window
          // in exactly ONE epoch, so dynamic partition overwrite makes a
          // replayed epoch REWRITE its own window dirs instead of
          // double-appending them — and never touches other windows'
          val s = batch.sparkSession
          val key = "spark.sql.sources.partitionOverwriteMode"
          val saved = s.conf.getOption(key)
          s.conf.set(key, "dynamic")
          try batch.select(
              Kit.windowName(col("w.start"), col("w.end")).as("window_name"),
              explode(col("rows")).as("r"))
            .select(col("window_name") +: cols.map(c => col(s"r.$c")): _*)
            .write.mode("overwrite").format(format)
            .partitionBy("window_name").save(path)
          finally saved match {
            case Some(v) => s.conf.set(key, v)
            case None => s.conf.unset(key)
          }
        }
      }
  }

  def start(df: DataFrame, eventTime: String, duration: String,
      watermarkDelay: String, path: String, checkpoint: String,
      format: String = "parquet", finalized: Boolean = false,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L)): StreamingQuery = {
    val writer =
      if (finalized) streamFinalized(df, eventTime, duration, watermarkDelay, path, format)
      else stream(df, eventTime, duration, watermarkDelay, path, format)
    writer.option("checkpointLocation", checkpoint).trigger(trigger).start()
  }
}
