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
    */
  def writeBatch(df: DataFrame, eventTime: String, duration: String,
      path: String, format: String = "parquet"): Unit =
    withWindowName(df, eventTime, duration)
      .write.mode("append").format(format)
      .partitionBy("window_name").save(path)

  /** Streaming write via foreachBatch (micro-batch = the reference's pane
    * firing; DISCARDING panes per W4 — each batch appends only its own rows).
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

  def start(df: DataFrame, eventTime: String, duration: String,
      watermarkDelay: String, path: String, checkpoint: String,
      format: String = "parquet"): StreamingQuery =
    stream(df, eventTime, duration, watermarkDelay, path, format)
      .option("checkpointLocation", checkpoint)
      .start()
}
