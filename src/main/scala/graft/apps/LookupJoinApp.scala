package graft.apps

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.{Column, DataFrame, Row}

/** Serializable per-batch handler for [[LookupJoinApp.streamWithRefresh]]. */
trait BatchSink extends Serializable {
  def apply(enriched: DataFrame, batchId: Long): Unit
}

/**
 * MinimalPubSubBQLookup recomposed (SURVEY §3.2,
 * slack/MinimalPubSubBQLookup.scala:24-73 and its Java twin): a static
 * keyed table broadcast against an unbounded stream, left-outer flavored —
 * a missing key yields the configured default (`""` in the reference,
 * MinimalPubSubBQLookup.scala:43-45).
 *
 * Spark-native shape: stream-static broadcast hash join. NB the static
 * side's file listing is captured when the DataFrame is created — replacing
 * the files under a long-running query is not picked up (and deleting them
 * breaks in-flight batches). For a lookup table that refreshes while the
 * query runs, use [[streamWithRefresh]]: `foreachBatch` re-reads the table
 * per micro-batch — the Spark-documented refresh pattern, and the moral
 * equivalent of the reference rebuilding its side input per window
 * (slack/MinimalPubSubBQLookup.scala:34-40: daily-windowed BQ side input).
 * The reference's per-window trigger config (element-count /
 * processing-time, :51-67) maps to the micro-batch trigger; emit-per-element
 * is Spark's default behavior in append mode.
 */
object LookupJoinApp {

  /** The enrichment join, usable identically on batch and streaming frames.
    * `defaults`: output column → value when the key misses (left-outer +
    * coalesce, J2).
    */
  def enrich(stream: DataFrame, lookup: DataFrame, key: String,
      defaults: Map[String, Column]): DataFrame = {
    val joined = stream.join(broadcast(lookup), Seq(key), "left_outer")
    defaults.foldLeft(joined) { case (df, (c, d)) =>
      df.withColumn(c, coalesce(col(c), d))
    }
  }

  /** Streaming writer: enrich then hand back the writer for the caller to
    * aim at a sink (console in the reference — its output is a log tap,
    * MinimalPubSubBQLookup.scala:46).
    */
  def stream(streamDf: DataFrame, lookup: DataFrame, key: String,
      defaults: Map[String, Column]): DataStreamWriter[Row] =
    enrich(streamDf, lookup, key, defaults).writeStream

  /** Refreshing variant: `loadLookup` runs per micro-batch (e.g. a fresh
    * `spark.read.parquet(dir)` or [[serviceLookup]] call), so lookup-table
    * updates between batches are joined against the current snapshot.
    * `sink` receives the enriched batch (runs on the driver; writes from
    * there are distributed as usual).
    */
  def streamWithRefresh(streamDf: DataFrame, loadLookup: () => DataFrame,
      key: String, defaults: Map[String, Column])(sink: BatchSink): DataStreamWriter[Row] =
    streamDf.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      sink(enrich(batch, loadLookup(), key, defaults), id)
    }

  /** The lookup side AS THE EXTERNAL TYPED TABLE — how the reference app
    * actually composes: its lookup is a BigQuery table read through the
    * storage API (slack/MinimalPubSubBQLookup.scala:37-45), which here is
    * [[graft.sources.v2.GraftTableService]] — same shape (server-side
    * projection/predicate pushdown, N parallel Avro streams, negotiated
    * writer schema). Pass `() => serviceLookup(...)` to
    * [[streamWithRefresh]] and every micro-batch re-reads the service,
    * the reference's per-window side-input rebuild.
    */
  def serviceLookup(spark: org.apache.spark.sql.SparkSession, host: String,
      port: Int, slices: Int = 4): DataFrame =
    spark.read.format("graft.sources.v2.GraftServiceSource")
      .option("host", host).option("port", port.toString)
      .option("slices", slices.toString).load()
}
