package graft.sources.lake

import org.apache.spark.sql.{DataFrame, GraftDatasetBridge, SparkSession}
import org.apache.spark.sql.execution.streaming.Sink

/**
 * The lake as a STREAMING SINK — `writeStream.format("graft-lake")` —
 * exactly-once streaming ingestion without writing a foreachBatch by
 * hand: every micro-batch lands as one [[GraftLake.appendStreamBatch]]
 * commit stamped (appId, batchId), so a replayed epoch (driver restart,
 * task retry after the commit) finds its transaction already in the log
 * and becomes a no-op — the same idempotence fence `foreachBatch`
 * ingestion uses, now behind the standard sink API.
 *
 * Options: `path` (the table; created from the first batch's schema if
 * absent), `appId` (the idempotence scope — REQUIRED so two different
 * queries into one table can't fence each other out), `numFiles`
 * (per-batch file count). Append output mode only — updates belong to
 * [[GraftLake.merge]]/[[GraftLake.delete]].
 */
final class LakeStreamSink(spark: SparkSession, dir: String,
    options: Map[String, String]) extends Sink {

  private val appId = options.getOrElse("appId",
    throw new IllegalArgumentException(
      "graft-lake sink requires option 'appId' (the exactly-once scope; " +
        "use a stable per-query name)"))
  private val numFiles = options.get("numFiles").map(_.toInt).getOrElse(0)

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val batch = GraftDatasetBridge.pinAsBatch(data)
    if (GraftLake.latestVersion(dir) < 0) {
      // first contact: create the table with this schema, empty — the
      // rows land through the FENCED append below, so a crash between
      // the two commits replays safely (create is idempotent via the
      // version-0 fence, the append via its (appId, batchId) txn)
      try GraftLake.create(batch.limit(0), dir, numFiles = 0)
      catch { case _: IllegalArgumentException => () } // lost the race: exists
    }
    GraftLake.appendStreamBatch(batch, dir, appId, batchId, numFiles)
    ()
  }
}
