package graft.apps

import graft.model.{MyEventRecord, SendResult}
import graft.streaming.{AsyncEnrich, Marked, StatefulTtlDedup, StatefulTtlDedupTws, WindowedSink}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}

/**
 * The flagship app recomposed (SURVEY §3.1, mediation/MediationService.scala:71-145):
 *
 *   STEP 1   bootstrap: batch-scan historical record dirs, dedup by
 *            idempotent key, tag INITIAL_LOAD (:89-96, :270-315)
 *   STEP 2   stream: key by idempotent key (:110-127)
 *            validity split → toxic windowed sink (:129-131, 30 s windows)
 *   STEP 2.2 historical-vs-fresh dedup (D2): the reference broadcasts the
 *            historical key set as a side input and drops hits — the "new"
 *            branch emits nothing for them (:163-207). Spark-native twin:
 *            stream-static `left_anti` join against the broadcast historical
 *            key set. A bounded∪unbounded union is the shape the reference
 *            explicitly rejects (README NOTE 2) and Spark cannot even
 *            express — the join IS the supported construct (§7.3 #5).
 *   STEP 3-5 stateful TTL dedup → async HTTP per novel record (:125-135)
 *   STEP 5-6 (record, response) analytics output (:259-268)
 *
 * Scale posture: every stage is a streaming Dataset transform — state is
 * hash-partitioned by key across executors, the async stage bounds in-flight
 * requests per task, and the only driver-side work is query management. At
 * 1000 executors the bootstrap union is a file scan, not a collect.
 */
object MediationApp {

  final case class Config(
      ttlMillis: Long = 120000L, // local default ttl-time=120 s (application.conf:20)
      timerCleanup: Boolean = true, // state-store GC timer / Tws timer-clear
      toxicWindow: String = "30 seconds", // MediationService.scala:129
      watermarkDelay: String = "0 seconds", // allowedLateness=0 (W5)
      enrich: AsyncEnrich.Config = AsyncEnrich.Config(),
      // per-element firing (W3) by default; AvailableNow = bounded replay
      trigger: Trigger = Trigger.ProcessingTime(0L),
      // D3 engine: "tws" (transformWithState + native TTL + timer-clear,
      // RocksDB state store — the preferred §2.9 mapping) or "fmgws"
      // (flatMapGroupsWithState twin, any provider)
      d3: String = "tws",
      // bus source: "file" (dir-tail stand-in), "kafka" (needs the
      // spark-sql-kafka connector jar at runtime; see sources/Bus)
      source: String = "file",
      kafkaBootstrap: String = "",
      kafkaTopic: String = "")

  /** STEP 1 — bootstrap scan: union the historical dirs (S4 multi-path
    * scan), keep valid records, one per idempotent key, tagged INITIAL_LOAD
    * (getOldAvrosFromGCS, MediationService.scala:270-315).
    */
  def bootstrap(spark: SparkSession, paths: Seq[String],
      format: String = "parquet"): Dataset[MyEventRecord] = {
    import spark.implicits._
    // F4: prune non-existent dirs before building the scan, so a missing
    // date partition can't fail the job (MediationService.scala:274-295)
    val existing = graft.sources.Tables.existingPaths(spark, paths)
    if (existing.isEmpty) spark.emptyDataset[MyEventRecord]
    else {
      // "avro" = the reference's native bootstrap format (S3), served by
      // the avro-core container reader; other formats via the datasource
      val scan =
        if (format == "avro")
          graft.sources.AvroFiles.read(spark, existing,
            Encoders.product[MyEventRecord].schema)
        else spark.read.format(format).load(existing: _*)
      scan.as[MyEventRecord]
        .filter(_.isValid)
        .groupByKey(_.idempotentKey)
        .reduceGroups((a, _) => a).map(_._2) // distinctByKey (D1)
        .map(_.tagInitialLoad)
    }
  }

  /** Validity split (F1/F2): returns (ok, toxic). Both sides derive from one
    * plan; Spark evaluates the predicate twice rather than caching — cheaper
    * than a persist for a filter this narrow, and streaming-safe.
    */
  def validitySplit(events: Dataset[MyEventRecord])
      : (Dataset[MyEventRecord], Dataset[MyEventRecord]) =
    (events.filter(_.isValid), events.filter(r => !r.isValid))

  /** STEP 2-5 core: dedup-mark then enrich. Batch shape — also the body of
    * the streaming foreachBatch below, so batch and streaming share one
    * code path (micro-batch = bundle).
    */
  def processBatch(marked: Dataset[Marked], cfg: Config,
      client: () => AsyncEnrich.NotificationClient): Dataset[SendResult] =
    AsyncEnrich.enrich(marked, cfg.enrich, client)

  /**
   * Full streaming pipeline. `events` is an unbounded Dataset[MyEventRecord]
   * (MemoryStream in tests; file/kafka stream in production). Returns the
   * running analytics query; toxic records stream to `toxicPath` as windowed
   * files in parallel.
   */
  def start(spark: SparkSession, events: Dataset[MyEventRecord],
      historicalPaths: Seq[String], cfg: Config,
      client: () => AsyncEnrich.NotificationClient,
      outPath: String, toxicPath: String, checkpointRoot: String): Seq[StreamingQuery] = {
    import spark.implicits._

    val (ok, toxic) = validitySplit(events)

    // toxic quarantine: 30 s tumbling windows, one dir per window (K1)
    val toxicQuery = WindowedSink.start(
      toxic.map(r => (r.idempotentKey, r.event.nhubTimestamp.getOrElse(0L)))
        .toDF("idempotent_key", "ts_ms")
        .withColumn("event_time", timestamp_millis(col("ts_ms"))),
      "event_time", cfg.toxicWindow, cfg.watermarkDelay,
      toxicPath, s"$checkpointRoot/toxic", trigger = cfg.trigger)

    // D2: drop stream records whose key is in the historical snapshot —
    // stream-static left_anti on the broadcast key set. Historical hits
    // produce NO output, matching the reference's "new" branch emptiness
    // (MediationServiceSpec.scala:135-154).
    val novel =
      if (historicalPaths.isEmpty) ok
      else {
        val histKeys = bootstrap(spark, historicalPaths)
          .map(_.idempotentKey).toDF("idempotent_key")
        ok.withColumn("idempotent_key",
            concat_ws("-",
              coalesce(col("event.transactionId"), lit("null")),
              coalesce(col("customer.id"), lit("null"))))
          .join(broadcast(histKeys), Seq("idempotent_key"), "left_anti")
          .drop("idempotent_key")
          .as[MyEventRecord]
      }

    // D3: transformWithState (native TTL + timer-clear on RocksDB) is the
    // default engine; the flatMapGroupsWithState twin stays selectable for
    // providers without Tws support. NOTE Tws with a TTL runs
    // TimeMode.ProcessingTime, where Spark re-triggers no-data batches —
    // bounded drains (AvailableNow) and sink-polling tests are the
    // compatible harnesses (see StatefulTtlDedupTws).
    val deduped =
      if (cfg.d3 == "tws") {
        val providerKey = "spark.sql.streaming.stateStore.providerClass"
        // Tws needs a multi-column-family store; getOption surfaces the
        // HDFS-backed DEFAULT, so test for RocksDB rather than for absence
        if (!spark.conf.getOption(providerKey).exists(_.contains("RocksDB")))
          spark.conf.set(providerKey,
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        StatefulTtlDedupTws(novel, cfg.ttlMillis, timerClear = cfg.timerCleanup)
      } else StatefulTtlDedup(novel, cfg.ttlMillis, cfg.timerCleanup)

    // K5 log-effect taps → Spark-native observable metrics: per-batch row
    // counts surface through QueryProgressEvent.observedMetrics instead of
    // map(log.info) side effects (MediationService.scala:106,130,134)
    val analytics = deduped
      .observe("graft_dedup", count(lit(1)).as("rows"),
        count(when(col("status") === Marked.Sent, 1)).as("sent"))
    implicit val enc = Encoders.product[SendResult]
    val analyticsQuery = analytics.writeStream
      .outputMode(OutputMode.Append)
      // epoch-keyed OVERWRITE, not a flat append: foreachBatch makes sink
      // idempotence the app's duty — after a crash the engine REPLAYS the
      // failed epoch, and an append would double-write its rows. Writing
      // each epoch into its own batch=<id> partition dir with overwrite
      // makes the replay rewrite the same dir, so the sink is exactly-once
      // end-to-end (readers see one extra `batch` partition column).
      .foreachBatch { (batch: Dataset[Marked], epochId: Long) =>
        processBatch(batch.filter(!_.record.isInitialLoad), cfg, client)
          .write.mode("overwrite").parquet(s"$outPath/batch=$epochId")
      }
      .option("checkpointLocation", s"$checkpointRoot/analytics")
      .trigger(cfg.trigger)
      .start()

    Seq(analyticsQuery, toxicQuery)
  }

  /** S1 as a file-stream source: tail a directory of record files
    * (the message-bus stand-in in this environment; swap for
    * `format("kafka")` + `from_avro` against a real bus).
    */
  def fileStream(spark: SparkSession, dir: String): Dataset[MyEventRecord] = {
    import spark.implicits._
    spark.readStream
      .schema(Encoders.product[MyEventRecord].schema)
      .parquet(dir)
      .as[MyEventRecord]
  }

  /** S1 against the RUNNABLE unbounded bus ([[graft.sources.v2.GraftLogBusSource]]):
    * per-partition offsets, checkpoint resume, key-routed partitions so
    * per-key order holds into the dedup stage — the transport contract the
    * Kafka glue in [[graft.sources.Bus]] compiles for but cannot execute
    * in this environment. */
  def busStream(spark: SparkSession, root: String, topic: String,
      partitions: Int = 4): Dataset[MyEventRecord] =
    graft.sources.Bus.logBusRecordSource(spark, root, topic, partitions)

  /**
   * Runnable entry: drain the events directory once (Trigger.AvailableNow)
   * through the full pipeline and exit — the bounded-replay mode of the
   * reference's local runs. `GRAFT_ENDPOINT` selects a real HTTP endpoint;
   * otherwise sends go to the hermetic stub.
   */
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: MediationApp <eventsDir> <outPath> <toxicPath> <checkpoint> [histPath...]")
    val Array(eventsDir, outPath, toxicPath, ckpt) = args.take(4)
    val hist = args.drop(4).toSeq
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    val client: () => AsyncEnrich.NotificationClient =
      sys.env.get("GRAFT_ENDPOINT") match {
        case Some(ep) => () => new AsyncEnrich.JdkHttpClient(java.net.URI.create(ep))
        case None => () => new AsyncEnrich.StubClient()
      }
    val cfg = GraftConfig.load(sys.env.getOrElse("GRAFT_ENV", "dev"))
      .copy(trigger = Trigger.AvailableNow())
    // S1: bus source selected by config — Kafka (wire-decoded via the Avro
    // codec) when configured, the dir-tail stand-in otherwise
    val events = cfg.source match {
      case "kafka" =>
        graft.sources.Bus.kafkaRecordSource(spark, cfg.kafkaBootstrap, cfg.kafkaTopic)
      case _ => fileStream(spark, eventsDir)
    }
    try {
      val queries = start(spark, events, hist, cfg,
        client, outPath, toxicPath, ckpt)
      queries.foreach(_.awaitTermination())
    } finally spark.stop()
  }
}
