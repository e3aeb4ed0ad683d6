package graft.spark

import graft.sources.lake.{GraftLake, GraftLakeSource}
import org.apache.spark.sql.{GraftDatasetBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, ReplaceTableAsSelect, UnresolvedTableSpec}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType, TimestampType}

/**
 * SQL grammar for the lake's MAINTENANCE operations — the statements
 * Delta adds through its own parser extension, with the same shapes:
 *
 * {{{
 *   VACUUM tbl [RETAIN n HOURS]
 *   OPTIMIZE tbl [ZORDER BY (x, y) [INTO n FILES]]
 *   RESTORE [TABLE] tbl [TO] VERSION AS OF n
 *   DESCRIBE HISTORY tbl
 * }}}
 *
 * `tbl` is a catalog table (`USING graft-lake`) or a quoted path
 * (`'/data/corpus'`). None of these parse in vanilla Spark SQL, so the
 * delegating parser intercepts exactly this family and hands everything
 * else — including every standard statement — to the session parser.
 * Injected via `spark.sql.extensions=graft.spark.GraftExtensions`
 * (`injectParser`).
 */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case Vacuum(target, hours, dry) =>
      LakeVacuumCommand(target,
        Option(hours).map(_.toLong).getOrElse(168L), // Delta's 7-day default
        dryRun = dry != null)
    case Optimize(target, where, zcols, n) =>
      LakeOptimizeCommand(target, Option(where),
        Option(zcols).map(_.split(',').toSeq.map(c => strip(c.trim))),
        Option(n).map(_.toInt).getOrElse(0))
    case Restore(target, version) =>
      LakeRestoreCommand(target, version.toLong)
    case RestoreTs(target, ts) =>
      LakeRestoreTimestampCommand(target, ts)
    case History(target) =>
      LakeHistoryCommand(target)
    case Detail(target) =>
      LakeDetailCommand(target)
    case Convert(path) =>
      LakeConvertCommand(path)
    case Clone(table, source, version, location) =>
      LakeCloneCommand(table, source, Option(location),
        Option(version).map(_.toLong))
    case _ => postProcess(delegate.parsePlan(sqlText))
  }

  override def parsePlanWithParameters(sqlText: String,
      ctx: ParameterContext): LogicalPlan = sqlText match {
    case Vacuum(_, _, _) | Optimize(_, _, _, _) | Restore(_, _) |
         RestoreTs(_, _) | History(_) |
         Detail(_) | Convert(_) | Clone(_, _, _, _) =>
      parsePlan(sqlText)
    case _ => postProcess(delegate.parsePlanWithParameters(sqlText, ctx))
  }

  /** CREATE OR REPLACE TABLE ... USING graft-lake AS SELECT: the
    * session-catalog resolver rejects REPLACE for v1 providers during
    * resolution (before any injectable rule can run), so the intercept
    * lives here, on the freshly parsed plan — rewritten into ONE atomic
    * lake `replace` commit instead of v2's non-atomic drop+create.
    * (PARTITIONED BY falls through: clustering is the lake's layout
    * tool, and the resolver's own error says so.) */
  private def postProcess(plan: LogicalPlan): LogicalPlan = plan match {
    case ReplaceTableAsSelect(
        UnresolvedIdentifier(nameParts, _), Seq(), query,
        spec: UnresolvedTableSpec, _, orCreate, _)
        if spec.provider.exists(_.equalsIgnoreCase("graft-lake")) =>
      LakeReplaceTableCommand(nameParts, GraftSqlParser.pathOf(spec),
        query, orCreate, spec.properties)
    case p => p
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {
  // target = a (possibly backquoted, possibly qualified) identifier or a
  // quoted path literal
  private val T = """([\w.`]+|'[^']+'|"[^"]+")"""
  private val Vacuum =
    ("""(?is)\s*VACUUM\s+""" + T +
      """(?:\s+RETAIN\s+(\d+)\s+HOURS)?(\s+DRY\s+RUN)?\s*;?\s*""").r
  private val Optimize =
    ("""(?is)\s*OPTIMIZE\s+""" + T +
      """(?:\s+WHERE\s+(.+?))??""" +
      """(?:\s+ZORDER\s+BY\s*\(\s*([\w`]+(?:\s*,\s*[\w`]+)+)\s*\)""" +
      """(?:\s+INTO\s+(\d+)\s+FILES)?)?\s*;?\s*""").r
  private val Restore =
    ("""(?is)\s*RESTORE\s+(?:TABLE\s+)?""" + T +
      """\s+(?:TO\s+)?VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""").r
  private val RestoreTs =
    ("""(?is)\s*RESTORE\s+(?:TABLE\s+)?""" + T +
      """\s+(?:TO\s+)?TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*""").r
  private val History =
    ("""(?is)\s*DESCRIBE\s+HISTORY\s+""" + T + """\s*;?\s*""").r
  private val Detail =
    ("""(?is)\s*DESCRIBE\s+DETAIL\s+""" + T + """\s*;?\s*""").r
  private val Convert =
    ("""(?is)\s*CONVERT\s+TO\s+LAKE\s+('[^']+'|"[^"]+")\s*;?\s*""").r
  private val Clone =
    ("""(?is)\s*CREATE\s+TABLE\s+([\w.`]+)\s+SHALLOW\s+CLONE\s+""" + T +
      """(?:\s+VERSION\s+AS\s+OF\s+(\d+))?""" +
      """(?:\s+LOCATION\s+'([^']+)')?\s*;?\s*""").r

  private[spark] def strip(s: String): String = {
    val t = s.trim
    if (t.length >= 2 &&
      ((t.head == '`' && t.last == '`') || (t.head == '\'' && t.last == '\'') ||
        (t.head == '"' && t.last == '"'))) t.substring(1, t.length - 1)
    else t
  }

  /** The explicit table location of a CREATE OR REPLACE spec: LOCATION
    * clause, or a literal `path` option. None → derive from the existing
    * table / the warehouse default at run time. */
  private[spark] def pathOf(spec: UnresolvedTableSpec): Option[String] =
    spec.location.orElse(spec.optionExpression.options.collectFirst {
      case (k, e) if k.equalsIgnoreCase("path") =>
        e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
            String.valueOf(v)
          case other => throw new IllegalArgumentException(
            s"graft-lake path option must be a literal, got $other")
        }
    }).map(GraftLakeSource.normalizePath)

  /** Resolve a maintenance-statement target to a lake root dir: a quoted
    * absolute path as-is, a table name through the session catalog. */
  private[spark] def dirOf(spark: SparkSession, target: String): String = {
    val t = strip(target)
    if (t.startsWith("/") || t.startsWith("file:")) GraftLakeSource.normalizePath(t)
    else {
      val ti = spark.sessionState.sqlParser.parseTableIdentifier(t)
      val ct = spark.sessionState.catalog.getTableMetadata(ti)
      GraftLakeSource.lakeDirOf(ct).getOrElse(throw new IllegalArgumentException(
        s"$t is not a graft-lake table (provider ${ct.provider.orNull})"))
    }
  }
}

/** CONVERT TO LAKE '<path>' — adopt an existing parquet directory as a
  * lake table in place: footer-only v0 commit, zero data rewrite (the
  * CONVERT TO DELTA migration shape; see [[GraftLake.convert]] for the
  * name-keyed schema and hive-layout refusal). Register it in the
  * catalog afterwards with plain `CREATE TABLE t USING graft-lake
  * OPTIONS (path ...)` — that statement adopts an existing log. */
case class LakeConvertCommand(target: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftSqlParser.strip(target)
    require(t.startsWith("/") || t.startsWith("file:"),
      s"CONVERT TO LAKE takes a quoted path, got $target")
    Seq(Row(GraftLake.convert(spark, GraftLakeSource.normalizePath(t))))
  }
}

/** CREATE TABLE t SHALLOW CLONE src [LOCATION '<path>'] — a zero-copy
  * clone (Delta's grammar): one metadata commit referencing the source's
  * current files by absolute path, then a normal catalog registration.
  * `src` is a lake table name or a quoted path; the clone lands at
  * LOCATION (external) or the warehouse default for `t` (managed). */
case class LakeCloneCommand(table: String, source: String,
    location: Option[String], versionAsOf: Option[Long] = None)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val srcDir = GraftSqlParser.dirOf(spark, source)
    val ti = spark.sessionState.sqlParser
      .parseTableIdentifier(GraftSqlParser.strip(table))
    val catalog = spark.sessionState.catalog
    require(!catalog.tableExists(ti), s"table ${ti.quotedString} already exists")
    val dstDir = location.map(GraftLakeSource.normalizePath).getOrElse(
      GraftLakeSource.normalizePath(catalog.defaultTablePath(ti).toString))
    val v = GraftLake.shallowClone(spark, srcDir, dstDir,
      asOf = versionAsOf)
    val schema = GraftLake.snapshot(spark, dstDir).schema
    // registration can still lose to a concurrent CREATE that won the
    // name despite the tableExists pre-check above — the clone's v0 log
    // is already on disk by then, so unwind it rather than strand a
    // populated lake directory with no catalog entry (the same
    // create-then-fail ordering hazard validateTableProps closes for
    // CREATE/REPLACE). A shallow clone is metadata-only, so deleting
    // the dst log loses nothing but the clone commit itself.
    try {
      catalog.createTable(CatalogTable(
        identifier = ti,
        tableType = if (location.isDefined) CatalogTableType.EXTERNAL
          else CatalogTableType.MANAGED,
        storage = CatalogStorageFormat.empty.copy(
          locationUri = Some(new org.apache.hadoop.fs.Path(dstDir).toUri),
          properties = Map("path" -> dstDir)),
        schema = schema,
        provider = Some("graft-lake")), ignoreIfExists = false,
        validateLocation = false)
    } catch {
      case e: Throwable =>
        GraftLake.deleteTableDir(dstDir)
        throw e
    }
    spark.catalog.refreshTable(ti.quotedString)
    Seq(Row(v))
  }
}

/** VACUUM: reclaim orphan debris and tombstoned files older than the
  * retention window (history to those versions is given up — Delta's
  * contract). Returns the number of files deleted — or, under DRY RUN
  * (Delta's grammar), the would-be-deleted paths with nothing touched:
  * the operator's look-before-you-give-up-history answer. */
case class LakeVacuumCommand(target: String, retainHours: Long,
    dryRun: Boolean = false) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    if (dryRun) Seq(AttributeReference("path", StringType, nullable = false)())
    else Seq(AttributeReference("deleted_files", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftSqlParser.dirOf(spark, target)
    val age = retainHours * 3600L * 1000L
    if (dryRun) {
      val (d, dv) = GraftLake.vacuumDoomed(spark, dir, keepHistory = false,
        minAgeMillis = age, now = System.currentTimeMillis())
      (d ++ dv).sorted.map(Row(_))
    } else Seq(Row(GraftLake.vacuum(spark, dir,
      keepHistory = false, minAgeMillis = age)))
  }
}

/** OPTIMIZE [ZORDER BY]: bin-pack small files, or rewrite the table
  * Morton-clustered on N columns (quantile-bucketed ids interleaved —
  * see [[graft.sources.Layout.clusteredZValue]]). Returns the committed
  * version. */
case class LakeOptimizeCommand(target: String, where: Option[String],
    zorder: Option[Seq[String]],
    numFiles: Int) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftSqlParser.dirOf(spark, target)
    // WHERE = targeted compaction: only stat-overlapping files compact
    // (file granularity — rows are never filtered by OPTIMIZE)
    val scope = where.map(w => org.apache.spark.sql.GraftColumnBridge.column(
      spark.sessionState.sqlParser.parseExpression(w)))
    val v = zorder match {
      case Some(cols) =>
        require(scope.isEmpty,
          "OPTIMIZE ... WHERE is not supported together with ZORDER BY " +
            "(z-ordering is a whole-table layout)")
        val n =
          if (numFiles > 0) numFiles
          else { // default: ~128 MB targets over the current active bytes
            val bytes = GraftLake.snapshot(spark, dir).files.map(_.bytes).sum
            math.max(1, math.ceil(bytes.toDouble / (128L << 20)).toInt)
          }
        GraftLake.optimizeZOrder(spark, dir, cols, n)
      case None => GraftLake.optimize(spark, dir, where = scope)
    }
    Seq(Row(v))
  }
}

/** DESCRIBE DETAIL t — one row of table-level facts straight from the
  * log fold (Delta's command of the same name): version, file count,
  * live bytes, live rows (DV-exact), deletion-vector census, and the
  * folded checkpoint cadence. Pure metadata — no data scan. */
case class LakeDetailCommand(target: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("format", StringType, nullable = false)(),
    AttributeReference("location", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("num_files", LongType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)(),
    AttributeReference("num_rows", LongType, nullable = false)(),
    AttributeReference("num_deletion_vectors", LongType, nullable = false)(),
    AttributeReference("dv_deleted_rows", LongType, nullable = false)(),
    AttributeReference("checkpoint_every", IntegerType, nullable = false)(),
    AttributeReference("clustered_by", StringType, nullable = true)(),
    AttributeReference("unclustered_files", LongType, nullable = false)(),
    AttributeReference("properties", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftSqlParser.dirOf(spark, target)
    val snap = GraftLake.snapshot(spark, dir)
    val dvRows = snap.files.flatMap(_.dv.map(_.cardinality)).sum
    // clustering staleness: how many active files a bare OPTIMIZE would
    // rewrite (files outside every zorder generation, or DV-carrying) —
    // the "is it time to compact" number an operator watches
    val clusteredBy = snap.props.get("clusterBy")
    val unclustered = if (clusteredBy.isEmpty) 0L
      else GraftLake.unclusteredFiles(snap).size.toLong
    // Jackson, not string concat: property VALUES are user input and may
    // carry quotes/backslashes — hand-built JSON would be invalid
    val propsNode = LakeDetailCommand.mapper.createObjectNode()
    snap.props.toSeq.sorted.foreach { case (k, v) => propsNode.put(k, v) }
    val propsJson = propsNode.toString
    Seq(Row("graft-lake", dir, snap.version, snap.files.size.toLong,
      snap.files.map(_.bytes).sum,
      snap.files.map(_.rows).sum - dvRows,
      snap.files.count(_.dv.isDefined).toLong, dvRows, snap.ckptEvery,
      clusteredBy.orNull, unclustered, propsJson))
  }
}

object LakeDetailCommand {
  private[spark] val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
}

/** RESTORE TABLE t TO TIMESTAMP AS OF 'ts' — resolve the wall-clock
  * instant to the latest commit at or before it (the TIMESTAMP AS OF
  * read semantics), then roll back as a new auditable commit. */
case class LakeRestoreTimestampCommand(target: String, ts: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftSqlParser.dirOf(spark, target)
    val millis = java.sql.Timestamp.valueOf(ts).getTime
    val v = GraftLake.versionAtTimestamp(dir, millis)
    Seq(Row(GraftLake.restore(spark, dir, v)))
  }
}

/** RESTORE TABLE t TO VERSION AS OF n — roll back as a new auditable
  * commit. Returns the committed version. */
case class LakeRestoreCommand(target: String, version: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val v = GraftLake.restore(spark, GraftSqlParser.dirOf(spark, target), version)
    Seq(Row(v))
  }
}

/** CREATE [OR REPLACE] TABLE ... USING graft-lake AS SELECT, replace
  * half: ONE atomic lake `replace` commit (files + schema reset, fresh
  * never-reused field ids; pre-replace snapshots stay time-travelable),
  * vs v2's non-atomic drop+create. The metastore entry is created or
  * schema-synced so DESCRIBE/SHOW stay truthful. */
case class LakeReplaceTableCommand(nameParts: Seq[String],
    explicitPath: Option[String], query: LogicalPlan, orCreate: Boolean,
    tableProps: Map[String, String] = Map.empty)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(spark: SparkSession): Seq[Row] = {
    require(nameParts.size <= 2,
      s"graft-lake REPLACE TABLE supports session-catalog tables, got " +
        nameParts.mkString("."))
    val ti = TableIdentifier(nameParts.last, nameParts.init.lastOption)
    val catalog = spark.sessionState.catalog
    val exists = catalog.tableExists(ti)
    if (!exists && !orCreate)
      throw new IllegalArgumentException(
        s"table ${ti.quotedString} does not exist; use CREATE OR REPLACE")
    val existingCt = if (exists) Some(catalog.getTableMetadata(ti)) else None
    existingCt.foreach(ct => require(
      ct.provider.exists(_.equalsIgnoreCase("graft-lake")),
      s"${ti.quotedString} exists with provider ${ct.provider.orNull}; " +
        "REPLACE across providers is not supported"))
    val dir = explicitPath
      .orElse(existingCt.flatMap(GraftLakeSource.lakeDirOf))
      .getOrElse(GraftLakeSource.normalizePath(
        catalog.defaultTablePath(ti).toString))
    val df = GraftDatasetBridge.ofRows(spark, query)
    // props validate BEFORE the replace/create commit — an invalid
    // clusterBy must fail the whole statement with nothing written
    GraftLake.validateTableProps(df.schema, tableProps)
    if (GraftLake.latestVersion(dir) >= 0) GraftLake.replaceTable(df, dir)
    else GraftLake.create(df, dir)
    if (tableProps.nonEmpty) GraftLake.setProperties(spark, dir, tableProps)
    val schema = GraftLake.snapshot(spark, dir).schema
    existingCt match {
      case Some(ct) =>
        catalog.alterTable(ct.copy(schema = schema,
          storage = ct.storage.copy(
            properties = ct.storage.properties + ("path" -> dir))))
      case None =>
        catalog.createTable(CatalogTable(
          identifier = ti,
          // same managed/external split as LakeCreateTableCommand
          tableType = if (explicitPath.isDefined) CatalogTableType.EXTERNAL
            else CatalogTableType.MANAGED,
          storage = CatalogStorageFormat.empty.copy(
            locationUri = Some(new org.apache.hadoop.fs.Path(dir).toUri),
            properties = Map("path" -> dir)),
          schema = schema,
          provider = Some("graft-lake")), ignoreIfExists = false,
          // the data was written BEFORE registration (v1 CTAS order) —
          // the location legitimately exists already
          validateLocation = false)
    }
    spark.catalog.refreshTable(ti.quotedString)
    Seq.empty
  }
}

/** CREATE TABLE [AS SELECT] for graft-lake under the v2 provider route
  * (the TableProvider face flips `isV2Provider`, so these arrive as v2
  * plans): CTAS creates the lake table at the resolved location as ONE
  * `create` commit; a plain CREATE with columns makes an empty table; a
  * plain CREATE without columns registers an EXISTING lake table (v1
  * external-table semantics — schema inferred from the log). The
  * metastore entry mirrors the log's schema, exactly as
  * [[LakeReplaceTableCommand]] does. */
case class LakeCreateTableCommand(nameParts: Seq[String],
    explicitPath: Option[String], userSchema: StructType,
    query: Option[LogicalPlan], ignoreIfExists: Boolean,
    tableProps: Map[String, String] = Map.empty)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = query.toSeq

  override def run(spark: SparkSession): Seq[Row] = {
    require(nameParts.size <= 2,
      s"graft-lake CREATE TABLE supports session-catalog tables, got " +
        nameParts.mkString("."))
    val ti = TableIdentifier(nameParts.last, nameParts.init.lastOption)
    val catalog = spark.sessionState.catalog
    if (catalog.tableExists(ti)) {
      if (ignoreIfExists) return Seq.empty
      throw new IllegalArgumentException(
        s"table ${ti.quotedString} already exists")
    }
    val dir = explicitPath.getOrElse(GraftLakeSource.normalizePath(
      catalog.defaultTablePath(ti).toString))
    val exists = GraftLake.latestVersion(dir) >= 0
    query match {
      case Some(q) =>
        if (exists) throw new IllegalArgumentException(
          s"lake table already exists: $dir")
        val df = GraftDatasetBridge.ofRows(spark, q)
        // props validate BEFORE any side effect: an invalid clusterBy
        // must not leave a lake directory with no catalog entry behind
        GraftLake.validateTableProps(df.schema, tableProps)
        GraftLake.create(df, dir)
      case None if exists => // external registration: adopt the log
        GraftLake.validateTableProps(
          GraftLake.snapshot(spark, dir).schema, tableProps)
      case None =>
        require(userSchema.nonEmpty,
          s"no lake table at $dir and no schema given — supply columns " +
            "or AS SELECT")
        GraftLake.validateTableProps(userSchema, tableProps)
        GraftLake.create(
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[Row], userSchema), dir)
    }
    if (tableProps.nonEmpty) GraftLake.setProperties(spark, dir, tableProps)
    val schema = GraftLake.snapshot(spark, dir).schema
    catalog.createTable(CatalogTable(
      identifier = ti,
      // no explicit path = a MANAGED table at the warehouse default —
      // DROP TABLE then deletes the directory (v1 saveAsTable parity);
      // an explicit path/LOCATION is EXTERNAL and survives DROP
      tableType = if (explicitPath.isDefined) CatalogTableType.EXTERNAL
        else CatalogTableType.MANAGED,
      storage = CatalogStorageFormat.empty.copy(
        locationUri = Some(new org.apache.hadoop.fs.Path(dir).toUri),
        properties = Map("path" -> dir)),
      schema = schema,
      provider = Some("graft-lake")), ignoreIfExists = false,
      // data written before registration (v1 CTAS order) — the location
      // legitimately exists already
      validateLocation = false)
    spark.catalog.refreshTable(ti.quotedString)
    Seq.empty
  }
}

/** DESCRIBE HISTORY t — the commit log as a result set (newest first,
  * Delta's ordering). */
case class LakeHistoryCommand(target: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = false)(),
    AttributeReference("timestamp", TimestampType, nullable = false)(),
    AttributeReference("num_added_files", IntegerType, nullable = false)(),
    AttributeReference("num_removed_files", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    GraftLake.history(GraftSqlParser.dirOf(spark, target)).reverse.map {
      case (v, op, ts, adds, removes) =>
        Row(v, op, new java.sql.Timestamp(ts), adds, removes)
    }
}
