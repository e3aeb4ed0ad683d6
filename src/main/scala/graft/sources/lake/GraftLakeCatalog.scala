package graft.sources.lake

import java.util.Collections

import org.apache.spark.sql.{GraftCatalogBridge, SparkSession}
import org.apache.spark.sql.catalyst.catalog.CatalogTable
import org.apache.spark.sql.connector.catalog.{DelegatingCatalogExtension, Identifier, Table, TableCapability, TableChange}
import org.apache.spark.sql.types.StructType

/**
 * DSv2 session-catalog extension for GraftLake tables — the seam Delta's
 * DeltaCatalog uses. Configure with
 * `spark.sql.catalog.spark_catalog=graft.sources.lake.GraftLakeCatalog`
 * (plus `spark.sql.extensions=graft.spark.GraftExtensions`): every
 * catalog lookup of a `USING graft-lake` table then resolves to a v2
 * [[GraftLakeTable]] instead of the session catalog's V1Table, which is
 * what lets SQL reach the lake's transactional DDL/DML:
 *
 *  - `ALTER TABLE ... RENAME/DROP/ADD COLUMN` — v1 session-catalog tables
 *    are REJECTED during resolution (`UNSUPPORTED_FEATURE.TABLE_OPERATION`,
 *    before any injectable rule runs), so a v2 table is the only way in.
 *    Changes land as the lake's field-id metadata commits
 *    ([[GraftLake.renameColumn]]/[[GraftLake.dropColumn]]/
 *    [[GraftLake.addColumn]]) and are mirrored into the metastore schema
 *    so DESCRIBE stays truthful.
 *  - `MERGE INTO` — resolves against the v2 relation; the post-hoc
 *    [[graft.spark.LakeDmlRule]] then rewrites it onto
 *    [[GraftLake.mergeInto]]'s copy-on-write commit.
 *  - `SELECT ... VERSION AS OF v / TIMESTAMP AS OF ts` — the time-travel
 *    `loadTable` overloads pin the snapshot version.
 *
 * READS stay on the v1 planner-integrated path: [[GraftLakeTable]]
 * carries no scan capability, and LakeDmlRule swaps the naked v2
 * relation for the [[LakeFileIndex]] LogicalRelation (exprId-preserving),
 * so `SELECT` keeps planning the same footer-stats-pruned
 * FileSourceScan as before. All non-lake tables delegate untouched.
 *
 * Reference: the engine's tables are plain catalog objects
 * (reference queries address tables by name throughout); here the
 * lakehouse layer joins the catalog the way Delta/Iceberg users expect.
 */
class GraftLakeCatalog extends DelegatingCatalogExtension {

  private def spark = SparkSession.active

  /** The lake root dir behind a catalog table, if it IS a lake table. */
  private def lakeDir(ct: CatalogTable): Option[String] =
    GraftLakeSource.lakeDirOf(ct)

  private def asLake(t: Table, asOf: Option[Long]): Option[GraftLakeTable] =
    for {
      ct <- GraftCatalogBridge.v1CatalogTable(t)
      dir <- lakeDir(ct)
    } yield GraftLakeTable(ct, dir, asOf)

  override def loadTable(ident: Identifier): Table = {
    val t = super.loadTable(ident)
    asLake(t, None).getOrElse(t)
  }

  /** `VERSION AS OF v` — the catalog API's String-version overload.
    * Lake-ness is checked BEFORE parsing the version: a non-lake table's
    * version string is whatever its own connector accepts, so it must
    * reach `super.loadTable` unparsed (not die on `toLong`). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val t = super.loadTable(ident)
    GraftCatalogBridge.v1CatalogTable(t).flatMap(lakeDir) match {
      case Some(dir) =>
        val v =
          try version.toLong
          catch {
            case _: NumberFormatException => throw new IllegalArgumentException(
              s"graft-lake VERSION AS OF takes a numeric version, got '$version'")
          }
        GraftLakeTable(GraftCatalogBridge.v1CatalogTable(t).get, dir, Some(v))
      case None => super.loadTable(ident, version)
    }
  }

  /** `TIMESTAMP AS OF ts` — micros since epoch, resolved to the latest
    * version committed at or before that instant. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val t = super.loadTable(ident)
    GraftCatalogBridge.v1CatalogTable(t).flatMap(lakeDir) match {
      case Some(dir) =>
        val v = GraftLake.versionAtTimestamp(dir, timestampMicros / 1000L)
        asLake(t, Some(v)).get
      case None => super.loadTable(ident, timestampMicros)
    }
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val cur = super.loadTable(ident)
    GraftCatalogBridge.v1CatalogTable(cur).flatMap(lakeDir) match {
      case Some(dir) =>
        changes.foreach {
          case r: TableChange.RenameColumn =>
            require(r.fieldNames.length == 1,
              "graft-lake ALTER TABLE supports top-level columns only")
            GraftLake.renameColumn(spark, dir, r.fieldNames()(0), r.newName)
          case d: TableChange.DeleteColumn =>
            require(d.fieldNames.length == 1,
              "graft-lake ALTER TABLE supports top-level columns only")
            GraftLake.dropColumn(spark, dir, d.fieldNames()(0))
          case a: TableChange.AddColumn =>
            require(a.fieldNames.length == 1,
              "graft-lake ALTER TABLE supports top-level columns only")
            GraftLake.addColumn(spark, dir, a.fieldNames()(0), a.dataType)
          case p: TableChange.SetProperty =>
            // checkpointEvery routes to its dedicated folded field inside
            // setProperties; everything else (clusterBy, user metadata)
            // folds through the general props map — one commit either way
            GraftLake.setProperties(spark, dir, Map(p.property -> p.value))
          case p: TableChange.RemoveProperty =>
            GraftLake.setProperties(spark, dir, Map.empty, Seq(p.property))
          case other => throw new UnsupportedOperationException(
            s"graft-lake ALTER TABLE does not support change $other " +
              "(supported: RENAME COLUMN, DROP COLUMN, ADD COLUMN, " +
              "SET/UNSET TBLPROPERTIES)")
        }
        // mirror into the metastore schema so DESCRIBE / SHOW stay
        // truthful (the lake LOG remains the source of truth for reads)
        super.alterTable(ident, changes: _*)
        loadTable(ident)
      case None => super.alterTable(ident, changes: _*)
    }
  }
}

/**
 * The v2 face of one lake table (at one optional time-travel version).
 * Deliberately capability-FREE: it exists so DDL/DML resolve against a
 * v2 table, while every actual read is rerouted by LakeDmlRule onto the
 * v1 [[LakeFileIndex]] relation before planning (Delta's
 * DeltaTableV2-with-v1-fallback shape). Schema comes from the lake LOG
 * snapshot (field-id metadata included), not the metastore copy.
 */
final case class GraftLakeTable(ct: CatalogTable, dir: String,
    asOf: Option[Long]) extends Table
    with org.apache.spark.sql.GraftV1FallbackTable {

  /** One consistent snapshot per catalog lookup. */
  private val snap0 = GraftLake.snapshot(SparkSession.active, dir, asOf)
  val snapshotSchema: StructType = snap0.schema

  /** The streaming fallback seam: `spark.readStream.table("t")` resolves
    * this CatalogTable's v1 provider (graft-lake) and plans the
    * version-offset changelog [[LakeStreamSource]]. */
  override def v1Table: CatalogTable = ct

  override def name(): String = ct.identifier.unquotedString

  override def schema(): StructType = snapshotSchema

  /** Scan/write capabilities stay EMPTY (reads reroute to the v1
    * planner-integrated relation; writes land as log commits via
    * LakeDmlRule) — but `AUTOMATIC_SCHEMA_EVOLUTION` is declared: it
    * gates Spark's own `ResolveMergeIntoSchemaEvolution`, which computes
    * the new columns a `MERGE WITH SCHEMA EVOLUTION` needs (star actions
    * AND explicit assignments referencing source-only columns), applies
    * them through this catalog's `alterTable`, and re-resolves — the
    * standard Spark seam, and the only way explicit new-column
    * assignments can resolve at all (they name a column the un-evolved
    * target doesn't have). */
  override def capabilities(): java.util.Set[TableCapability] =
    Collections.singleton(TableCapability.AUTOMATIC_SCHEMA_EVOLUTION)

  /** SHOW TBLPROPERTIES truth comes from the LOG's folded props (the
    * metastore copy can lag API-side setProperties), plus the fixed
    * provider/location facts. */
  override def properties(): java.util.Map[String, String] = {
    val m = new java.util.HashMap[String, String]()
    snap0.props.foreach { case (k, v) => m.put(k, v) }
    if (snap0.ckptEvery > 0) m.put("checkpointEvery", snap0.ckptEvery.toString)
    m.put("provider", "graft-lake")
    m.put("location", dir)
    asOf.foreach(v => m.put("versionAsOf", v.toString))
    m
  }
}
