package graft.spark

import graft.sources.lake.{GraftLake, LakeFileIndex}
import org.apache.spark.sql.{Column, GraftColumnBridge, GraftDatasetBridge, Row, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{EliminateSubqueryAliases, UnresolvedAttribute}
import org.apache.spark.sql.catalyst.catalog.CatalogTable
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteFromTable, InsertIntoStatement, LogicalPlan, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InsertIntoHadoopFsRelationCommand, LogicalRelation}
import org.apache.spark.sql.functions.lit

/**
 * SQL DML over [[graft.sources.lake.GraftLakeSource]] tables, the seam
 * Delta's DeltaAnalysis rule uses: a post-hoc resolution rule that
 * re-routes DML plans whose target resolves to a [[LakeFileIndex]]
 * relation onto the TRANSACTIONAL lake operations.
 *
 *  - `INSERT INTO` / `INSERT OVERWRITE`: Spark's DataSourceAnalysis turns
 *    these into a direct parquet write into the relation's root path
 *    (`InsertIntoHadoopFsRelationCommand`) — which would land files the
 *    log never references (silently invisible rows) — so the rule matches
 *    the converted command (and the pre-conversion statement, whichever
 *    this batch sees first) and replaces it with a log-fenced
 *    append/overwrite commit.
 *  - `DELETE FROM` / `UPDATE`: the parser produces v2-only plans that
 *    would fail analysis for a v1 relation; the rule rewrites them into
 *    the lake's copy-on-write delete/update, resolved-attribute
 *    conditions mapped back to by-name columns (the rewrite re-reads the
 *    victim files, so the original exprIds do not survive).
 *
 * Inject via `spark.sql.extensions=graft.spark.GraftExtensions`.
 */
object LakeDmlRule extends Rule[LogicalPlan] {

  /** The lake table behind a resolved relation plan, if any. */
  private def lakeTarget(plan: LogicalPlan): Option[(String, Option[CatalogTable])] =
    EliminateSubqueryAliases(plan) match {
      case LogicalRelation(r: HadoopFsRelation, _, table, _, _) =>
        r.location match {
          case idx: LakeFileIndex => Some((idx.dir, table))
          case _ => None
        }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    // normal path: DataSourceAnalysis (earlier in the post-hoc batch) has
    // already converted the insert; intercept the raw-parquet write
    case InsertIntoHadoopFsRelationCommand(_, _, _, _, _, _, _, query, mode,
        table, Some(idx: LakeFileIndex), _) =>
      LakeInsertCommand(idx.dir, query, mode == SaveMode.Overwrite, table)
    // defensive twin in case the statement reaches us unconverted
    case i @ InsertIntoStatement(target, _, _, query, overwrite, _, _)
        if query.resolved && lakeTarget(target).isDefined =>
      val (dir, table) = lakeTarget(target).get
      LakeInsertCommand(dir, query, overwrite, table)
    case DeleteFromTable(target, condition) if lakeTarget(target).isDefined =>
      val (dir, table) = lakeTarget(target).get
      LakeDeleteCommand(dir, condition, table)
    case UpdateTable(target, assignments, condition)
        if lakeTarget(target).isDefined =>
      val (dir, table) = lakeTarget(target).get
      val sets = assignments.map {
        case Assignment(key: AttributeReference, value) => key.name -> value
        case Assignment(other, _) => throw new IllegalArgumentException(
          s"graft-lake UPDATE supports top-level columns only, got $other")
      }
      LakeUpdateCommand(dir, sets, condition, table)
  }

  /** Resolved exprIds don't survive the CoW re-read of victim files —
    * map attributes back to by-name references before handing the
    * condition to the lake API. */
  private[spark] def byName(e: Expression): Column =
    GraftColumnBridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })

  private[spark] def refresh(spark: SparkSession,
      table: Option[CatalogTable]): Unit =
    // drop the cached relation (its LakeFileIndex pins the pre-DML
    // snapshot) so the next SELECT resolves a fresh one
    table.foreach(t => spark.catalog.refreshTable(t.identifier.quotedString))
}

/** INSERT INTO (append) / INSERT OVERWRITE as log-fenced lake commits. */
case class LakeInsertCommand(dir: String, query: LogicalPlan,
    overwrite: Boolean, table: Option[CatalogTable])
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)
  override def run(spark: SparkSession): Seq[Row] = {
    val df = GraftDatasetBridge.ofRows(spark, query)
    if (overwrite) GraftLake.overwrite(df, dir) else GraftLake.append(df, dir)
    LakeDmlRule.refresh(spark, table)
    Seq.empty
  }
}

/** DELETE FROM as the lake's copy-on-write delete. */
case class LakeDeleteCommand(dir: String, condition: Expression,
    table: Option[CatalogTable]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    GraftLake.delete(spark, dir, LakeDmlRule.byName(condition))
    LakeDmlRule.refresh(spark, table)
    Seq.empty
  }
}

/** UPDATE as the lake's copy-on-write update. */
case class LakeUpdateCommand(dir: String, sets: Seq[(String, Expression)],
    condition: Option[Expression], table: Option[CatalogTable])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    GraftLake.update(spark, dir,
      condition.map(LakeDmlRule.byName).getOrElse(lit(true)),
      sets.map { case (n, v) => n -> LakeDmlRule.byName(v) })
    LakeDmlRule.refresh(spark, table)
    Seq.empty
  }
}
