package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.internal.SQLConf

/**
 * Catalyst optimizer rule: transparent MATERIALIZED-VIEW rewrite for
 * SUM/COUNT aggregates. Given one registered MV definition
 *
 *   spark.graft.mv.def = <factPath>::<mvPath>::<g1,g2,...>::<s1,s2,...>
 *
 * where the MV parquet at `mvPath` was produced as
 * `fact.groupBy(g1..gn).agg(sum(s_i) as sum_<s_i> ..., count(*) as cnt)`,
 * any aggregate over the FACT relation that groups by a SUBSET of the MV's
 * grouping columns and computes only `sum(s_i)` / `count(*)` is rewritten
 * to read the (orders-of-magnitude smaller) MV instead:
 * `sum(x) → sum(sum_x)`, `count(*) → sum(cnt)` — SUM and COUNT roll up,
 * so coarser groupings come free (the classic summary-table algebra;
 * AVG = sum/count composes on top, MIN/MAX do NOT roll through deletes
 * and are deliberately not matched, same boundary as
 * [[graft.ops.Cdc.maintainSumCount]]).
 *
 * The rewritten Aggregate preserves the original output attribute ids
 * (each output is re-aliased under its old exprId), so parent operators
 * resolve unchanged — the rewrite is invisible above the aggregate.
 * Correctness requires the MV to be CURRENT with the fact table; keeping
 * it current is [[graft.ops.Cdc.maintainSumCount]]'s job. Off unless the
 * conf is set; scope is one MV definition (a registry is a loop over
 * this).
 */
object MvRewriteRule extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.mv.def"

  private case class MvDef(factPath: String, mvPath: String,
      groupCols: Set[String], sumCols: Set[String])

  private def parseDef: Option[MvDef] = {
    val raw = SQLConf.get.getConfString(ConfKey, "")
    raw.split("::", -1) match {
      case Array(f, m, g, s) if f.nonEmpty && m.nonEmpty =>
        Some(MvDef(f, m, g.split(',').map(_.trim).filter(_.nonEmpty).toSet,
          s.split(',').map(_.trim).filter(_.nonEmpty).toSet))
      case _ => None
    }
  }

  private def factScan(p: LogicalPlan, factPath: String): Boolean = p match {
    case lr: LogicalRelation => lr.relation match {
      case h: HadoopFsRelation =>
        val want = factPath.stripSuffix("/")
        h.location.rootPaths.exists(_.toString.stripSuffix("/").endsWith(want))
      case _ => false
    }
    case Project(projectList, child)
        if projectList.forall(_.isInstanceOf[AttributeReference]) =>
      factScan(child, factPath)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = parseDef match {
    case None => plan
    case Some(mv) => plan.transformUp {
      case agg @ Aggregate(groupExprs, aggExprs, child, _)
          if factScan(child, mv.factPath) =>
        rewrite(agg, mv).getOrElse(agg)
    }
  }

  private def rewrite(agg: Aggregate, mv: MvDef): Option[LogicalPlan] = {
    // every grouping expression must be a bare fact column the MV groups by
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference if mv.groupCols.contains(a.name) => Some(a)
      case _ => None
    }
    if (groupAttrs.exists(_.isEmpty)) return None

    val mvPlan = SparkSession.active.read.parquet(mv.mvPath)
      .queryExecution.analyzed
    val mvAttr: Map[String, Attribute] =
      mvPlan.output.map(a => a.name -> a).toMap
    if (!mv.groupCols.forall(mvAttr.contains) || !mvAttr.contains("cnt") ||
        !mv.sumCols.forall(c => mvAttr.contains(s"sum_$c"))) return None

    def sumOf(a: Attribute): Expression =
      AggregateExpression(Sum(a), Complete, isDistinct = false)

    // map each output: grouping attr → MV attr; sum(x) → sum(sum_x);
    // count(1) → sum(cnt); anything else → decline
    val mapped: Seq[Option[NamedExpression]] = agg.aggregateExpressions.map {
      case a: AttributeReference if mv.groupCols.contains(a.name) =>
        Some(Alias(mvAttr(a.name), a.name)(exprId = a.exprId))
      case al @ Alias(a: AttributeReference, name)
          if mv.groupCols.contains(a.name) =>
        Some(Alias(mvAttr(a.name), name)(exprId = al.exprId))
      case al @ Alias(AggregateExpression(Sum(a: AttributeReference, _), _, false, None, _), name)
          if mv.sumCols.contains(a.name) &&
            !a.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType] =>
        // decimal declines: sum(decimal(p,s)) widens precision per level,
        // so re-summing the MV column would change the result type
        Some(Alias(sumOf(mvAttr(s"sum_${a.name}")), name)(exprId = al.exprId))
      case al @ Alias(AggregateExpression(Count(Seq(Literal(1, _))), _, false, None, _), name) =>
        // count is non-null 0 on empty input; sum is null — coalesce keeps
        // the global-aggregate-over-empty-fact case exact
        Some(Alias(Coalesce(Seq(sumOf(mvAttr("cnt")), Literal(0L))), name)(
          exprId = al.exprId))
      case _ => None
    }
    if (mapped.exists(_.isEmpty)) return None

    val newGroups = groupAttrs.map(g => mvAttr(g.get.name))
    Some(Aggregate(newGroups, mapped.map(_.get), mvPlan))
  }
}
