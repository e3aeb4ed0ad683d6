package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multi-way record routing — the reference's Either-based OK/KO partition
 * (mediation/MediationService.scala:233-251, SURVEY §2.4 F2).
 */
object Routing {

  /**
   * Two-way split on a predicate. The input should be cached (or be a cheap
   * scan) since both branches re-read it; in streaming, do the split inside
   * `foreachBatch` on the materialized micro-batch — same pattern the
   * reference gets from Beam's `partition` (one pass, two outputs).
   */
  def okKoSplit(df: DataFrame, isOk: Column): (DataFrame, DataFrame) =
    // NULL predicate routes to KO (same total partition as [[tagRoute]] and
    // the reference's Either split); a bare `!isOk` would drop NULL rows
    // from BOTH branches under three-valued logic.
    (df.filter(isOk), df.filter(!coalesce(isOk, lit(false))))

  /** One-pass routed form: adds a `route` tag column instead of splitting —
    * preferred at scale (single scan, downstream writers partition by tag).
    */
  def tagRoute(df: DataFrame, isOk: Column, okTag: String = "OK",
      koTag: String = "KO", routeCol: String = "route"): DataFrame =
    df.withColumn(routeCol, when(isOk, lit(okTag)).otherwise(lit(koTag)))
}
