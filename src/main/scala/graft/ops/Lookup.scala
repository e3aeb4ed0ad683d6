package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Broadcast lookup joins — the reference's side-input join family
 * (SURVEY §2.6 J1/J2, §2.5 D2).
 *
 * Scale posture: the build side of every lookup here is explicitly
 * `broadcast()`-hinted — the reference asserts the side input fits in worker
 * memory (mediation/README.md:136-138); we preserve that contract and its
 * failure mode is an explicit driver error, not a silent 100 TB shuffle.
 */
object Lookup {

  /**
   * J1's uniqueness contract: Beam's `asMapSingletonSideInput` CRASHES on
   * duplicate build keys (test asserts PipelineExecutionException,
   * MediationServiceSpec.scala:156-173). Spark broadcast joins silently
   * multiply rows instead, so strict mode re-creates the reference behavior:
   * assert build-side key uniqueness with one cheap aggregate.
   */
  def assertUniqueKeys(lookup: DataFrame, keyCol: String): DataFrame = {
    val dups = lookup.groupBy(col(keyCol)).count().filter(col("count") > 1).limit(1)
    val hit = dups.collect()
    if (hit.nonEmpty)
      throw new IllegalStateException(
        s"Duplicate key '${hit.head.get(0)}' in singleton lookup side " +
          "(reference contract: asMapSingletonSideInput requires unique keys)")
    lookup
  }

  /**
   * D2/J1 — historical-vs-fresh split: returns (novel, duplicated) where
   * novel = fresh ∖ historical (left_anti) and duplicated = fresh ∩
   * historical (left_semi), both on `keyCol` against a broadcast build side.
   */
  def semiAntiSplit(fresh: DataFrame, historical: DataFrame, keyCol: String,
      strictUnique: Boolean = false): (DataFrame, DataFrame) = {
    val hist = if (strictUnique) assertUniqueKeys(historical, keyCol) else historical
    val keys = broadcast(hist.select(col(keyCol)).distinct())
    val novel = fresh.join(keys, Seq(keyCol), "left_anti")
    val dups = fresh.join(keys, Seq(keyCol), "left_semi")
    (novel, dups)
  }

  /**
   * J2 — enrichment lookup join: left-outer broadcast, missing keys default
   * via `defaults` (reference: `Option.getOrElse("")`,
   * slack/MinimalPubSubBQLookup.scala:39-45).
   */
  def enrichLookup(stream: DataFrame, lookup: DataFrame, keyCol: String,
      defaults: Map[String, Column] = Map.empty,
      strictUnique: Boolean = false): DataFrame = {
    val build = if (strictUnique) assertUniqueKeys(lookup, keyCol) else lookup
    val joined = stream.join(broadcast(build), Seq(keyCol), "left_outer")
    defaults.foldLeft(joined) { case (df, (c, default)) =>
      df.withColumn(c, coalesce(col(c), default))
    }
  }
}
