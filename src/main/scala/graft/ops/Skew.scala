package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew mitigation for 100 TB joins. First resort is AQE's runtime skew-join
 * split (`spark.sql.adaptive.skewJoin.enabled`, on by default) — prefer it
 * when the skew is only discovered at runtime. Explicit salting below is
 * for the cases AQE can't fix: a shuffled join where one build-side key is
 * hot (AQE splits partitions, but a single giant key still lands in one
 * task's hash bucket on the probe side), or when the small side is just
 * over the broadcast threshold.
 *
 * (Engine extension — the reference sidesteps skew entirely by making every
 * join a broadcast side input, mediation/README.md:136-138; that stops
 * working when the "small" side doesn't fit in memory.)
 */
object Skew {

  /**
   * Salted equi-join: the big side scatters each row into one of `salt`
   * sub-keys; the small side is replicated `salt` times (explode over the
   * salt range) so every (key, salt) bucket can still match. A hot key's
   * rows thus spread over `salt` reducers instead of one. Result is
   * row-identical to `big.join(small, key, joinType)`.
   *
   * `scatter` picks the big-side bucket; default is uniform random (fine —
   * it only routes rows). Pass a deterministic column (e.g.
   * `pmod(hash($"row_id"), lit(salt))`) when the plan must be replayable
   * row-for-row (speculative execution, task retry determinism).
   *
   * Join types: inner / left_outer (big side preserved). Semi/anti with
   * replication would double-count — use AQE for those.
   */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int,
      joinType: String = "inner", scatter: Option[Column] = None): DataFrame = {
    require(salt > 1, "salt must be > 1")
    require(Set("inner", "left", "left_outer").contains(joinType),
      s"salted $joinType would change cardinality; use AQE skew join")
    val scatterCol = scatter.getOrElse((rand() * salt).cast("int"))
    val bigS = big.withColumn("__salt", scatterCol)
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(smallS, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
