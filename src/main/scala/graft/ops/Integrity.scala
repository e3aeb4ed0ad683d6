package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Order-independent table fingerprints for replica comparison — the
 * "anti-entropy" primitive: two copies of a 100 TB table (a migration, a
 * backfill, a CDC-maintained mirror) are compared by exchanging per-bucket
 * signatures (KBs), and only buckets whose signatures differ are re-read
 * row-by-row. A full-table EXCEPT costs a 2×100 TB shuffle; this costs one
 * scan per side and a KB-sized join.
 *
 * The signature is `bit_xor` of a per-row 60-bit md5-derived value — XOR is
 * commutative/associative with identity 0, so the aggregate is
 * partitioning-invariant, map-side combinable, and never overflows
 * (contrast a SUM signature, which DuckDB faults on BIGINT overflow).
 * A row present on one side only, or differing in any signed column,
 * flips its bucket's signature with probability 1 − 2⁻⁶⁰ (XOR of a pair of
 * distinct 60-bit hashes is nonzero unless md5 collides on the prefix).
 * Count rides along to catch the one case XOR is blind to: the same row
 * duplicated an even number of times.
 */
object Integrity {

  /** 60-bit row signature over the canonical string form of `cols`,
    * concat_ws-joined with the \u0001 separator. Each column is coalesced
    * to the \u0002 sentinel first so NULL POSITION participates in the
    * hash — bare concat_ws skips nulls, making (a,NULL,b) and (a,b,NULL)
    * collide, i.e. a replica diff in null placement would be invisible.
    * (A real string value equal to "\u0002" is indistinguishable from
    * null — acceptable: control chars don't survive canonical casts of
    * the key/metric columns this signs.) DuckDB replays it as
    * `concat_ws(chr(1), coalesce(CAST(c AS VARCHAR), chr(2)), ...)`.
    * Cast numeric columns to exact integer forms first (e.g.
    * [[graft.functions.Kit.cents]]) — double→string formatting is not
    * engine-portable. */
  def rowSignature(cols: Column*): Column =
    conv(substring(md5(concat_ws("\u0001",
      cols.map(c => coalesce(c.cast("string"), lit("\u0002"))): _*)), 1, 15),
      16, 10).cast("long")

  /** Per-bucket (n_rows, sig) fingerprint: ONE scan, one map-side-combined
    * aggregate into `nBuckets` rows. `bucketCol` must be derived from row
    * content (e.g. `key % nBuckets`) so both replicas bucket identically. */
  def bucketSignature(df: DataFrame, bucketCol: Column, sigCol: Column): DataFrame =
    df.select(bucketCol.as("bucket"), sigCol.as("__sig"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(__sig)").as("sig"))

  /** Buckets where two replicas disagree (missing bucket = disagreement):
    * the recheck worklist. Full-outer join of two nBuckets-row frames —
    * driver-light, data-free. */
  def diffBuckets(a: DataFrame, b: DataFrame): DataFrame = {
    val l = a.select(col("bucket"), col("n_rows").as("a_rows"), col("sig").as("a_sig"))
    val r = b.select(col("bucket"), col("n_rows").as("b_rows"), col("sig").as("b_sig"))
    l.join(r, Seq("bucket"), "full_outer")
      .filter(not(col("a_rows") <=> col("b_rows")) ||
        not(col("a_sig") <=> col("b_sig")))
  }
}
