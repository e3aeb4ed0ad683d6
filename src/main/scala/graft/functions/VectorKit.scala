package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Embedding-vector column kit (`array<float>` columns): dot product, norms,
 * cosine similarity — all built from `zip_with`/`aggregate` higher-order
 * functions so they run inside whole-stage codegen. At 100 TB the brute-force
 * cosine pass is compute-bound; staying codegen'd (no UDF boxing per element)
 * is the difference between feasible and not.
 *
 * Everything computes in double, left-to-right index order, so the DuckDB
 * oracle (list_reduce in the same order) reproduces results bit-for-bit
 * before quantization.
 */
object VectorKit {

  /** Cast an array<float> embedding to array<double> (exact widening). */
  def asDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column =
    sqrt(aggregate(transform(asDouble(a), x => x * x), lit(0.0), (acc, v) => acc + v))

  /** Cosine similarity; 0 when either side has zero norm. Delegates to the
    * native codegen'd expression ([[NativeVectorKit.cosine]]); the HOF
    * composition below ([[cosineHof]]) is semantically identical but falls
    * out of whole-stage codegen on wide pair joins.
    */
  def cosine(a: Column, b: Column): Column = NativeVectorKit.cosine(a, b)

  /** HOF reference formulation of [[cosine]] (kept for cross-checking). */
  def cosineHof(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm2(a)
    val nb = norm2(b)
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(d / (na * nb))
  }

  /** Random-hyperplane LSH bucket (SimHash over the embedding): sign bits of
    * `nBits` fixed pseudo-random hyperplanes, packed into a long. Used to
    * bucket near-identical vectors so the near-dup join is per-bucket rather
    * than all-pairs — the 100 TB scale path (all-pairs is O(n²) shuffle;
    * bucketed is O(n) + tiny per-bucket cross products).
    *
    * Hyperplanes are derived deterministically from (bit, dim) with a
    * splitmix-style integer mix, so the bucketing is stable across runs and
    * engines with no stored model.
    */
  def rhpBucket(v: Column, nBits: Int, table: Int = 0): Column =
    NativeVectorKit.rhpBucket(v, nBits, table)
}
