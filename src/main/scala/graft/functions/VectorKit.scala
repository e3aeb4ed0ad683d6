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

  /** Cosine similarity; 0 when either side has zero norm. */
  def cosine(a: Column, b: Column): Column = {
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
  def rhpBucket(v: Column, nBits: Int, dim: Int): Column = {
    // plane(b, i) = mix(b * dim + i) mapped to {-1, +1}
    def planeCoef(b: Int, i: Int): Double = {
      var z = (b.toLong * dim + i) * 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      if (z >= 0) 1.0 else -1.0
    }
    val bits = (0 until nBits).map { b =>
      val coefs = array((0 until dim).map(i => lit(planeCoef(b, i))): _*)
      val proj = aggregate(zip_with(asDouble(v), coefs, (x, c) => x * c),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0.0, lit(1L) * lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
