package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * Top-k rows per group WITHOUT a window sort: a typed `Aggregator` whose
 * buffer is a k-bounded ordered array — partial-aggregation capable, so a
 * hot group's millions of rows collapse to k map-side BEFORE the
 * exchange, and the reducer merges k-sized buffers. The window-rank form
 * (`row_number().over(partitionBy(group))` + `filter(rank <= k)`) sorts
 * every group's FULL row set in one task — the same skew hazard
 * [[Dedup.exactDedup]] documents; this operator is the skew-safe shape
 * for "top 3 orders per customer" at 100 TB.
 *
 * Ordering: (orderVal desc, payload asc) — deterministic under ties.
 * The buffer holds (orderVal, payload) LONG pairs: project the ranking
 * value and the row id into longs (the [[graft.functions.Kit.cents]]
 * convention), then join payload ids back for wide rows.
 */
object TopK {

  /** k-bounded buffer, kept sorted (ord desc, payload asc), length ≤ k. */
  final class Buf(var items: Array[Long]) extends Serializable
  // items is a flat [ord0, pay0, ord1, pay1, ...] — compact Java
  // serialization, no tuple boxing in the hot path

  private def better(o1: Long, p1: Long, o2: Long, p2: Long): Boolean =
    o1 > o2 || (o1 == o2 && p1 < p2)

  final class TopKAgg(k: Int) extends Aggregator[(Long, Long), Buf, Seq[(Long, Long)]] {
    override def zero: Buf = new Buf(Array.emptyLongArray)

    override def reduce(b: Buf, a: (Long, Long)): Buf =
      mergeArrays(b, Array(a._1, a._2))

    override def merge(x: Buf, y: Buf): Buf = mergeArrays(x, y.items)

    private def mergeArrays(b: Buf, other: Array[Long]): Buf = {
      val merged = new Array[Long](b.items.length + other.length)
      var i = 0; var j = 0; var o = 0
      while (i < b.items.length && j < other.length) {
        if (better(b.items(i), b.items(i + 1), other(j), other(j + 1))) {
          merged(o) = b.items(i); merged(o + 1) = b.items(i + 1); i += 2
        } else {
          merged(o) = other(j); merged(o + 1) = other(j + 1); j += 2
        }
        o += 2
      }
      while (i < b.items.length) { merged(o) = b.items(i); merged(o + 1) = b.items(i + 1); i += 2; o += 2 }
      while (j < other.length) { merged(o) = other(j); merged(o + 1) = other(j + 1); j += 2; o += 2 }
      b.items = if (merged.length > 2 * k) merged.take(2 * k) else merged
      b
    }

    // single-element inserts arrive unsorted — reduce() relies on
    // mergeArrays treating a 1-pair array as trivially sorted, which holds
    override def finish(b: Buf): Seq[(Long, Long)] =
      b.items.grouped(2).map(a => (a(0), a(1))).toSeq

    override def bufferEncoder: Encoder[Buf] = Encoders.javaSerialization[Buf]
    override def outputEncoder: Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /**
   * Top-k per group over (orderVal: long, payload: long) projections.
   * Output: (group, ord, payload, rank) rows, rank 1..k by
   * (ord desc, payload asc).
   */
  def topKPerGroup(df: DataFrame, groupCol: String, orderCol: Column,
      payloadCol: Column, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val agg = udaf(new TopKAgg(k))
    df.select(col(groupCol).as("group"), orderCol.cast("long").as("__o"),
        payloadCol.cast("long").as("__p"))
      .groupBy(col("group"))
      .agg(agg(col("__o"), col("__p")).as("__top"))
      .select(col("group"), posexplode(col("__top")).as(Seq("__i", "__t")))
      .select(col("group"), col("__t._1").as("ord"),
        col("__t._2").as("payload"), (col("__i") + 1).cast("int").as("rank"))
  }
}
