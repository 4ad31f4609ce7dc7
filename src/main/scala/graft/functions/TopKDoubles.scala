package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator: the k largest input values per group by
  * `ord`, as a descending-sorted array — the §2.7 `Aggregator`
  * extension tier.
  *
  * The composable alternative (`slice(sort_array(collect_list(x)), …)`)
  * materializes the ENTIRE group before truncating — O(group) memory in
  * the aggregation buffer, the thing that breaks on a hot group at
  * 100 TB. This buffer never exceeds k elements, and it runs as a
  * normal partial+final Spark aggregation (map-side combine included).
  *
  * The buffer is kept sorted descending: insertion is a binary search +
  * single splice — O(log k) compares, O(k) copy; values at or below a
  * full buffer's minimum short-circuit in O(1). Partial-buffer merges
  * are a two-pointer sorted merge, O(k). `extract` adapts the input
  * type and drops NULLs (None), like built-in aggregates.
  */
sealed class TopK[IN, T](k: Int, extract: IN => Option[T])(
    implicit ord: Ordering[T], seqEnc: Encoder[Seq[T]])
    extends Aggregator[IN, Seq[T], Seq[T]] {
  require(k > 0, "k must be positive")

  override def zero: Seq[T] = Vector.empty

  private def insert(b: Seq[T], x: T): Seq[T] =
    if (b.length >= k && ord.lteq(x, b.last)) b
    else {
      // first position whose element sorts strictly below x (stable:
      // equal elements keep arrival order)
      var lo = 0
      var hi = b.length
      while (lo < hi) {
        val m = (lo + hi) >>> 1
        if (ord.gteq(b(m), x)) lo = m + 1 else hi = m
      }
      val grown = (b.take(lo) :+ x) ++ b.drop(lo)
      if (grown.length > k) grown.take(k) else grown
    }

  override def reduce(b: Seq[T], x: IN): Seq[T] =
    extract(x).fold(b)(insert(b, _))

  override def merge(a: Seq[T], b: Seq[T]): Seq[T] = {
    // both sides sorted descending: two-pointer merge, stop at k
    val out = Vector.newBuilder[T]
    var i = 0
    var j = 0
    var n = 0
    while (n < k && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && ord.gteq(a(i), b(j)))
      if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(b: Seq[T]): Seq[T] = b

  override def bufferEncoder: Encoder[Seq[T]] = seqEnc
  override def outputEncoder: Encoder[Seq[T]] = seqEnc
}

/** Top-k over a DOUBLE column (NULLs skipped) — the concrete instance
  * the query surface registers as a UDAF. */
final class TopKDoubles(k: Int)
    extends TopK[java.lang.Double, Double](
      k, (d: java.lang.Double) => Option(d).map(_.doubleValue()))(
      implicitly[Ordering[Double]],
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]())
