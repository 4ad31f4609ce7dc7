package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator: the k largest input values per group, as a
  * descending-sorted array — the §2.7 `Aggregator` extension tier.
  *
  * The composable alternative (`slice(sort_array(collect_list(x)), …)`)
  * materializes the ENTIRE group before truncating — O(group) memory in
  * the aggregation buffer, the thing that breaks on a hot group at
  * 100 TB. This buffer never exceeds k elements, and it runs as a
  * normal partial+final Spark aggregation (map-side combine included).
  * Insertion is O(k) per row (k is small by definition of "top-k");
  * NULL inputs are skipped like built-in aggregates.
  */
final class TopKDoubles(k: Int)
    extends Aggregator[java.lang.Double, Seq[Double], Seq[Double]] {
  require(k > 0, "k must be positive")

  override def zero: Seq[Double] = Vector.empty

  private def insert(b: Seq[Double], x: Double): Seq[Double] =
    if (b.length < k) (b :+ x).sortBy(-_)
    else if (x > b.last) (b.init :+ x).sortBy(-_)
    else b

  override def reduce(b: Seq[Double], x: java.lang.Double): Seq[Double] =
    if (x == null) b else insert(b, x.doubleValue())

  override def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] =
    b.foldLeft(a)(insert)

  override def finish(b: Seq[Double]): Seq[Double] = b

  override def bufferEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
