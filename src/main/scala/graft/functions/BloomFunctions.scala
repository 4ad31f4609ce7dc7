package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL access to Spark's own bloom-filter sketch pair — the engine uses
  * them internally for runtime join filters
  * (`spark.sql.optimizer.runtime.bloomFilter.*`) but does not expose
  * them in the public function registry. Registering them makes the
  * 100 TB decontamination shape expressible as one query:
  *
  *   build:  `graft_bloom_agg(xxhash64(g), items, bits)` — a byte-array
  *           sketch of the (small) eval-set gram population,
  *   probe:  `graft_might_contain((SELECT bf FROM b), xxhash64(g))` —
  *           a map-side, no-false-negative prefilter on the (huge)
  *           corpus side; the sketch rides along as a scalar-subquery
  *           constant, so the corpus NEVER shuffles for the probe.
  *
  * False positives are then removed by an exact semi-join on the
  * surviving grams — results are identical to the exact join, the bloom
  * only cuts the join input. Both expressions are Spark's (public
  * Apache source); this object only registers them.
  */
object BloomFunctions {

  /** Idempotently register `graft_bloom_agg` and `graft_might_contain`. */
  def register(spark: SparkSession): Unit = {
    val agg = FunctionIdentifier("graft_bloom_agg")
    if (!spark.sessionState.functionRegistry.functionExists(agg)) {
      spark.sessionState.functionRegistry.registerFunction(
        agg,
        new ExpressionInfo(classOf[BloomFilterAggregate].getName,
          "graft_bloom_agg"),
        (exprs: Seq[Expression]) =>
          new BloomFilterAggregate(exprs.head, exprs(1), exprs(2)))
    }
    val mc = FunctionIdentifier("graft_might_contain")
    if (!spark.sessionState.functionRegistry.functionExists(mc)) {
      spark.sessionState.functionRegistry.registerFunction(
        mc,
        new ExpressionInfo(classOf[BloomFilterMightContain].getName,
          "graft_might_contain"),
        (exprs: Seq[Expression]) =>
          BloomFilterMightContain(exprs.head, exprs(1)))
    }
  }
}
