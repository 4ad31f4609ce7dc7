package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-item (heavy-hitter) mining with a sketch prefilter — the
  * sketch-candidates-then-exact-verify pattern (same shape as the
  * bloom-prefiltered decontamination): results are EXACT, the sketch
  * only bounds what shuffles.
  */
object Frequency {

  /** Keys whose exact count is ≥ `minCount`, with the count. A plain
    * `groupBy.count` shuffles every distinct key at 100 TB; this runs
    * the [[graft.functions.MisraGries]] NATIVE aggregate — a
    * `sketchSize`-counter summary per partition with map-side combine,
    * only sketch-sized partials on the wire, candidates merged with
    * the mergeable-summaries offset step — then computes exact counts
    * for candidate keys only: the data-row shuffle carries just the
    * rows of plausible heavy hitters, and (unlike the previous
    * `Dataset.mapPartitions` + `distinct` formulation) no row ever
    * takes an encoder round-trip and no candidate-distinct exchange
    * exists in the plan.
    *
    * Exactness guarantee: an MG summary of size k undercounts any key
    * by at most N/k, and the offset merge preserves that bound
    * (Agarwal et al., PODS'12) — so every key with global count ≥
    * N/sketchSize survives as a candidate as long as `minCount ≥
    * N / sketchSize`; size the sketch to the selectivity you ask for
    * (the verify pass makes false candidates free: they just count
    * and fail the filter). */
  def heavyHitters(df: DataFrame, keyCol: String, sketchSize: Int,
                   minCount: Long): DataFrame = {
    require(sketchSize > 0 && minCount > 0,
      "heavyHitters: sketchSize and minCount must be positive")
    graft.functions.MisraGries.register(df.sparkSession)
    val candidates = df
      .select(col(keyCol).cast("string").as("_k"))
      .filter(col("_k").isNotNull) // null keys are not counted
      .agg(call_function("misra_gries", col("_k"), lit(sketchSize))
        .as("_cands"))
      .select(explode(col("_cands")).as("_k"))
    df.join(broadcast(candidates),
        col(keyCol).cast("string") === col("_k"), "left_semi")
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }
}
