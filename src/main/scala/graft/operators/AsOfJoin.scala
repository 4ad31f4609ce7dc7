package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join: for each left row, attach the payload of
  * the most recent right row with `right.ts <= left.ts`, optionally per
  * equi-key.
  *
  * The reference resolves point-in-time visibility at scan via its
  * temporal index (xtdb/core2 `core2.temporal`, README.adoc:11); between
  * two event streams the same semantics need a dedicated operator, which
  * Spark lacks. Implementation is the scalable union+window pattern:
  *
  *   1. tag both inputs and union them (right payload columns are NULL on
  *      left rows),
  *   2. one window over `(keys…, ts, side)` computes `last(struct(
  *      payload…), ignoreNulls)` — the running "latest right ROW seen so
  *      far" (a single struct so NULL payload *values* on a matching
  *      right row are preserved, not skipped),
  *   3. keep only left rows.
  *
  * Cost: ONE shuffle on the keys (same as any equi-join), no range-join
  * row explosion, spillable sort — this survives a 100× scale-up as long
  * as keys are reasonably distributed.
  *
  * With NO keys the window would be one partition — the textbook
  * single-reducer bottleneck — so the keyless case takes a different
  * plan entirely ([[asOfBroadcast]]): the right side (which must be
  * small for a keyless as-of to make sense at all) is aggregated into
  * one sorted array, broadcast, and probed per left row with a
  * codegen'd O(log n) binary search ([[graft.functions.SortedLastLeq]]).
  * No shuffle of the left side at all.
  *
  * Ties (`right.ts == left.ts`) count as visible (<=), matching SQL
  * `FOR SYSTEM_TIME AS OF` inclusivity.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame,
           leftTs: String, rightTs: String,
           payload: Seq[String],
           leftKeys: Seq[String] = Nil, rightKeys: Seq[String] = Nil): DataFrame = {
    require(leftKeys.length == rightKeys.length, "key arity mismatch")
    if (leftKeys.isEmpty)
      return asOfBroadcast(left, right, leftTs, rightTs, payload)
    val keyNames = leftKeys.indices.map(i => s"_k$i")

    val l = left
      .withColumn("_t", col(leftTs)).withColumn("_side", lit(1))
      .withColumns(keyNames.zip(leftKeys).map { case (k, c) => k -> col(c) }.toMap)
    val rCols = keyNames.zip(rightKeys).map { case (k, c) => col(c).as(k) } ++
      Seq(col(rightTs).as("_t"), lit(0).as("_side")) ++ payload.map(col)
    // NULL keys never match in an equi-join; without this filter the
    // window partitioning would group NULL-key right rows with NULL-key
    // left probes and fill their payloads. NULL-key LEFT rows still
    // emit (with NULL payload), like the left side of an outer join.
    // NULL right timestamps likewise never satisfy `ts <= probe` (the
    // comparison is UNKNOWN), but a NULL _t sorts FIRST in the window
    // and would fill every probe — filter them like the broadcast path.
    val r = right
      .filter((rightKeys.map(col(_).isNotNull) :+ col(rightTs).isNotNull)
        .reduce(_ && _))
      .select(rCols: _*)

    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows sort before left rows at equal _t => `<=` visibility.
    // Ties BETWEEN right rows (equal key and _t) are not ordered — which
    // one wins is undefined, exactly as in SQL's `last value per group`
    // without a full tiebreaker; callers needing determinism must ensure
    // right ts are unique per key (or pre-aggregate).
    val w = Window.partitionBy(keyNames.map(col): _*)
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // Fill ONE struct of all payload columns (non-null exactly when a
    // right row exists): per-column fills would skip a genuinely-NULL
    // payload value on a matching right row and surface a stale older
    // value — and could mix values from different right rows.
    val filled = unioned.withColumn("_pay",
      last(when(col("_side") === 0, struct(payload.map(col): _*)),
        ignoreNulls = true).over(w))
    filled.filter(col("_side") === 1)
      .select((left.columns.filterNot(payload.contains).map(col) ++
        payload.map(p => col("_pay")(p).as(p))): _*)
  }

  /** Keyless as-of via broadcast + binary search: right is collapsed to
    * ONE row holding `sort_array(struct(ts_micros, payload…))`, broadcast
    * to every task, and each left row resolves its match with an
    * O(log |right|) probe. The left side is never shuffled — the plan
    * scales with the left scan alone. Ties between right rows with equal
    * ts resolve to the greatest (ts, payload…) tuple (array sort order). */
  def asOfBroadcast(left: DataFrame, right: DataFrame,
                    leftTs: String, rightTs: String,
                    payload: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    graft.functions.SortedLastLeq.register(spark)
    val packed = right
      .filter(col(rightTs).isNotNull)
      .agg(sort_array(collect_list(struct(
        unix_micros(col(rightTs).cast("timestamp")).as("_t") +:
          payload.map(col): _*))).as("_arr"))
    left.crossJoin(broadcast(packed))
      .withColumn("_lk", unix_micros(col(leftTs).cast("timestamp")))
      .withColumn("_idx", expr("sorted_last_leq(_arr, _lk)"))
      // get() is 0-based and NULL-safe: _idx = 0 (no right row yet) maps
      // to index -1 -> NULL struct -> NULL payload columns
      .withColumn("_pay", get(col("_arr"), col("_idx") - 1))
      .select((left.columns.filterNot(payload.contains).map(col) ++
        payload.map(p => col("_pay")(p).as(p))): _*)
  }
}
