package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling over event tables — the gap-filling the
  * reference's event consumers do by hand: regularize an irregular
  * event stream onto a fixed grid, carrying the last observation
  * forward through empty buckets (LOCF).
  *
  * Scale shape: one map-side-combined aggregation folds the events to
  * at most one row per (key, bucket) BEFORE any window runs (the
  * window then sorts grid-sized groups, never event-sized); the grid
  * itself is generated per key (`sequence` + `explode` — no driver
  * loop, no cross join against a calendar table); the LOCF window
  * partitions by key, so it parallelizes across keys and nothing ever
  * lands on a single partition.
  */
object TimeSeries {

  /** Resample `df` onto a `[from, to)` grid of `stepSeconds` buckets
    * per key, filling empty buckets with the last earlier observation
    * (null until a key's first observation). Within a bucket the
    * LATEST event wins; exact ties (same key, same timestamp) break by
    * the value columns' lexicographic order via a single struct max —
    * deterministic end to end, map-side combinable (never a window
    * over raw events).
    *
    * Output: `keyCols ++ (t, valueCols…)`, one row per key × bucket. */
  def resampleLocf(df: DataFrame, keyCols: Seq[String], tsCol: String,
                   valueCols: Seq[String], stepSeconds: Long,
                   from: Column, to: Column): DataFrame = {
    require(keyCols.nonEmpty && valueCols.nonEmpty && stepSeconds > 0,
      "resampleLocf: keys, values and a positive step are required")
    val step = stepSeconds * 1000000L // micros
    // cast through LTZ for unix_micros (UTC session ⇒ identity on the
    // instant); emit the table's own timestamp flavor so the grid join
    // and output match NTZ-sourced event tables
    val tsType = df.schema(tsCol).dataType.simpleString
    def bucketOf(c: Column): Column =
      timestamp_micros((floor(unix_micros(c.cast("timestamp")) / step) * step)
        .cast("long")).cast(tsType)
    val winner = struct(col(tsCol) +: valueCols.map(col): _*)
    val obs = df
      .filter(col(tsCol) >= from && col(tsCol) < to)
      .groupBy(keyCols.map(col) :+ bucketOf(col(tsCol)).as("t"): _*)
      .agg(max(winner).as("_w"))
      .select(keyCols.map(col) :+ col("t") :+
        struct(valueCols.map(c => col(s"_w.$c").as(c)): _*).as("_v"): _*)
    val grid = df.select(keyCols.map(col): _*).distinct()
      .withColumn("t", explode(sequence(
        bucketOf(from),
        bucketOf(to - expr("INTERVAL 1 MICROSECOND")),
        expr(s"INTERVAL $stepSeconds SECOND"))))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(obs, keyCols :+ "t", "left")
      .withColumn("_f", last(col("_v"), ignoreNulls = true).over(w))
      .select((keyCols.map(col) :+ col("t")) ++
        valueCols.map(c => col(s"_f.$c").as(c)): _*)
  }
}
