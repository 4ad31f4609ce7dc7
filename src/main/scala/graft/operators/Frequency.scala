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
    * a Misra-Gries summary of `sketchSize` counters PER PARTITION
    * (one pass, O(sketchSize) memory, no shuffle), unions the
    * surviving candidate keys (≤ partitions × sketchSize rows — tiny,
    * broadcast), then computes exact counts for candidate keys only:
    * the shuffle carries just the rows of plausible heavy hitters.
    *
    * Exactness guarantee: a per-partition Misra-Gries summary keeps
    * every key whose count in that partition exceeds n_p/sketchSize;
    * a key with global count ≥ N/sketchSize must exceed that in at
    * least one partition, so the candidate union misses nothing as
    * long as `minCount ≥ N / sketchSize` — size the sketch to the
    * selectivity you ask for (and the verify pass makes false
    * candidates free: they just count and fail the filter). */
  def heavyHitters(df: DataFrame, keyCol: String, sketchSize: Int,
                   minCount: Long): DataFrame = {
    require(sketchSize > 0 && minCount > 0,
      "heavyHitters: sketchSize and minCount must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val candidates = df.select(col(keyCol).cast("string").as("_k"))
      .as[String]
      .mapPartitions { it =>
        val m = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { k =>
          if (k != null) m.get(k) match { // null keys are not counted
            case Some(v) => m(k) = v + 1
            case None if m.size < sketchSize => m(k) = 1L
            case None => // decrement-all step of Misra-Gries
              m.mapValuesInPlace((_, v) => v - 1L)
              m.filterInPlace((_, v) => v > 0L)
          }
        }
        m.keysIterator
      }
      .distinct()
      .toDF("_k")
    df.join(broadcast(candidates),
        col(keyCol).cast("string") === col("_k"), "left_semi")
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }
}
