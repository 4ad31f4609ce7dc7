package graft.util

import org.apache.spark.sql.DataFrame

/** Parallelism guard for per-row-expensive map stages.
  *
  * A small input — one file, or one parquet row group, the smallest unit
  * a scan can split — plans a single task, so tokenize/hash/decode work
  * downstream of it runs serially no matter how many cores the cluster
  * has. Parquet can't be split below a row group, so no reader conf
  * fixes this; the idiomatic cure is an explicit round-robin exchange
  * before the expensive map.
  *
  * [[spread]] applies that cure ADAPTIVELY: only when the input's scan
  * parallelism is meaningfully below the session default. At real scale
  * (many files / many row groups) the input already has at least
  * cores-many splits and this is a no-op — no extra shuffle is ever
  * added to a 100 TB plan. The repartition moves only the raw input
  * rows (pre-explode, pre-hash), which is the narrowest point of every
  * text/media pipeline.
  */
object Par {

  /** Inputs below this estimated size keep their layout: the exchange
    * would cost more than the serial map it parallelizes. Tunable via
    * `spark.graft.spread.minBytes`. */
  private val MinBytesKey = "spark.graft.spread.minBytes"
  private val MinBytesDefault = 4L * 1024 * 1024

  /** Round-robin repartition `df` to the session's default parallelism
    * iff its current plan has less than half that many partitions AND
    * the optimizer's size estimate says the serial work is worth an
    * exchange. Both probes plan the query without launching a job. */
  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val current = df.rdd.getNumPartitions
    if (current * 2 > target) return df
    val minBytes =
      spark.conf.getOption(MinBytesKey).map(_.toLong).getOrElse(MinBytesDefault)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes >= minBytes) df.repartition(target) else df
  }
}
