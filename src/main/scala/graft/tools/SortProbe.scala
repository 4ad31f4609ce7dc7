package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Minimal A/B probe for the state-write sort interaction seen at
  * sf10: repartition(_bucket) + write vs the same with an explicit
  * sortWithinPartitions, over a big-upstream tiny-output aggregate
  * (the matview state-write shape). Prints timings + executed plans. */
object SortProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.ui.enabled", "false")
      .appName("sortprobe").getOrCreate()
    import spark.implicits._
    val df = spark.range(30L * 1000 * 1000).select(
      ($"id" % 25).cast("string").as("grp"),
      ($"id" % 97).cast("decimal(12,2)").as("m"))
    val agg = df.groupBy($"grp")
      .agg(count(lit(1)).as("n"), sum($"m").as("s"))
      .withColumn("_bucket", pmod(xxhash64($"grp"), lit(16L)))
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[sortprobe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val base = java.nio.file.Files.createTempDirectory("sortprobe").toString
    time("warm")(agg.count(): Unit)
    (1 to 2).foreach { i =>
      time(s"plain$i")(agg.repartition(col("_bucket"))
        .write.mode("overwrite").partitionBy("_bucket").parquet(s"$base/p$i"))
      time(s"sorted$i")(agg.repartition(col("_bucket"))
        .sortWithinPartitions(col("_bucket"), col("grp"))
        .write.mode("overwrite").partitionBy("_bucket").parquet(s"$base/s$i"))
    }
    val qe = agg.repartition(col("_bucket"))
      .sortWithinPartitions(col("_bucket"), col("grp"))
      .queryExecution
    println("[sortprobe] sorted plan:\n" + qe.executedPlan.toString.take(4000))
    spark.stop()
  }
}
