package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement-only (guide §1): isolates the cost anatomy of one bulk
  * `put()` tx write at sf0.1 — compute (noop) vs single-task write
  * (the `TxLog.append` `coalesce(1)` shape) vs parallel write shapes,
  * with and without the `_id` bloom filter — so the append-shape
  * change is driven by numbers, not guesses.
  *
  * Usage: `runMain graft.tools.WriteShapeProbe <sfDir>`
  */
object WriteShapeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ord = spark.read.parquet(s"$sfDir/orders.parquet").select(
      col("o_orderkey").cast("long").as("id"),
      col("o_custkey").cast("long").as("k"),
      (col("o_orderkey") % 5).cast("long").as("cd"),
      col("o_totalprice").cast("decimal(12,2)").as("p"))
    val ops = ord.select(
      lit(0).as("_op"), col("id").as("_id"),
      lit("2000-01-01").cast("timestamp").as("_valid_from"),
      lit(null).cast("timestamp").as("_valid_to"),
      col("k").as("ck"), col("cd").as("code"), col("p").as("price"))
      .withColumn("_tx_id", lit(1L))
      .withColumn("_system_from",
        lit(java.sql.Timestamp.valueOf("2020-01-01 00:00:00")))

    def t(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"[WS] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    ops.write.format("noop").mode("overwrite").save() // warm
    (1 to 3).foreach { i =>
      t(s"noop $i") {
        ops.write.format("noop").mode("overwrite").save()
      }
      t(s"coalesce1+bloom $i") {
        ops.coalesce(1).write.mode("overwrite")
          .option("parquet.bloom.filter.enabled#_id", "true")
          .parquet(s"/tmp/ws_c1b_$i")
      }
      t(s"coalesce1 nobloom $i") {
        ops.coalesce(1).write.mode("overwrite").parquet(s"/tmp/ws_c1n_$i")
      }
      t(s"repart8+bloom $i") {
        ops.repartition(8).write.mode("overwrite")
          .option("parquet.bloom.filter.enabled#_id", "true")
          .parquet(s"/tmp/ws_r8b_$i")
      }
      t(s"repart32+bloom $i") {
        ops.repartition(32).write.mode("overwrite")
          .option("parquet.bloom.filter.enabled#_id", "true")
          .parquet(s"/tmp/ws_r32b_$i")
      }
    }
    println("[WS] optimizedPlan.stats.sizeInBytes = " +
      ops.queryExecution.optimizedPlan.stats.sizeInBytes)
    spark.stop()
  }
}
