package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement-only (r17): captures the JOIN-matview refresh DELTA's
  * physical plan with a given conf gate off/on — the committed
  * before/after evidence for the signed-union delta change (the
  * lifecycle entries' own `.explain` shows only their final SELECT,
  * not the refresh pipeline the optimization touches). Uses the same
  * capture hook the pruning specs use.
  *
  * Usage: `runMain graft.tools.DeltaPlanProbe <sfDir> <confKey> <off|on>`
  */
object DeltaPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val confKey = args(1)
    val setting = args(2) == "on"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(confKey, setting.toString)

    graft.bitemporal.JoinMatview.capturePlans = true
    graft.bitemporal.JoinMatview.capturedPlans.clear()
    // q155's lifecycle drives one incremental join-matview refresh
    graft.SparkEntry.queries("q155_join_matview")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    graft.bitemporal.JoinMatview.capturePlans = false
    println(s"=== delta plans with $confKey=$setting ===")
    graft.bitemporal.JoinMatview.capturedPlans.foreach { p =>
      println("--- captured plan ---")
      println(p)
    }
    spark.stop()
  }
}
