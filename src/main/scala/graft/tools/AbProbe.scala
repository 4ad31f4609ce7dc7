package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-JVM A/B for a runtime-gated optimization (r16): runs each
  * named catalog entry ALTERNATING the gate conf off/on `reps` times
  * each, interleaved (A,B,A,B,…) so box drift and heap state hit both
  * arms equally, and reports per-arm medians. The decisive measurement
  * when back-to-back full bench runs disagree by more than the change
  * under test (the documented day-drift class).
  *
  * Usage: `runMain graft.tools.AbProbe <sfDir> <confKey> q155[,q156] [reps]`
  */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val confKey = args(1)
    val names = args(2).split(",").map(_.trim).toSeq
    val reps = if (args.length > 3) args(3).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm-up
    try run("q00_tpch_q1") catch { case _: Throwable => }
    names.foreach { name =>
      val a = scala.collection.mutable.Buffer.empty[Double] // gate OFF
      val b = scala.collection.mutable.Buffer.empty[Double] // gate ON
      (1 to reps).foreach { _ =>
        spark.conf.set(confKey, "false"); a += run(name)
        spark.conf.set(confKey, "true"); b += run(name)
      }
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      println(f"== $name off=${a.map(x => f"$x%.2f").mkString(",")} " +
        f"on=${b.map(x => f"$x%.2f").mkString(",")} " +
        f"| median off ${med(a.toSeq)}%.2f on ${med(b.toSeq)}%.2f")
    }
    spark.stop()
  }
}
