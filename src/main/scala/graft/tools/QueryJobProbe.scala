package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-Spark-job wall-clock attribution for ONE catalog query — the
  * optimization-round measurement companion to [[MvPhaseProbe]]
  * (guide §1: decide whether an entry's seconds go to many small
  * driver-issued jobs or to few heavy stages BEFORE touching the code).
  *
  * Runs the named `SparkEntry.queries` entries exactly as Bench does
  * (noop sink, same session shape) with a listener recording every
  * job's (id, duration, description/callsite, task count); prints a
  * per-job table plus the job-count/total-vs-wall summary. The gap
  * between summed job time and wall time is pure driver work (planning,
  * file listing, footer reads, directory swaps).
  *
  * Usage: `runMain graft.tools.QueryJobProbe <sfDir> q155[,q185,...]`
  */
object QueryJobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';')
      .filter(_.contains('=')).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); b.config(k, v)
      })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class J(id: Int, var desc: String = "", var tasks: Int = 0,
                       var t0: Long = 0L, var t1: Long = 0L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = J(e.jobId)
        j.t0 = e.time
        j.desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse(e.stageInfos.lastOption.map(_.name).getOrElse(""))
        j.tasks = e.stageInfos.map(_.numTasks).sum
        jobs.put(j.id, j): Unit
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach(_.t1 = e.time)
      }
    }

    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warm-up (JVM/codegen), as Bench does
    try SparkEntry_warm(spark, sfDir) catch { case _: Throwable => }

    names.foreach { name =>
      jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      run(graft.SparkEntry.queries(name)(spark, sfDir))
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      import scala.jdk.CollectionConverters._
      val js = jobs.values().asScala.toSeq.sortBy(_.id)
      println(f"== $name: wall $wall%.2f s, ${js.size} jobs, " +
        f"job-time sum ${js.map(j => (j.t1 - j.t0) / 1e3).sum}%.2f s, " +
        f"driver gap ${wall - js.map(j => (j.t1 - j.t0) / 1e3).sum}%.2f s")
      js.foreach { j =>
        println(f"  job ${j.id}%4d ${(j.t1 - j.t0) / 1e3}%7.3f s " +
          f"${j.tasks}%5d tasks  ${j.desc.take(110)}")
      }
    }
    spark.stop()
  }

  private def SparkEntry_warm(spark: SparkSession, sfDir: String): Unit =
    graft.SparkEntry.queries("q00_tpch_q1")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
}
