package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (Spark startup is
  * ~5 s; per-suite sessions would dominate test time). Re-created if a
  * suite that needs an isolated session (GraftExtensionsSpec) stopped
  * the previous one — suites run sequentially, so a fresh context here
  * is safe. */
object TestSpark {
  private var cached: SparkSession = _

  def spark: SparkSession = synchronized {
    if (cached == null || cached.sparkContext.isStopped) {
      cached = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", 4)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.warehouse.dir",
          java.nio.file.Files.createTempDirectory("graft_wh").toString)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      cached.sparkContext.setLogLevel("WARN")
    }
    cached
  }
}
