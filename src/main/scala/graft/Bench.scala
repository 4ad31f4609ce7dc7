package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Full materialization of every output column via the noop sink —
    // a bare .count() would let Catalyst eliminate sorts and prune
    // projections, benchmarking a fraction of the real query.
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // Warm up JVM/codegen/catalog paths once so per-query timings measure
    // query execution rather than first-use initialization.
    try SparkEntry.queries.get("q00_tpch_q1").foreach(f => run(f(spark, sfDir)))
    catch { case _: Throwable => }
    // optional comma-separated name substrings to bench a subset (dev loop)
    val keep: String => Boolean = sys.env.get("SPARK_GRAFT_QUERIES") match {
      case Some(p) => val pats = p.split(','); n => pats.exists(n.contains)
      case None => _ => true
    }
    val results = SparkEntry.queries.filter(e => keep(e._1)).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try run(fn(spark, sfDir)) catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
