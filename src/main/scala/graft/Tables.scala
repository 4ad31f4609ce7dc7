package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table access. All driver fixtures are single parquet files per
  * table (TESTDATA.md / FIXTURES.md). At 100 TB each "file" becomes a
  * directory of many parquet parts — `spark.read.parquet` handles both, so
  * every query written against these helpers scales unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // The events fixture stores ts as parquet TIMESTAMP(NANOS), which
      // Spark's vectorized reader rejects (PARQUET_TYPE_ILLEGAL). Read the
      // raw int64 nanos and truncate to a micros TIMESTAMP_NTZ — the same
      // value DuckDB's CAST(ts AS TIMESTAMP) produces, keeping oracle
      // comparisons exact. The legacy-conf change is scoped: set for the
      // duration of the (lazy) plan construction, then restored, so other
      // reads in the session keep their configured behavior.
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      try {
        val raw = spark.read.parquet(s"$dir/events.parquet")
        raw.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            // nanos fixture: floor-division on the int64 nanos (not `div`,
            // which truncates toward zero and would diverge from DuckDB on
            // pre-epoch values)
            raw.withColumn("ts", org.apache.spark.sql.functions.expr(
              "CAST(timestamp_micros((ts - pmod(ts, 1000)) div 1000) AS TIMESTAMP_NTZ)"))
          case _ =>
            // micros fixture (fixture generations differ): already a
            // timestamp — normalize to NTZ so both generations present one
            // schema to every query and to the oracle compare
            raw.withColumn("ts",
              org.apache.spark.sql.functions.col("ts").cast("timestamp_ntz"))
        }
      } finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every fixture table as a temp view so `spark.sql` queries
    * (scalar subqueries, LATERAL, CTEs) can name them like the DuckDB
    * oracle does. Idempotent per session. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
