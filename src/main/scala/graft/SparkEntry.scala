package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the oracle-checked query catalog from graft.queries.*. */
object SparkEntry {
  /** Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001; driver
    * smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q00_tpch_q1")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Analytics.queries ++
      graft.queries.Streams.queries ++
      graft.queries.Llm.queries ++
      graft.queries.Bitemp.queries ++
      graft.queries.DatalogQ.queries ++
      graft.queries.Extras.queries ++
      graft.queries.TpchMore.queries ++
      graft.queries.TpchRest.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.Analytics.oracle ++
      graft.queries.Streams.oracle ++
      graft.queries.Llm.oracle ++
      graft.queries.Bitemp.oracle ++
      graft.queries.DatalogQ.oracle ++
      graft.queries.Extras.oracle ++
      graft.queries.TpchMore.oracle ++
      graft.queries.TpchRest.oracle
}
