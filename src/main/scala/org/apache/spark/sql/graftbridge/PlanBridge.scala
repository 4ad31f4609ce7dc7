package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal accessor for the two `private[sql]` entry points graft's
  * temporal SQL front-end needs: parse a query to an UNRESOLVED plan,
  * and execute a (possibly rewritten) plan as a DataFrame. Lives under
  * `org.apache.spark.sql` for visibility — the standard extension-
  * library pattern; no Spark internals are modified. */
object PlanBridge {

  private def cs(spark: SparkSession): classic.SparkSession =
    spark.asInstanceOf[classic.SparkSession]

  /** Parse SQL text into an unresolved logical plan (no analysis). */
  def parsePlan(spark: SparkSession, sql: String): LogicalPlan =
    cs(spark).sessionState.sqlParser.parsePlan(sql)

  /** Execute a logical plan as a DataFrame (analysis happens here). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(cs(spark), plan)

  /** A DataFrame's pre-analysis logical plan, for plan-level splicing. */
  def logicalPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.logical
}
