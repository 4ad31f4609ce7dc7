package graft.server

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-call SQL-text entry covering the FULL graft surface — what a
  * front door does per statement, callable without installing the
  * session extensions (embedding apps, tests, the verify harness):
  *
  *   1. materialized-view DDL executes eagerly ([[GraftMatviews]]);
  *   2. registered matview names re-bind to their current state;
  *   3. `graft_*( … )` table-valued procedures substitute to their
  *      result relations ([[GraftProcedures]]);
  *   4. the rewritten text goes to `spark.sql` — which, on a session
  *      carrying `graft.GraftExtensions`, ALSO resolves temporal
  *      clauses, graft DML and recursive CTEs via [[GraftSqlParser]].
  *
  * Sessions with the extensions installed don't need this object —
  * `spark.sql` alone does all four (the parser calls the same hooks);
  * pgwire/HTTP/Connect ride that path. This entry exists so the text
  * surface is NOT coupled to extension installation.
  */
object GraftSql {
  def sql(spark: SparkSession, text: String): DataFrame =
    GraftMatviews.routeDdl(spark, text)
      .orElse(GraftMaintenance.route(spark, text))
      .getOrElse {
        GraftMatviews.refreshReferenced(spark, text)
        spark.sql(GraftProcedures.rewrite(spark, text))
      }
}
