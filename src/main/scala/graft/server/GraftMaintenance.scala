package graft.server

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.bitemporal.SqlText

/** Maintenance statements for the SQL front doors: a wire client runs
  * the table lifecycle ops a deployment needs without a Scala shell —
  *
  *   - `COMPACT <table>` / `OPTIMIZE <table>` → incremental compaction
  *     (fold the log tail into the clustered base);
  *   - `VACUUM <table>` → compact + truncate the fully-represented log
  *     prefix (the reference's log-retention story).
  *
  * Postgres (`VACUUM`) and Delta (`OPTIMIZE`/`VACUUM`) spell these the
  * same way, so stock clients and muscle memory both work. Statements
  * route only when the named table is graft-registered — anything else
  * falls through to Spark's own parser. Every op acquires the
  * single-maintainer lease ([[graft.bitemporal.MaintainerLease]]), so a
  * wire-triggered compaction contends safely with any other maintainer
  * and returns the lease error as a statement error. */
object GraftMaintenance {

  private val re =
    "(?is)^\\s*(VACUUM|OPTIMIZE|COMPACT)\\s+([A-Za-z_]\\w*)\\s*;?\\s*$".r

  def route(spark: SparkSession, sql: String): Option[DataFrame] =
    SqlText.stripLeadingComments(sql) match {
      case re(verb, name) =>
        GraftServer.registered.collectFirst {
          case (n, t) if n.equalsIgnoreCase(name) => (n, t)
        }.map { case (n, t) =>
          val action = verb.toUpperCase match {
            case "VACUUM" => t.vacuumLog(); "VACUUM"
            case _ => t.compact(); "COMPACT"
          }
          import spark.implicits._
          Seq((n, action, true)).toDF("table", "action", "ok")
        }
      case _ => None
    }
}
