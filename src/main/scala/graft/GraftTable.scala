package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.bitemporal.{Bitemporal, BitemporalSql, TxLog, TxOps}

/** The user-facing bitemporal table — the facade a reference (xtdb/core2)
  * user lands on: submit put/delete/erase transactions, read the current
  * state or any bitemporal basis, time-travel via SQL:2011 clauses.
  *
  * Maps one-to-one onto the reference's surface (README.adoc:11-15):
  *   submit-tx [[put]]/[[delete]]/[[erase]]  → tx-log append
  *   db / basis                              → [[current]] / [[asOf]]
  *   FOR SYSTEM_TIME / APPLICATION_TIME      → [[sql]]
  *   entity history                          → [[history]]
  *
  * Storage: an append-only parquet tx log plus a compacted,
  * system-date-partitioned rectangle base; reads union base +
  * unapplied tail (read-your-writes, cost ∝ tail) — see SCALING.md.
  */
final class GraftTable(spark: SparkSession, dir: String,
                       payloadCols: Seq[String]) {
  private val log = new TxLog(dir)
  private var lastCompacted: Long = -1L

  /** Submit a put transaction: rows become document versions valid from
    * `validFrom` (to `validTo`, default unbounded). Returns the tx id. */
  def put(rows: DataFrame, id: Column, validFrom: Column,
          validTo: Option[Column] = None,
          payload: Seq[(String, Column)],
          systemTime: Timestamp): Long =
    log.append(TxOps.put(rows, id, validFrom, validTo, payload), systemTime)

  /** Submit a delete over a valid-time portion. */
  def delete(rows: DataFrame, id: Column, validFrom: Column,
             validTo: Option[Column] = None,
             payload: Seq[(String, Column)],
             systemTime: Timestamp): Long =
    log.append(TxOps.delete(rows, id, validFrom, validTo, payload), systemTime)

  /** Submit an erase: the id's entire history is removed (applied
    * physically at the next [[compact]]). */
  def erase(rows: DataFrame, id: Column,
            payload: Seq[(String, Column)], systemTime: Timestamp): Long =
    log.append(TxOps.erase(rows, id, payload), systemTime)

  /** Fold the log into the partitioned rectangle base. */
  def compact(): Unit = { lastCompacted = log.compact(spark, payloadCols) }

  /** All rectangles: compacted base + re-fold of ids touched since. */
  def rectangles(): DataFrame =
    if (lastCompacted < 0) Bitemporal.fold(log.read(spark), payloadCols)
    else log.readAll(spark, payloadCols, lastCompacted)

  /** Snapshot at a bitemporal basis. */
  def asOf(validTime: Timestamp, systemTime: Timestamp): DataFrame =
    Bitemporal.asOf(rectangles(), lit(validTime), lit(systemTime))

  /** The latest known state (system = valid = now). */
  def current(): DataFrame = Bitemporal.currentState(rectangles())

  /** Valid-time history as believed at `systemTime`. */
  def history(systemTime: Timestamp): DataFrame =
    Bitemporal.currentHistory(rectangles(), lit(systemTime))

  /** ANSI SQL over this table (registered under `name`) with
    * `FOR SYSTEM_TIME / FOR APPLICATION_TIME AS OF` support. */
  def sql(name: String, query: String): DataFrame =
    BitemporalSql.sql(spark, query, Map(name -> rectangles()))
}
