package graft.server

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.sql.types.{DataType, StructType}

import graft.bitemporal.BitemporalSql

/** The SQL front door: a delegating parser that gives EVERY consumer of
  * `spark.sql` — including remote Spark Connect clients, who can only
  * send SQL text — the graft temporal surface on tables registered with
  * [[GraftServer]]:
  *
  *   - `SELECT … FROM t FOR SYSTEM_TIME AS OF …` (and the rest of the
  *     SQL:2011 clause sugar) resolves through
  *     [[graft.bitemporal.BitemporalSql]] against the table's live
  *     rectangles; a bare `FROM t` serves the current basis;
  *   - `INSERT / UPDATE / DELETE / ERASE` statements targeting a
  *     registered table submit a TRANSACTION via
  *     [[graft.GraftTable.dml]], stamped with the wall clock, and
  *     return a one-row `(tx_id)` relation — executed when the
  *     statement is parsed, exactly like DDL;
  *   - everything else goes verbatim to Spark's own parser.
  *
  * Re-entrancy: the graft rewrite itself parses the clause-stripped
  * query with the session parser (= this one). The thread-local guard
  * sends that inner parse straight to the delegate — without it the
  * table names still present after clause-stripping would re-trigger
  * the rewrite forever. */
final class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  private val dmlHead =
    java.util.regex.Pattern.compile(
      "^\\s*(INSERT|UPDATE|DELETE|ERASE)\\b", java.util.regex.Pattern.CASE_INSENSITIVE)

  override def parsePlan(sqlText: String): LogicalPlan = {
    val tables = GraftServer.registered
    if (GraftSqlParser.inRewrite.get() || tables.isEmpty)
      return delegate.parsePlan(sqlText)

    val referenced = tables.keys.filter(n =>
      java.util.regex.Pattern.compile(s"(?i)\\b${java.util.regex.Pattern.quote(n)}\\b")
        .matcher(sqlText).find())
    if (referenced.isEmpty) return delegate.parsePlan(sqlText)

    if (dmlHead.matcher(sqlText).find()) {
      // A `;`-separated batch is ONE transaction (the reference's
      // submit-tx takes a vector of ops) — every statement must parse
      // as graft DML and target the SAME registered table. DML that
      // doesn't parse as a graft statement (or targets an unregistered
      // table) belongs to Spark's own surface.
      val statements =
        graft.bitemporal.BitemporalDml.splitTopLevel(sqlText, ';')
      scala.util.Try(statements.map(s =>
          graft.bitemporal.BitemporalDml.parse(s).table).distinct)
        .toOption
        .collect { case Seq(target) => target } // one table per tx
        .flatMap(target => tables.collectFirst {
          case (n, t) if n.equalsIgnoreCase(target) => (n, t)
        }) match {
          case Some((name, table)) =>
            val now = new java.sql.Timestamp(System.currentTimeMillis())
            val txId =
              if (statements.size == 1) table.dml(name, statements.head, now)
              else table.dmlTx(name, statements, now)
            import session.implicits._
            PlanBridge.logicalPlan(Seq(txId).toDF("tx_id"))
          case None => delegate.parsePlan(sqlText)
        }
    } else {
      GraftSqlParser.inRewrite.set(true)
      try PlanBridge.logicalPlan(BitemporalSql.sql(session, sqlText,
        referenced.map(n => n -> tables(n).rectangles()).toMap))
      finally GraftSqlParser.inRewrite.set(false)
    }
  }

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {
  private val inRewrite = new ThreadLocal[Boolean] {
    override def initialValue(): Boolean = false
  }
}
