package graft.bitemporal

import java.util.concurrent.atomic.AtomicLong
import java.util.regex.Pattern

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQL:2011 temporal-query sugar: rewrites
  * `<table> FOR SYSTEM_TIME AS OF '<ts>' [FOR APPLICATION_TIME AS OF
  * '<ts>']` (either clause, either order) into a scan of the
  * basis-filtered rectangle relation, then hands the remaining ANSI SQL
  * to Spark's own parser — the same front-end split as the reference,
  * where temporal clauses resolve to scan bounds before planning
  * (xtdb/core2 resolves a *basis* per query, README.adoc:11; SURVEY.md
  * §3.1 step 5).
  *
  * Omitted clauses default to now, matching the reference's "current
  * rectangle unless asked otherwise".
  */
object BitemporalSql {

  private val viewId = new AtomicLong()

  private val clause = "FOR\\s+(SYSTEM_TIME|APPLICATION_TIME)\\s+AS\\s+OF\\s+" +
    "(?:TIMESTAMP\\s+)?'([^']+)'"
  private val tableWithClauses =
    Pattern.compile(s"(\\w+)((?:\\s+$clause){1,2})", Pattern.CASE_INSENSITIVE)
  private val onePeriod = Pattern.compile(clause, Pattern.CASE_INSENSITIVE)

  /** Run `query` with temporal-clause sugar over the given bitemporal
    * rectangle tables (e.g. a folded [[TxLog]] base). Tables referenced
    * WITHOUT a temporal clause are served at the current basis. */
  def sql(spark: SparkSession, query: String,
          tables: Map[String, DataFrame]): DataFrame = {
    var rewritten = query
    val m = tableWithClauses.matcher(query)
    val created = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) {
      val table = m.group(1)
      tables.get(table).foreach { rects =>
        var sys: Option[String] = None
        var valid: Option[String] = None
        val cm = onePeriod.matcher(m.group(2))
        while (cm.find()) {
          if (cm.group(1).equalsIgnoreCase("SYSTEM_TIME")) sys = Some(cm.group(2))
          else valid = Some(cm.group(2))
        }
        def tsOrNow(o: Option[String]) =
          o.map(s => lit(s).cast("timestamp")).getOrElse(current_timestamp())
        val view = s"${table}_asof_${viewId.incrementAndGet()}"
        Bitemporal.asOf(rects, tsOrNow(valid), tsOrNow(sys))
          .createOrReplaceTempView(view)
        created += view
        rewritten = rewritten.replace(m.group(0), view)
      }
    }
    // any remaining BARE reference (incl. a table also used WITH a
    // clause elsewhere in the query) serves the current basis. The
    // rewritten aliases never match: `prices_asof_1` has no word
    // boundary after `prices`.
    tables.foreach { case (name, rects) =>
      if (rewritten.matches(s"(?is).*\\b$name\\b.*")) {
        Bitemporal.currentState(rects).createOrReplaceTempView(name)
        created += name
      }
    }
    // spark.sql analyzes eagerly, so the returned plan is bound to the
    // view snapshots; dropping them immediately prevents unbounded
    // temp-view accumulation and raw-name shadowing of catalog tables
    try spark.sql(rewritten)
    finally created.foreach(spark.catalog.dropTempView(_))
  }
}
