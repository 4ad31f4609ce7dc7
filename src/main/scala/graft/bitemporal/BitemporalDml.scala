package graft.bitemporal

import java.util.regex.Pattern

/** SQL DML front-end for bitemporal tables: parses the reference's four
  * write statements (xtdb/core2 "transactions", README.adoc:13; SURVEY.md
  * §3.3) into an ADT that [[graft.GraftTable.dml]] compiles onto tx-log
  * operations:
  *
  *   INSERT INTO t (_id[, _valid_from[, _valid_to]], payload...)
  *     VALUES (...), ... | SELECT ...           → put
  *   UPDATE t [FOR PORTION OF APPLICATION_TIME FROM 'a' TO 'b']
  *     SET col = expr, ... [WHERE pred]         → put over matching rows
  *   DELETE FROM t [FOR PORTION OF ...] [WHERE pred] → delete
  *   ERASE  FROM t [WHERE pred]                 → erase (whole history)
  *
  * An omitted WHERE targets every current row (standard SQL).
  *
  * Only the temporal clauses are parsed here; VALUES/SELECT sources, SET
  * right-hand sides and WHERE predicates are handed verbatim to Spark's
  * own parser (`spark.sql` / `expr`) — the same front-end split as the
  * read side ([[BitemporalSql]]): temporal resolution first, ANSI SQL
  * delegated.
  */
object BitemporalDml {

  /** Valid-time portion `[from, to)`; absent ⇒ `[systemTime, ∞)`. */
  final case class Portion(from: String, to: String)

  sealed trait Stmt { def table: String }
  final case class Insert(table: String, cols: Seq[String],
                          source: String) extends Stmt
  final case class Update(table: String, portion: Option[Portion],
                          sets: Seq[(String, String)],
                          where: String) extends Stmt
  final case class Delete(table: String, portion: Option[Portion],
                          where: String) extends Stmt
  final case class Erase(table: String, where: String) extends Stmt

  private def re(p: String) =
    Pattern.compile(p, Pattern.CASE_INSENSITIVE | Pattern.DOTALL)

  private val portionRe = "(?:\\s+FOR\\s+PORTION\\s+OF\\s+APPLICATION_TIME" +
    "\\s+FROM\\s+(?:TIMESTAMP\\s+)?'([^']+)'\\s+TO\\s+(?:TIMESTAMP\\s+)?'([^']+)')?"
  private val insertRe =
    re("^\\s*INSERT\\s+INTO\\s+(\\w+)\\s*\\(([^)]*)\\)\\s*((?:VALUES|SELECT)\\b.*)$")
  // WHERE is optional (standard SQL: no predicate = every current row)
  private val updateRe =
    re(s"^\\s*UPDATE\\s+(\\w+)$portionRe\\s+SET\\s+(.*?)(?:\\s+WHERE\\s+(.*))?$$")
  private val deleteRe =
    re(s"^\\s*DELETE\\s+FROM\\s+(\\w+)$portionRe(?:\\s+WHERE\\s+(.*))?$$")
  private val eraseRe =
    re("^\\s*ERASE\\s+FROM\\s+(\\w+)(?:\\s+WHERE\\s+(.*))?$")

  private def portionOf(m: java.util.regex.Matcher, a: Int, b: Int) =
    Option(m.group(a)).map(f => Portion(f, m.group(b)))

  /** Split on a top-level separator — `,` for SET lists, `;` for
    * statement batches. Parens nest; separators inside string literals,
    * quoted identifiers and comments ([[SqlText]] spans) don't split —
    * a `;` in `-- a comment` or inside `'a;b'` stays put. */
  private[graft] def splitTopLevel(s: String, sep: Char = ','): Seq[String] = {
    val spans = SqlText.maskedSpans(s)
    val out = Seq.newBuilder[String]
    var depth = 0; var start = 0
    var i = 0
    while (i < s.length) {
      if (SqlText.masked(spans, i)) i += 1
      else {
        s.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case c if c == sep && depth == 0 =>
            out += s.substring(start, i); start = i + 1
          case _ =>
        }
        i += 1
      }
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  def parse(statement: String): Stmt = {
    // leading comments are routing noise, not grammar (`/* retry */
    // UPDATE …` — same stripping the parser's head detection applies)
    val s = SqlText.stripLeadingComments(statement).trim.stripSuffix(";")
    val ins = insertRe.matcher(s)
    if (ins.matches())
      return Insert(ins.group(1),
        ins.group(2).split(',').map(_.trim).filter(_.nonEmpty).toSeq,
        ins.group(3).trim)
    def where(g: String): String = Option(g).map(_.trim).getOrElse("true")
    val upd = updateRe.matcher(s)
    if (upd.matches())
      return Update(upd.group(1), portionOf(upd, 2, 3),
        splitTopLevel(upd.group(4)).map { a =>
          val eq = a.indexOf('=')
          require(eq > 0, s"malformed SET assignment: $a")
          (a.substring(0, eq).trim, a.substring(eq + 1).trim)
        }, where(upd.group(5)))
    val del = deleteRe.matcher(s)
    if (del.matches())
      return Delete(del.group(1), portionOf(del, 2, 3), where(del.group(4)))
    val era = eraseRe.matcher(s)
    if (era.matches()) return Erase(era.group(1), where(era.group(2)))
    throw new IllegalArgumentException(
      s"unsupported DML statement (expected INSERT/UPDATE/DELETE/ERASE): $s")
  }
}
