package graft.bitemporal

import java.util.regex.{Matcher, Pattern}

/** SQL:2011 period predicates as SQL TEXT — the front-end half of
  * [[graft.ra.Periods]]. The reference accepts predicates like
  *
  *   WHERE t1.APPLICATION_TIME OVERLAPS t2.APPLICATION_TIME
  *   WHERE t.SYSTEM_TIME CONTAINS TIMESTAMP '2020-06-01'
  *   WHERE PERIOD(o_orderdate, o_shipdate) PRECEDES PERIOD(x, y)
  *
  * in its SQL grammar (xtdb/core2 period predicates over the two
  * built-in periods, README.adoc:11; SURVEY.md §2.4 "period
  * predicates"). Spark's parser has no PERIOD type or predicate
  * keywords, so this rewrites each predicate textually into the plain
  * comparisons of the half-open `[from, to)` algebra — the SAME
  * expansion `Periods.scala` defines over Columns, so both front ends
  * share one semantics. The output is ordinary ANSI SQL: fully
  * codegen'd, sargable, parquet-stat-prunable (nothing to special-case
  * at 100 TB).
  *
  * Period operands:
  *   [alias.]APPLICATION_TIME  → (alias._valid_from,  alias._valid_to)
  *   [alias.]SYSTEM_TIME       → (alias._system_from, alias._system_to)
  *   PERIOD(a, b)              → (a, b) — any timestamp expressions,
  *                               nested parens/quotes respected
  *
  * Predicates (a = left, b = right, half-open intervals):
  *   a OVERLAPS b              a.from < b.to  AND b.from < a.to
  *   a EQUALS b                a.from = b.from AND a.to = b.to
  *   a CONTAINS b (period)     a.from <= b.from AND a.to >= b.to
  *   a CONTAINS p (point)      a.from <= p AND p < a.to
  *   a PRECEDES b              a.to <= b.from
  *   a SUCCEEDS b              a.from >= b.to
  *   a IMMEDIATELY PRECEDES b  a.to = b.from
  *   a IMMEDIATELY SUCCEEDS b  a.from = b.to
  *
  * CONTAINS' right operand is a point when it isn't one of the period
  * forms: a `TIMESTAMP '…'` / `DATE '…'` / `'…'` literal or a
  * parenthesized expression.
  *
  * Matches inside quoted literals are skipped (same tokenizer as
  * [[BitemporalSql]] stage 1). Rewrite happens BEFORE the temporal
  * clause rewrite's parse, so the placeholder relations and period
  * predicates compose: `FROM t FOR ALL APPLICATION_TIME WHERE
  * t.APPLICATION_TIME OVERLAPS PERIOD(…, …)` works end to end.
  */
object PeriodSql {

  /** A period operand resolved to its (from, to) SQL texts. */
  private final case class P(from: String, to: String)

  private val dimWord =
    Pattern.compile("(?:(\\w+)\\s*\\.\\s*)?(APPLICATION_TIME|VALID_TIME|SYSTEM_TIME)\\b",
      Pattern.CASE_INSENSITIVE)
  private val periodWord =
    Pattern.compile("PERIOD\\s*\\(", Pattern.CASE_INSENSITIVE)
  private val verb = Pattern.compile(
    "\\s+(OVERLAPS|EQUALS|CONTAINS|PRECEDES|SUCCEEDS|" +
      "IMMEDIATELY\\s+PRECEDES|IMMEDIATELY\\s+SUCCEEDS)\\s+",
    Pattern.CASE_INSENSITIVE)
  private val pointHead = Pattern.compile(
    "(?:(?:TIMESTAMP|DATE)\\s*)?'", Pattern.CASE_INSENSITIVE)

  private def cols(alias: String, dim: String): P = {
    val q = if (alias == null) "" else s"$alias."
    if (dim.equalsIgnoreCase("SYSTEM_TIME"))
      P(s"${q}_system_from", s"${q}_system_to")
    else P(s"${q}_valid_from", s"${q}_valid_to")
  }

  /** Scan from an opening paren offset to its balanced close, honoring
    * single-quoted strings; returns (inside-text, offset-after-close). */
  private def balanced(s: String, open: Int): (String, Int) = {
    var depth = 0; var inStr = false; var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => inStr = !inStr
        case '(' if !inStr => depth += 1
        case ')' if !inStr =>
          depth -= 1
          if (depth == 0) return (s.substring(open + 1, i), i + 1)
        case _ =>
      }
      i += 1
    }
    throw new IllegalArgumentException(
      s"unbalanced parentheses after offset $open: $s")
  }

  /** Split `a, b` on the single top-level comma. */
  private def two(inside: String): (String, String) = {
    val parts = BitemporalDml.splitTopLevel(inside)
    require(parts.length == 2,
      s"PERIOD(...) takes exactly two expressions, got: $inside")
    (parts(0), parts(1))
  }

  /** Try to read a period operand at offset `i`; None if `i` doesn't
    * start one. Returns the operand and the offset after it. */
  private def operandAt(q: String, i: Int): Option[(P, Int)] = {
    val pm = periodWord.matcher(q)
    if (pm.region(i, q.length).lookingAt()) {
      val (inside, after) = balanced(q, pm.end() - 1)
      val (a, b) = two(inside)
      return Some((P(s"($a)", s"($b)"), after))
    }
    val dm = dimWord.matcher(q)
    if (dm.region(i, q.length).lookingAt())
      return Some((cols(dm.group(1), dm.group(2)), dm.end()))
    None
  }

  /** The right operand of CONTAINS when it isn't a period: a timestamp
    * or string literal, or a parenthesized expression. */
  private def pointAt(q: String, i: Int): Option[(String, Int)] = {
    if (i < q.length && q.charAt(i) == '(') {
      val (inside, after) = balanced(q, i)
      return Some((s"($inside)", after))
    }
    val m = pointHead.matcher(q)
    if (!m.region(i, q.length).lookingAt()) return None
    // find the literal's closing quote ('' escape honored)
    var j = m.end()
    while (j < q.length) {
      if (q.charAt(j) == '\'') {
        if (j + 1 < q.length && q.charAt(j + 1) == '\'') j += 2
        else return Some((q.substring(i, j + 1), j + 1))
      } else j += 1
    }
    None
  }

  private def expansion(a: P, op: String, b: Either[String, P]): String = {
    val v = op.toUpperCase.replaceAll("\\s+", " ")
    (v, b) match {
      case ("OVERLAPS", Right(p)) =>
        s"(${a.from} < ${p.to} AND ${p.from} < ${a.to})"
      case ("EQUALS", Right(p)) =>
        s"(${a.from} = ${p.from} AND ${a.to} = ${p.to})"
      case ("CONTAINS", Right(p)) =>
        s"(${a.from} <= ${p.from} AND ${a.to} >= ${p.to})"
      case ("CONTAINS", Left(pt)) =>
        s"(${a.from} <= $pt AND $pt < ${a.to})"
      case ("PRECEDES", Right(p)) => s"(${a.to} <= ${p.from})"
      case ("SUCCEEDS", Right(p)) => s"(${a.from} >= ${p.to})"
      case ("IMMEDIATELY PRECEDES", Right(p)) => s"(${a.to} = ${p.from})"
      case ("IMMEDIATELY SUCCEEDS", Right(p)) => s"(${a.from} = ${p.to})"
      case (other, Left(_)) => throw new IllegalArgumentException(
        s"$other needs a period right operand (only CONTAINS takes a point)")
      case (other, _) => throw new IllegalArgumentException(
        s"unknown period predicate: $other")
    }
  }

  /** Expand every period predicate in `query` to plain SQL comparisons;
    * text inside quoted literals, quoted identifiers and comments
    * ([[SqlText]] spans) passes through untouched. Idempotent on
    * queries without period predicates. */
  def expand(query: String): String = {
    val out = new StringBuilder
    var i = 0
    val literals = SqlText.maskedSpans(query)
    while (i < query.length) {
      val inLiteral = SqlText.masked(literals, i)
      // operands only start at a word boundary: mid-identifier offsets
      // (MY_APPLICATION_TIME, USER_PERIOD(...)) must not half-match
      val atBoundary = i == 0 || {
        val p = query.charAt(i - 1)
        !Character.isLetterOrDigit(p) && p != '_' && p != '.'
      }
      val step: Option[Int] = if (inLiteral || !atBoundary) None else {
        operandAt(query, i).flatMap { case (a, afterA) =>
          val vm = verb.matcher(query)
          if (!vm.region(afterA, query.length).lookingAt()) None
          else {
            val op = vm.group(1)
            val afterVerb = vm.end()
            val right: Option[(Either[String, P], Int)] =
              operandAt(query, afterVerb).map { case (p, e) => (Right(p), e) }
                .orElse(
                  if (op.equalsIgnoreCase("CONTAINS"))
                    pointAt(query, afterVerb).map { case (t, e) => (Left(t), e) }
                  else None)
            right.map { case (b, end) =>
              out.append(expansion(a, op, b))
              end
            }
          }
        }
      }
      step match {
        case Some(next) => i = next
        case None => out.append(query.charAt(i)); i += 1
      }
    }
    out.toString
  }

}
