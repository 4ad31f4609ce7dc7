package graft.bitemporal

import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the shared SQL lexer backing every temporal text
  * stage — spans must be exact on adversarial compositions of literals,
  * quoted identifiers and (nested) comments, because one mis-lexed span
  * silently disables or corrupts a rewrite downstream. */
class SqlTextSpec extends AnyFunSuite {

  private val maskedFragments = Seq(
    "'a string'", "'don''t'", "'back\\'slash'", "\"dq id\"", "\"d\"\"q\"",
    "`weird id`", "`back``tick`", "-- line comment with ' and \"\n",
    "/* block ' */", "/* outer /* nested ' */ tail */",
    "-- t.SYSTEM_TIME CONTAINS TIMESTAMP '2020-01-01'\n",
    "'x OVERLAPS y'", "/* PERIOD(a, b) PRECEDES PERIOD(c, d) */")
  private val codeFragments = Seq(
    "SELECT a", " FROM t ", " WHERE x = 1 ", " AND y < 2 ", ", z ",
    " GROUP BY k ", " ORDER BY a ")

  test("spans are sorted, disjoint, in-bounds, and start at span openers") {
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 300) {
      val n = 1 + rnd.nextInt(8)
      val q = (1 to n).map { _ =>
        if (rnd.nextBoolean()) maskedFragments(rnd.nextInt(maskedFragments.size))
        else codeFragments(rnd.nextInt(codeFragments.size))
      }.mkString
      val spans = SqlText.maskedSpans(q)
      spans.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) => assert(e1 <= s2, s"overlap in: $q")
        case _ =>
      }
      spans.foreach { case (s, e) =>
        assert(s >= 0 && s < e && e <= q.length, s"bounds in: $q")
        assert("'\"`-/".contains(q.charAt(s)), s"opener at $s in: $q")
      }
    }
  }

  test("text made ONLY of masked fragments is inert to PeriodSql") {
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 200) {
      val q = (1 to 1 + rnd.nextInt(6))
        .map(_ => maskedFragments(rnd.nextInt(maskedFragments.size)))
        .mkString(" ")
      assert(PeriodSql.expand(q) == q, s"rewrote masked content: $q")
    }
  }

  test("unterminated spans run to end of text without crashing") {
    for (q <- Seq("SELECT '", "SELECT \"abc", "x /* never closed",
        "y -- no newline", "z `tick")) {
      val spans = SqlText.maskedSpans(q)
      assert(spans.nonEmpty && spans.last._2 == q.length, s"$q -> $spans")
    }
  }

  test("a predicate straddling real code still expands next to masks") {
    val q = "SELECT 'don''t' AS s /* note */ FROM t " +
      "WHERE t.APPLICATION_TIME OVERLAPS u.APPLICATION_TIME -- tail '"
    val x = PeriodSql.expand(q)
    assert(x.contains("(t._valid_from < u._valid_to AND u._valid_from < t._valid_to)"))
    assert(x.contains("'don''t'") && x.contains("/* note */") && x.contains("-- tail '"))
  }
}
