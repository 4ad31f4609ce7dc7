package graft.bitemporal

import org.scalatest.funsuite.AnyFunSuite

/** Textual expansion of SQL:2011 period predicates — each form against
  * its defined comparison algebra ([[graft.ra.Periods]]), plus the
  * non-matching cases that must pass through untouched. */
class PeriodSqlSpec extends AnyFunSuite {

  private def e(s: String) = PeriodSql.expand(s)

  test("OVERLAPS on two table periods") {
    assert(e("a.APPLICATION_TIME OVERLAPS b.APPLICATION_TIME") ==
      "(a._valid_from < b._valid_to AND b._valid_from < a._valid_to)")
  }

  test("dimension mapping: SYSTEM_TIME vs APPLICATION_TIME vs VALID_TIME") {
    assert(e("t.SYSTEM_TIME EQUALS t.APPLICATION_TIME") ==
      "(t._system_from = t._valid_from AND t._system_to = t._valid_to)")
    assert(e("VALID_TIME PRECEDES SYSTEM_TIME") ==
      "(_valid_to <= _system_from)")
  }

  test("CONTAINS takes a period or a point") {
    assert(e("t.APPLICATION_TIME CONTAINS u.APPLICATION_TIME") ==
      "(t._valid_from <= u._valid_from AND t._valid_to >= u._valid_to)")
    assert(e("t.SYSTEM_TIME CONTAINS TIMESTAMP '2020-06-01 00:00:00'") ==
      "(t._system_from <= TIMESTAMP '2020-06-01 00:00:00' AND " +
        "TIMESTAMP '2020-06-01 00:00:00' < t._system_to)")
    assert(e("t.SYSTEM_TIME CONTAINS (now() - INTERVAL 1 DAY)") ==
      "(t._system_from <= (now() - INTERVAL 1 DAY) AND " +
        "(now() - INTERVAL 1 DAY) < t._system_to)")
  }

  test("PERIOD(a, b) constructor, nested parens and commas honored") {
    assert(e("PERIOD(o_orderdate, date_add(o_orderdate, 30)) PRECEDES " +
        "PERIOD(l_shipdate, l_receiptdate)") ==
      "((date_add(o_orderdate, 30)) <= (l_shipdate))")
  }

  test("SUCCEEDS and the IMMEDIATELY forms") {
    assert(e("a.SYSTEM_TIME SUCCEEDS PERIOD(x, y)") ==
      "(a._system_from >= (y))")
    assert(e("a.APPLICATION_TIME IMMEDIATELY PRECEDES b.APPLICATION_TIME") ==
      "(a._valid_to = b._valid_from)")
    assert(e("a.APPLICATION_TIME IMMEDIATELY SUCCEEDS b.APPLICATION_TIME") ==
      "(a._valid_from = b._valid_to)")
  }

  test("several predicates in one query, surrounding SQL untouched") {
    val q = """SELECT * FROM t, u
      WHERE t.APPLICATION_TIME OVERLAPS u.APPLICATION_TIME
        AND t.SYSTEM_TIME CONTAINS TIMESTAMP '2020-01-01'
        AND t.x > 5"""
    val x = e(q)
    assert(x.contains("(t._valid_from < u._valid_to AND u._valid_from < t._valid_to)"))
    assert(x.contains("(t._system_from <= TIMESTAMP '2020-01-01' AND " +
      "TIMESTAMP '2020-01-01' < t._system_to)"))
    assert(x.contains("t.x > 5") && x.startsWith("SELECT * FROM t, u"))
  }

  test("quoted literals and mid-identifier matches pass through") {
    val lit = "SELECT 'a.APPLICATION_TIME OVERLAPS b.APPLICATION_TIME' AS s FROM t"
    assert(e(lit) == lit)
    val mid = "SELECT MY_APPLICATION_TIME, USER_PERIOD(x, y) FROM t"
    assert(e(mid) == mid)
    // a period word with no predicate after it is not a predicate
    val bare = "SELECT t.APPLICATION_TIME FROM t"
    assert(e(bare) == bare)
  }

  test("idempotent on period-free SQL") {
    val q = "SELECT a, b FROM t WHERE x OVERLAPS_COL = 1 AND y = 'CONTAINS'"
    assert(e(q) == q)
  }
}
