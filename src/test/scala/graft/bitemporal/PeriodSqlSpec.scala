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

  test("predicates inside comments pass through; after comments expand") {
    // in a line comment (note the apostrophe BEFORE it — the comment
    // lexer must not let `don't` open a phantom literal either)
    val q1 = """SELECT 'don''t' AS s FROM t
      -- t.SYSTEM_TIME CONTAINS TIMESTAMP '2020-01-01'
      WHERE t.APPLICATION_TIME OVERLAPS u.APPLICATION_TIME"""
    val x1 = e(q1)
    assert(x1.contains("-- t.SYSTEM_TIME CONTAINS TIMESTAMP '2020-01-01'"),
      "commented predicate stayed verbatim")
    assert(x1.contains("(t._valid_from < u._valid_to AND u._valid_from < t._valid_to)"),
      "the real predicate after the comment still expanded")
    // in a nested block comment
    val q2 = """SELECT 1 FROM t /* a /* nested */ comment with
      t.SYSTEM_TIME CONTAINS TIMESTAMP '2020' */
      WHERE PERIOD(a, b) PRECEDES PERIOD(c, d)"""
    val x2 = e(q2)
    assert(x2.contains("t.SYSTEM_TIME CONTAINS TIMESTAMP '2020' */"))
    assert(x2.contains("((b) <= (c))"))
  }

  test("period keywords as quoted identifiers / aliases pass through") {
    // backtick-quoted identifier spelled like the period word
    val q1 = "SELECT `SYSTEM_TIME` FROM t WHERE `SYSTEM_TIME` = 1"
    assert(e(q1) == q1)
    // a column ALIASED to the period word (no predicate verb follows)
    val q2 = "SELECT _valid_from AS application_time FROM t ORDER BY application_time"
    assert(e(q2) == q2)
  }

  test("every predicate form agrees with the Periods Column algebra") {
    import org.apache.spark.sql.functions._
    import graft.ra.Periods
    val spark = graft.TestSpark.spark
    import spark.implicits._
    // 300 random half-open interval pairs over a SMALL instant domain
    // (0..9 seconds) so boundary cases (touching, equal, contained)
    // occur often rather than never
    val rnd = new scala.util.Random(11)
    def t(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    val rows = (1 to 300).map { i =>
      val Seq(af, at, bf, bt) = Seq.fill(2) {
        val a = rnd.nextInt(10); val b = rnd.nextInt(10)
        (math.min(a, b), math.max(a, b) + 1)
      }.flatMap { case (lo, hi) => Seq(lo, hi) }
      (i.toLong, t(af), t(at), t(bf), t(bt))
    }
    val df = rows.toDF("id", "a_from", "a_to", "b_from", "b_to")
    df.createOrReplaceTempView("pp_prop")
    try {
      val forms: Seq[(String, (Periods.Period, Periods.Period) => org.apache.spark.sql.Column)] = Seq(
        "OVERLAPS" -> Periods.overlaps,
        "EQUALS" -> Periods.equalsP,
        "CONTAINS" -> Periods.contains,
        "PRECEDES" -> Periods.precedes,
        "SUCCEEDS" -> Periods.succeeds,
        "IMMEDIATELY PRECEDES" -> Periods.immediatelyPrecedes,
        "IMMEDIATELY SUCCEEDS" -> Periods.immediatelySucceeds)
      val pa = Periods.period(col("a_from"), col("a_to"))
      val pb = Periods.period(col("b_from"), col("b_to"))
      forms.foreach { case (verb, fn) =>
        val viaSql = spark.sql(PeriodSql.expand(
            s"SELECT id FROM pp_prop WHERE PERIOD(a_from, a_to) $verb PERIOD(b_from, b_to)"))
          .collect().map(_.getLong(0)).toSet
        val viaApi = df.filter(fn(pa, pb)).select($"id")
          .collect().map(_.getLong(0)).toSet
        assert(viaSql == viaApi, s"$verb diverged: sql ${viaSql.size} vs api ${viaApi.size}")
        assert(viaSql.nonEmpty || verb == "EQUALS",
          s"$verb: degenerate fixture, nothing matched") // EQUALS may be rare
      }
      // CONTAINS point form
      val viaSqlPt = spark.sql(PeriodSql.expand(
          "SELECT id FROM pp_prop WHERE PERIOD(a_from, a_to) CONTAINS TIMESTAMP '1970-01-01 00:00:05'"))
        .collect().map(_.getLong(0)).toSet
      val viaApiPt = df.filter(Periods.containsTs(pa, lit(t(5))))
        .select($"id").collect().map(_.getLong(0)).toSet
      assert(viaSqlPt == viaApiPt && viaSqlPt.nonEmpty)
    } finally spark.catalog.dropTempView("pp_prop")
  }
}
