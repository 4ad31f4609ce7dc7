package graft.bitemporal

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Generative fuzzing for the SQL TEXT stages (VERDICT r6 task 3):
  * every rewrite that operates on query text — period-predicate
  * expansion ([[PeriodSql]]), temporal-clause extraction + plan splice
  * ([[BitemporalSql]]), statement splitting ([[GraftPgWire]] /
  * [[BitemporalDml]]) — is driven with STRUCTURED generators whose AST
  * doubles as the oracle, so the expected output is computed by
  * construction, never by running the code under test twice.
  *
  * > 1,000 cases total across the four properties, deterministic seeds
  * (same `pureApply` idiom as BitemporalSpec — no scalatest-scalacheck
  * bridge in the offline cache).
  */
class SqlFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def forSamples[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  // ---- shared fragment pools -----------------------------------------

  /** Fragments the lexer must mask — each CONTAINS clause/predicate
    * spellings that would rewrite if mis-lexed. */
  private val maskedTraps = Seq(
    "'FOR SYSTEM_TIME ALL'",
    "'t.APPLICATION_TIME OVERLAPS u.APPLICATION_TIME'",
    "'don''t; stop'",
    "\"SYSTEM_TIME\"",
    "`APPLICATION_TIME`",
    "-- FOR SYSTEM_TIME AS OF TIMESTAMP '2020-01-01'\n",
    "/* PERIOD(a,b) CONTAINS PERIOD(c,d) */",
    "/* outer /* VALID_TIME PRECEDES */ ; tail */",
    "'a;b'")

  /** Identifier traps: contain dim/PERIOD words mid-identifier, which
    * the word-boundary guard must skip. */
  private val identTraps = Seq(
    "MY_APPLICATION_TIME", "XSYSTEM_TIME", "USER_PERIODX", "OVERLAPSY")

  // ---- property 1: period-predicate expansion by construction --------

  private sealed trait Operand { def text: String; def from: String; def to: String }
  private final case class Dim(alias: Option[String], word: String) extends Operand {
    def text: String = alias.fold(word)(a => s"$a.$word")
    private def q = alias.fold("")(a => s"$a.")
    def from: String =
      if (word.equalsIgnoreCase("SYSTEM_TIME")) s"${q}_system_from" else s"${q}_valid_from"
    def to: String =
      if (word.equalsIgnoreCase("SYSTEM_TIME")) s"${q}_system_to" else s"${q}_valid_to"
  }
  private final case class Per(a: String, b: String) extends Operand {
    def text: String = s"PERIOD($a, $b)"
    def from: String = s"($a)"
    def to: String = s"($b)"
  }

  private val genAlias = Gen.option(Gen.oneOf("t", "u", "x1"))
  private val genDimWord = Gen.oneOf("SYSTEM_TIME", "APPLICATION_TIME", "VALID_TIME")
  private val genExprTxt = Gen.oneOf("t.a", "u.b", "coalesce(x, y)",
    "TIMESTAMP '2020-01-01 00:00:01'", "d + INTERVAL '1' DAY")
  private val genOperand: Gen[Operand] = Gen.frequency(
    (3, for { a <- genAlias; w <- genDimWord } yield Dim(a, w)),
    (2, for { a <- genExprTxt; b <- genExprTxt } yield Per(a, b)))

  private val verbs = Seq("OVERLAPS", "EQUALS", "CONTAINS", "PRECEDES",
    "SUCCEEDS", "IMMEDIATELY PRECEDES", "IMMEDIATELY SUCCEEDS")
  private val genPoint = Gen.oneOf(
    "TIMESTAMP '2021-06-01 12:00:00'", "DATE '2021-06-01'", "'2021-06-01'",
    "(t.created_at)")

  /** One predicate: its text and its expected expansion. */
  private val genPredicate: Gen[(String, String)] = for {
    left <- genOperand
    verb <- Gen.oneOf(verbs)
    vSpaced <- if (verb.contains(" "))
      Gen.oneOf(verb, verb.replace(" ", "  "), verb.replace(" ", "\n"))
      else Gen.const(verb)
    usePoint <- if (verb == "CONTAINS") Gen.oneOf(true, false) else Gen.const(false)
    right <- if (usePoint) genPoint.map(Left(_)) else genOperand.map(Right(_))
  } yield {
    val rtext = right.fold(identity, _.text)
    val text = s"${left.text} $vSpaced $rtext"
    val expected = (verb, right) match {
      case ("OVERLAPS", Right(p)) =>
        s"(${left.from} < ${p.to} AND ${p.from} < ${left.to})"
      case ("EQUALS", Right(p)) =>
        s"(${left.from} = ${p.from} AND ${left.to} = ${p.to})"
      case ("CONTAINS", Right(p)) =>
        s"(${left.from} <= ${p.from} AND ${left.to} >= ${p.to})"
      case ("CONTAINS", Left(pt)) =>
        s"(${left.from} <= $pt AND $pt < ${left.to})"
      case ("PRECEDES", Right(p)) => s"(${left.to} <= ${p.from})"
      case ("SUCCEEDS", Right(p)) => s"(${left.from} >= ${p.to})"
      case ("IMMEDIATELY PRECEDES", Right(p)) => s"(${left.to} = ${p.from})"
      case ("IMMEDIATELY SUCCEEDS", Right(p)) => s"(${left.from} = ${p.to})"
      case other => sys.error(s"unreachable: $other")
    }
    (text, expected)
  }

  /** A query assembled from (verbatim-context, predicate) segments; the
    * expected expansion is assembled from the same segments. */
  private val genPeriodQuery: Gen[(String, String)] = for {
    nPred <- Gen.choose(1, 3)
    preds <- Gen.listOfN(nPred, genPredicate)
    ctx <- Gen.listOfN(nPred + 1, Gen.oneOf(
      Gen.oneOf(maskedTraps), Gen.oneOf(identTraps),
      Gen.oneOf("SELECT z FROM t WHERE", "AND k = 1 AND", "OR (", ") AND")))
  } yield {
    val in = new StringBuilder(ctx.head).append(' ')
    val ex = new StringBuilder(ctx.head).append(' ')
    preds.zip(ctx.tail).foreach { case ((ptext, pexp), c) =>
      in.append(ptext).append(' ').append(c).append(' ')
      ex.append(pexp).append(' ').append(c).append(' ')
    }
    (in.toString, ex.toString)
  }

  test("fuzz: period predicates expand exactly as constructed (450 cases)") {
    forSamples(genPeriodQuery, 450) { case (in, expected) =>
      assert(PeriodSql.expand(in) == expected, s"\ninput: $in")
    }
  }

  // ---- property 2: adversarial content is inert ----------------------

  private val genInert: Gen[String] = for {
    n <- Gen.choose(1, 8)
    parts <- Gen.listOfN(n, Gen.frequency(
      (3, Gen.oneOf(maskedTraps)),
      (2, Gen.oneOf(identTraps)),
      (2, Gen.oneOf("SELECT a FROM tb", "WHERE x=1", "GROUP BY k",
        "JOIN u ON u.k = tb.k", "ORDER BY 1 DESC"))))
  } yield parts.mkString(" ")

  test("fuzz: masked/mid-identifier clause text never rewrites (300 cases)") {
    forSamples(genInert, 300) { q =>
      assert(PeriodSql.expand(q) == q, s"\nrewrote: $q")
    }
  }

  // ---- property 3: temporal clauses vs a model oracle (Spark) --------

  /** Grid timestamps: g in 0..59 → 2020-01-01 00:00:g; 999 → year 9999
    * (open/infinity). NOW sits between them for current-state checks. */
  private def ts(g: Int): Timestamp =
    if (g == 999) Timestamp.valueOf("9999-01-01 00:00:00")
    else Timestamp.valueOf(f"2020-01-01 00:00:$g%02d")
  private def lit(g: Int): String =
    if (g == 999) "9999-01-01 00:00:00" else f"2020-01-01 00:00:$g%02d"

  private final case class Rect(id: Long, v: String,
                                vf: Int, vt: Int, sf: Int, st: Int)

  /** 24 rows: every combination of closed/open valid & system ends plus
    * boundary-touching intervals. */
  private val fixture: Seq[Rect] = {
    val ends = Seq(2 -> 4, 4 -> 6, 0 -> 999, 6 -> 999, 4 -> 5, 0 -> 2)
    for {
      (i, (vf, vt)) <- ends.zipWithIndex.map(_.swap)
      (j, (sf, st)) <- ends.take(4).zipWithIndex.map(_.swap)
    } yield Rect(i * 10L + j, s"v$i$j", vf, vt, sf, st)
  }

  private lazy val rects = {
    val schema = StructType(Seq(
      StructField("_id", LongType), StructField("v", StringType),
      StructField("_valid_from", TimestampType),
      StructField("_valid_to", TimestampType),
      StructField("_system_from", TimestampType),
      StructField("_system_to", TimestampType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(fixture.map(r =>
        Row(r.id, r.v, ts(r.vf), ts(r.vt), ts(r.sf), ts(r.st))), 2),
      schema)
  }

  private sealed trait Spec
  private case object NoClause extends Spec
  private final case class AsOf(g: Int) extends Spec
  private final case class FromTo(a: Int, b: Int) extends Spec
  private final case class Between(a: Int, b: Int) extends Spec
  private case object All extends Spec

  private val genBound = Gen.oneOf(0, 1, 2, 3, 4, 5, 6, 7)
  private val genSpec: Gen[Spec] = Gen.frequency(
    (2, Gen.const(NoClause)),
    (3, genBound.map(AsOf)),
    (2, for { a <- genBound; d <- Gen.choose(1, 4) } yield FromTo(a, a + d)),
    (2, for { a <- genBound; d <- Gen.choose(1, 4) } yield Between(a, a + d)),
    (1, Gen.const(All)))

  private def hits(from: Int, to: Int, s: Spec): Boolean = s match {
    case NoClause => from <= 500 && 500 < to // NOW is between grid and 9999
    case AsOf(g) => from <= g && g < to
    case FromTo(a, b) => from < b && to > a
    case Between(a, b) => from <= b && to > a
    case All => true
  }

  private def clauseText(dim: String, s: Spec, style: Int): String = s match {
    case NoClause => ""
    case AsOf(g) =>
      val t = if (style % 2 == 0) s"TIMESTAMP '${lit(g)}'" else s"'${lit(g)}'"
      s"FOR $dim AS OF $t"
    case FromTo(a, b) => s"FOR $dim FROM '${lit(a)}' TO '${lit(b)}'"
    case Between(a, b) => s"FOR $dim BETWEEN '${lit(a)}' AND '${lit(b)}'"
    case All => if (style % 2 == 0) s"FOR $dim ALL" else s"FOR ALL $dim"
  }

  private def mangleCase(s: String, flip: Boolean): String =
    if (flip) s.map(c => if (c.isUpper) c.toLower else c) else s

  private final case class TemporalCase(sys: Spec, valid: Spec,
                                        sysFirst: Boolean, style: Int,
                                        flip: Boolean, distract: Boolean,
                                        cteShadow: Boolean)
  private val genTemporal: Gen[TemporalCase] = for {
    sys <- genSpec
    valid <- genSpec
    sysFirst <- Gen.oneOf(true, false)
    style <- Gen.choose(0, 3)
    flip <- Gen.oneOf(true, false)
    distract <- Gen.oneOf(true, false)
    cte <- Gen.frequency((9, Gen.const(false)), (1, Gen.const(true)))
  } yield TemporalCase(sys, valid, sysFirst, style, flip, distract, cte)

  test("fuzz: temporal clause spellings match the rectangle model (220 cases)") {
    forSamples(genTemporal, 220) { c =>
      if (c.cteShadow) {
        // a CTE named like the table shadows the rectangle relation
        val q = "WITH fuzz_t AS (SELECT 11L AS _id, 'cte' AS v) " +
          "SELECT _id, v FROM fuzz_t"
        val got = BitemporalSql.sql(spark, q, Map("fuzz_t" -> rects))
          .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
        assert(got == Seq((11L, "cte")))
      } else {
        val cSys = clauseText("SYSTEM_TIME", c.sys, c.style)
        val cVal = clauseText("APPLICATION_TIME", c.valid, c.style + 1)
        val both = (if (c.sysFirst) Seq(cSys, cVal) else Seq(cVal, cSys))
          .filter(_.nonEmpty)
        val clauses = mangleCase(both.mkString(" "), c.flip)
        val distractor =
          if (c.distract) ", 'fuzz_t FOR SYSTEM_TIME ALL' AS d" else ""
        val ws = if (c.style % 2 == 0) " " else "\n  "
        val q = s"SELECT _id, v$distractor${ws}FROM fuzz_t $clauses"
        val rows = BitemporalSql.sql(spark, q, Map("fuzz_t" -> rects)).collect()
        val got = rows.map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
        val want = fixture
          .filter(r => hits(r.sf, r.st, c.sys) && hits(r.vf, r.vt, c.valid))
          .map(r => (r.id, r.v)).sorted
        assert(got == want,
          s"\nquery: $q\ngot:  ${got.mkString(",")}\nwant: ${want.mkString(",")}")
        if (c.distract)
          rows.headOption.foreach(r =>
            assert(r.getString(2) == "fuzz_t FOR SYSTEM_TIME ALL"))
      }
    }
  }

  // ---- property 4: statement splitting round-trips -------------------

  private val genStatement: Gen[String] = for {
    core <- Gen.oneOf("SELECT 1 AS a", "SELECT 'x;y' AS s",
      "UPDATE t SET v = 'a;''b' WHERE _id = 1",
      "INSERT INTO t (_id, v) VALUES (1, ';')",
      "SELECT f(a, b) FROM t WHERE k IN (1, 2)")
    trap <- Gen.option(Gen.oneOf(
      "/* ; */", "-- tail ; comment\n", "'lit;'", "`q;id`"))
  } yield trap.fold(core)(t => s"$core $t") // NOT trimmed: a line
  // comment's terminating newline is load-bearing — stripping it would
  // (correctly!) make the comment swallow the rest of the batch

  private val genBatch: Gen[Seq[String]] =
    Gen.choose(1, 5).flatMap(Gen.listOfN(_, genStatement))

  test("fuzz: semicolon splitting is exact under masked traps (2x150 cases)") {
    forSamples(genBatch, 150) { stmts =>
      val joined = stmts.mkString(" ; ")
      val viaPg = graft.server.GraftPgWire.splitStatements(joined)
      val viaDml = BitemporalDml.splitTopLevel(joined, ';')
      assert(viaPg == stmts.map(_.trim), s"\npg split of: $joined")
      assert(viaDml == stmts.map(_.trim), s"\ndml split of: $joined")
    }
  }
}
