package graft.ra

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Period-predicate algebra vs a naive Scala model over half-open
  * integer intervals. All sampled cases are evaluated in ONE Spark job
  * (a single literal DataFrame), not one job per case. */
class PeriodsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // exhaustive small-universe cases: all interval pairs over 0..5
  private val cases: Seq[(Int, Int, Int, Int)] = for {
    af <- 0 to 5; at <- (af + 1) to 6
    bf <- 0 to 5; bt <- (bf + 1) to 6
  } yield (af, at, bf, bt)

  private case class M(af: Int, at: Int, bf: Int, bt: Int) {
    def overlaps: Boolean = af < bt && bf < at
    def contains: Boolean = af <= bf && at >= bt
    def equalsP: Boolean = af == bf && at == bt
    def precedes: Boolean = at <= bf
    def succeeds: Boolean = af >= bt
    def immPrecedes: Boolean = at == bf
    def immSucceeds: Boolean = af == bt
  }

  test("all predicates match the model over the exhaustive 0..6 universe") {
    val a = Periods.period(col("af"), col("at"))
    val b = Periods.period(col("bf"), col("bt"))
    val df = cases.toDF("af", "at", "bf", "bt").select(
      $"af", $"at", $"bf", $"bt",
      Periods.overlaps(a, b).as("ov"), Periods.contains(a, b).as("ct"),
      Periods.equalsP(a, b).as("eq"), Periods.precedes(a, b).as("pr"),
      Periods.succeeds(a, b).as("su"),
      Periods.immediatelyPrecedes(a, b).as("ip"),
      Periods.immediatelySucceeds(a, b).as("is"))
    df.collect().foreach { r =>
      val m = M(r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      assert(r.getBoolean(4) == m.overlaps, s"overlaps $m")
      assert(r.getBoolean(5) == m.contains, s"contains $m")
      assert(r.getBoolean(6) == m.equalsP, s"equals $m")
      assert(r.getBoolean(7) == m.precedes, s"precedes $m")
      assert(r.getBoolean(8) == m.succeeds, s"succeeds $m")
      assert(r.getBoolean(9) == m.immPrecedes, s"immPrecedes $m")
      assert(r.getBoolean(10) == m.immSucceeds, s"immSucceeds $m")
    }
  }

  test("algebraic relations hold (derived from the model, spot laws)") {
    cases.map { case (af, at, bf, bt) => M(af, at, bf, bt) }.foreach { m =>
      // precedes and succeeds are mutually exclusive with overlaps
      assert(!(m.precedes && m.overlaps))
      assert(!(m.succeeds && m.overlaps))
      // equals implies contains both ways; contains implies overlaps
      if (m.equalsP) assert(m.contains)
      if (m.contains) assert(m.overlaps)
      // immediately-precedes implies precedes
      if (m.immPrecedes) assert(m.precedes)
      if (m.immSucceeds) assert(m.succeeds)
      // trichotomy: exactly one of precedes / overlaps / succeeds
      assert(Seq(m.precedes, m.overlaps, m.succeeds).count(identity) == 1)
    }
  }

  test("containsTs: half-open [from, to)") {
    val df = Seq((0, 1, 3), (1, 1, 3), (2, 1, 3), (3, 1, 3), (4, 1, 3))
      .toDF("ts", "f", "t")
      .select($"ts", Periods.containsTs(
        Periods.period($"f", $"t"), $"ts").as("c"))
    val got = df.collect().map(r => r.getInt(0) -> r.getBoolean(1)).toMap
    assert(got == Map(0 -> false, 1 -> true, 2 -> true, 3 -> false, 4 -> false))
  }
}
