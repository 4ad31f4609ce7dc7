package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** As-of join vs a naive per-row Scala oracle over random event streams,
  * plus the NULL-payload regression: a matching right row whose payload
  * VALUE is NULL must surface that NULL, not an older non-null value. */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def forSamples[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  // (key, ts) left probes; (key, ts, value) right updates with UNIQUE ts
  // per key (ties between right rows are documented as undefined)
  private val genCase: Gen[(List[(Int, Int)], List[(Int, Int, String)])] = for {
    nl <- Gen.choose(1, 15)
    left <- Gen.listOfN(nl, Gen.zip(Gen.choose(1, 3), Gen.choose(0, 20)))
    nr <- Gen.choose(1, 10)
    rightRaw <- Gen.listOfN(nr, Gen.zip(Gen.choose(1, 3), Gen.choose(0, 20)))
  } yield {
    val right = rightRaw.distinct.map { case (k, t) => (k, t, s"v$k-$t") }
    (left, right)
  }

  test("keyed as-of matches the naive latest-right-row oracle") {
    forSamples(genCase, 12) { case (left, right) =>
      val l = left.toDF("k", "ts")
      val r = right.toDF("rk", "rts", "v")
      val got = AsOfJoin.asOf(l, r, "ts", "rts", Seq("v"),
          leftKeys = Seq("k"), rightKeys = Seq("rk"))
        .collect().map(x => (x.getInt(0), x.getInt(1), Option(x.getString(2))))
        .groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).toList).toMap
      left.distinct.foreach { case (k, t) =>
        val expect = right.filter(r => r._1 == k && r._2 <= t)
          .sortBy(_._2).lastOption.map(_._3)
        val vs = got((k, t))
        assert(vs.forall(_ == expect),
          s"probe ($k,$t): got $vs expected $expect; right=$right")
      }
    }
  }

  test("NULL right TIMESTAMP never matches (ts <= probe is UNKNOWN)") {
    // a NULL _t sorts first in the window; without the right-side
    // isNotNull filter its payload would fill EVERY probe
    val l = Seq((1, 10), (1, 20)).toDF("k", "ts")
    val r = Seq((1, Option.empty[Int], "ghost"), (1, Some(15), "real"))
      .toDF("rk", "rts", "v")
    val got = AsOfJoin.asOf(l, r, "ts", "rts", Seq("v"),
        leftKeys = Seq("k"), rightKeys = Seq("rk"))
      .collect().map(x => x.getInt(1) -> Option(x.getString(2))).toMap
    assert(got == Map(10 -> None, 20 -> Some("real")))
  }

  test("NULL payload on the matching right row is preserved (not skipped)") {
    val l = Seq((1, 10)).toDF("k", "ts")
    val r = Seq((1, 1, Some("old")), (1, 5, None)).toDF("rk", "rts", "v")
    val out = AsOfJoin.asOf(l, r, "ts", "rts", Seq("v"),
      leftKeys = Seq("k"), rightKeys = Seq("rk")).collect()
    assert(out.length == 1)
    // right row at ts=5 matches; its v is genuinely NULL -> output NULL
    assert(out(0).isNullAt(out(0).fieldIndex("v")))
  }

  test("no right row yet -> NULL payload; tie right.ts == left.ts visible") {
    val l = Seq((1, 0), (1, 5)).toDF("k", "ts")
    val r = Seq((1, 5, "x")).toDF("rk", "rts", "v")
    val out = AsOfJoin.asOf(l, r, "ts", "rts", Seq("v"),
        leftKeys = Seq("k"), rightKeys = Seq("rk"))
      .collect().map(x => (x.getInt(1), Option(x.getString(2)))).toSet
    assert(out == Set((0, None), (5, Some("x"))))
  }

  test("keyless as-of (broadcast binary-search path) matches the naive oracle") {
    forSamples(genCase, 12) { case (left0, right0) =>
      // drop keys: one global stream, unique right ts
      val left = left0.map(_._2)
      val right = right0.map(r => (r._2, r._3)).distinctBy(_._1)
      val l = left.toDF("ts")
      val r = right.toDF("rts", "v")
      val got = AsOfJoin.asOf(l, r, "ts", "rts", Seq("v"))
        .collect().map(x => (x.getInt(0), Option(x.getString(1))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toList).toMap
      left.distinct.foreach { t =>
        val expect = right.filter(_._1 <= t).sortBy(_._1).lastOption.map(_._2)
        assert(got(t).forall(_ == expect),
          s"probe $t: got ${got(t)} expected $expect; right=$right")
      }
    }
  }

  test("keyless as-of: timestamps, NULL before first right row") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val l = Seq(ts("2020-01-01 00:00:00"), ts("2020-03-15 00:00:00"))
      .toDF("ts")
    val r = Seq((ts("2020-02-01 00:00:00"), 42)).toDF("rts", "v")
    val out = AsOfJoin.asOf(l, r, "ts", "rts", Seq("v"))
      .collect().map(x => (x.getTimestamp(0), Option(x.get(1)))).toSet
    assert(out == Set(
      (ts("2020-01-01 00:00:00"), None),
      (ts("2020-03-15 00:00:00"), Some(42))))
  }

  test("NULL keys never match (equi-join semantics), NULL-key probes still emit") {
    val l = Seq((Some(1), 10), (Option.empty[Int], 10)).toDF("k", "ts")
    val r = Seq((Option.empty[Int], 5, "nullkey"), (Some(1), 5, "one"))
      .toDF("rk", "rts", "v")
    val out = AsOfJoin.asOf(l, r, "ts", "rts", Seq("v"),
        leftKeys = Seq("k"), rightKeys = Seq("rk"))
      .collect().map(x => (Option(x.get(0)), Option(x.getString(2)))).toSet
    assert(out == Set((Some(1), Some("one")), (None, None)))
  }

  test("multiple payload columns come from the SAME right row") {
    val l = Seq((1, 10)).toDF("k", "ts")
    val r = Seq((1, 1, Some("a1"), Some("b1")), (1, 5, None, Some("b2")))
      .toDF("rk", "rts", "a", "b")
    val out = AsOfJoin.asOf(l, r, "ts", "rts", Seq("a", "b"),
      leftKeys = Seq("k"), rightKeys = Seq("rk")).collect()(0)
    // both values from the ts=5 row: a=NULL, b=b2 (never a1 mixed with b2)
    assert(out.isNullAt(out.fieldIndex("a")))
    assert(out.getString(out.fieldIndex("b")) == "b2")
  }
}
