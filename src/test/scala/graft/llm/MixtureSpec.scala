package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Training-mix operators: Hamilton apportionment, exact-count mixture
  * sampling, per-domain quantile gates. */
class MixtureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("apportion: quotas sum to total, leftover goes to largest remainders") {
    val q = Mixture.apportion(
      Map("en" -> 0.5, "es" -> 0.3125, "de" -> 0.1875), 97L)
    // exact quotas 48.5 / 30.3125 / 18.1875 → floors 48/30/18, one
    // leftover unit → largest remainder (.5, en)
    assert(q == Map("en" -> 49L, "es" -> 30L, "de" -> 18L), q)
    assert(q.values.sum == 97L)
  }

  test("apportion: remainder ties break by domain name ascending") {
    // 3 domains at equal weight, total 4: exact 4/3 each, one leftover
    // after floors (1,1,1) → remainders all equal → 'a' wins
    val q = Mixture.apportion(Map("c" -> 1.0, "a" -> 1.0, "b" -> 1.0), 4L)
    assert(q == Map("a" -> 2L, "b" -> 1L, "c" -> 1L), q)
  }

  test("apportion: zero total and zero-weight domains") {
    assert(Mixture.apportion(Map("a" -> 1.0, "b" -> 2.0), 0L)
      .values.forall(_ == 0L))
    val q = Mixture.apportion(Map("a" -> 1.0, "b" -> 0.0), 10L)
    assert(q == Map("a" -> 10L, "b" -> 0L), q)
  }

  /** Independent exact-arithmetic Hamilton reference: BigInt floors and
    * remainders (no floating point anywhere), same documented tie rule
    * (largest remainder, ties by domain name ascending). */
  private def refApportion(weights: Map[String, Long], total: Long): Map[String, Long] = {
    val wsum = BigInt(weights.values.sum)
    val exact = weights.map { case (d, w) => d -> BigInt(total) * w }
    val base = exact.map { case (d, e) => d -> e / wsum }
    val rem = exact.map { case (d, e) => d -> e % wsum }
    val left = (BigInt(total) - base.values.sum).toInt
    val bumped = weights.keys.toSeq.sortBy(d => (-rem(d), d))
      .take(left).toSet
    base.map { case (d, b) => d -> (b.toLong + (if (bumped(d)) 1L else 0L)) }
  }

  test("apportion property: invariants on arbitrary positive weights (500)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      n <- Gen.choose(1, 12)
      ws <- Gen.listOfN(n, Gen.choose(0.0001, 1000.0))
      total <- Gen.choose(0L, 1000000L)
    } yield (ws.zipWithIndex.map { case (w, i) => s"d$i" -> w }.toMap, total)
    (0 until 500).foreach { i =>
      val (weights, total) = gen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val q = Mixture.apportion(weights, total)
      assert(q.keySet == weights.keySet, s"seed $i")
      assert(q.values.sum == total, s"seed $i: ${q.values.sum} != $total")
      assert(q.values.forall(_ >= 0), s"seed $i")
      // quota rule within double tolerance: |alloc - exact share| < 1+eps
      val wsum = weights.values.sum
      weights.foreach { case (d, w) =>
        val share = total * w / wsum
        assert(math.abs(q(d) - share) < 1.0 + 1e-6,
          s"seed $i: $d alloc ${q(d)} vs share $share")
      }
      // determinism
      assert(Mixture.apportion(weights, total) == q, s"seed $i")
    }
  }

  test("apportion property: exact match vs BigInt reference on integer " +
      "weights (500, remainder-ties excluded then covered by hand)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      n <- Gen.choose(1, 10)
      ws <- Gen.listOfN(n, Gen.choose(0L, 9999L))
      total <- Gen.choose(0L, 999999L)
    } yield (ws.zipWithIndex.map { case (w, i) => s"d$i" -> w }.toMap, total)
    var compared = 0
    (0 until 500).foreach { i =>
      val (iw, total) = gen.pureApply(Gen.Parameters.default, Seed(1000L + i))
      val weights = if (iw.values.sum == 0) iw + ("d0" -> 1L) else iw
      val wsum = BigInt(weights.values.sum)
      val rems = weights.map { case (d, w) => d -> (BigInt(total) * w % wsum) }
      // exact remainder ties at DIFFERENT magnitudes can order by double
      // rounding noise rather than by name — those cases are excluded
      // here (double vs exact arithmetic genuinely diverges on the tie
      // order) and pinned by the dyadic handcrafted cases below, where
      // the doubles tie exactly too
      val hasTie = rems.values.toSeq.distinct.size != rems.size
      if (!hasTie) {
        compared += 1
        val got = Mixture.apportion(
          weights.map { case (d, w) => d -> w.toDouble }, total)
        assert(got == refApportion(weights, total),
          s"seed $i: weights=$weights total=$total")
      }
      // zero-weight domains never receive a unit (exact remainder 0)
      weights.filter(_._2 == 0L).keys.foreach { d =>
        val got = Mixture.apportion(
          weights.map { case (dd, w) => dd -> w.toDouble }, total)
        assert(got(d) == 0L, s"seed $i: zero-weight $d got ${got(d)}")
      }
    }
    assert(compared >= 400, s"tie filter discarded too many cases: $compared")

    // remainder ties where the DOUBLES tie exactly too (dyadic
    // fractions): the name rule must decide, at every boundary position
    assert(Mixture.apportion(
      Map("b" -> 1.0, "a" -> 1.0, "d" -> 1.0, "c" -> 1.0), 6L) ==
      Map("a" -> 2L, "b" -> 2L, "c" -> 1L, "d" -> 1L))
    assert(Mixture.apportion(Map("x" -> 1.0, "y" -> 3.0), 2L) ==
      Map("x" -> 1L, "y" -> 1L)) // remainders .5/.5 → x by name
    assert(refApportion(Map("x" -> 1L, "y" -> 3L), 2L) ==
      Map("x" -> 1L, "y" -> 1L))
  }

  test("apportion: the Alabama paradox is Hamilton's, reproduced exactly") {
    // the classic: populations (6, 6, 2). At 10 seats c holds 2; at 11
    // seats the large remainders flip to a and b and c LOSES a seat —
    // largest-remainder genuinely violates house monotonicity, and the
    // implementation must reproduce the method faithfully rather than
    // smooth it over
    val w = Map("a" -> 6.0, "b" -> 6.0, "c" -> 2.0)
    assert(Mixture.apportion(w, 10L) == Map("a" -> 4L, "b" -> 4L, "c" -> 2L))
    assert(Mixture.apportion(w, 11L) == Map("a" -> 5L, "b" -> 5L, "c" -> 1L))
    assert(refApportion(Map("a" -> 6L, "b" -> 6L, "c" -> 2L), 10L) ==
      Map("a" -> 4L, "b" -> 4L, "c" -> 2L))
    assert(refApportion(Map("a" -> 6L, "b" -> 6L, "c" -> 2L), 11L) ==
      Map("a" -> 5L, "b" -> 5L, "c" -> 1L))
  }

  private val pop = (1L to 60L)
    .map(i => (i, if (i <= 40) "big" else if (i <= 55) "mid" else "tiny"))
    .toDF("id", "dom")

  test("mixtureSample: exact per-domain counts, reproducible membership") {
    val out = Mixture.mixtureSample(pop, "id", "dom",
      Map("big" -> 0.5, "mid" -> 0.25, "tiny" -> 0.25), 20L)
    val counts = out.groupBy("dom").count().as[(String, Long)]
      .collect().toMap
    assert(counts == Map("big" -> 10L, "mid" -> 5L, "tiny" -> 5L), counts)
    // determinism: same call, same membership
    val again = Mixture.mixtureSample(pop, "id", "dom",
      Map("big" -> 0.5, "mid" -> 0.25, "tiny" -> 0.25), 20L)
      .select("id").as[Long].collect().toSet
    assert(again == out.select("id").as[Long].collect().toSet)
  }

  test("mixtureSample: domain smaller than quota yields its whole population") {
    // tiny has 5 members; weight demands 20 of 40 from it
    val out = Mixture.mixtureSample(pop, "id", "dom",
      Map("big" -> 0.5, "tiny" -> 0.5), 40L, strict = false)
    val counts = out.groupBy("dom").count().as[(String, Long)]
      .collect().toMap
    assert(counts == Map("big" -> 20L, "tiny" -> 5L), counts)
    // 'mid' is absent from the weight map → dropped (strict=false)
    assert(!counts.contains("mid"))
  }

  test("mixtureSample strict: unlisted observed domain fails loudly") {
    // 'mid' and 'tiny' exist in the data but not the weight map — the
    // default must name them instead of silently shrinking the mix
    val e = intercept[IllegalArgumentException] {
      Mixture.mixtureSample(pop, "id", "dom", Map("big" -> 1.0), 10L)
    }
    assert(e.getMessage.contains("mid") && e.getMessage.contains("tiny"),
      e.getMessage)
    assert(e.getMessage.contains("strict=false"), e.getMessage)
  }

  test("mixtureSample strict: high-cardinality offender list is bounded") {
    // a misconfigured domain column (e.g. the id column passed by
    // mistake) has ~one domain per row; the pre-pass must filter to
    // offenders executor-side and cap the collect instead of pulling
    // every distinct value to the driver
    import spark.implicits._
    val wide = spark.range(500)
      .select($"id", concat(lit("d"), $"id").as("dom"))
    val e = intercept[IllegalArgumentException] {
      Mixture.mixtureSample(wide.toDF(), "id", "dom", Map("d0" -> 1.0), 10L)
    }
    assert(e.getMessage.contains("truncated"), e.getMessage)
    // at most 20 offenders named (plus the truncation marker)
    assert(e.getMessage.split(", ").count(_.startsWith("d")) <= 21,
      e.getMessage)
  }

  test("mixtureSample plan: quota side broadcasts, no cartesian") {
    val p = Mixture.mixtureSample(pop, "id", "dom",
        Map("big" -> 1.0), 5L, strict = false)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("quantileKeep: keeps scores at or above the exact per-domain quantile") {
    val df = Seq(
      ("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0), ("a", 4L, 4.0),
      ("a", 5L, 5.0),
      ("b", 6L, 10.0), ("b", 7L, 20.0), ("b", 8L, 30.0))
      .toDF("dom", "id", "score")
    // a: 0.5-quantile of {1..5} = 3 (exact element) → keep 3,4,5
    // b: 0.5-quantile of {10,20,30} = 20 → keep 20,30
    val kept = Mixture.quantileKeep(df, "dom", "score", 0.5)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L, 5L, 7L, 8L), kept)
  }

  test("quantileKeep: score column names needing backticks work") {
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0))
      .toDF("dom", "id", "my score.v2")
    val kept = Mixture.quantileKeep(df, "dom", "my score.v2", 0.5)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L), kept)
  }

  test("quantileKeep: interpolated threshold excludes the lower neighbor") {
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0),
      ("a", 4L, 4.0)).toDF("dom", "id", "score")
    // 0.5-quantile of {1,2,3,4} interpolates to 2.5 → keep 3,4
    val kept = Mixture.quantileKeep(df, "dom", "score", 0.5)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L), kept)
  }
}
