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
