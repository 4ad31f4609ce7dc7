package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** heavyHitters must be EXACT (differential vs plain groupBy) whenever
  * the guarantee minCount ≥ N/sketchSize holds — including under heavy
  * skew and adversarial partitioning, which is where a sketch could
  * silently drop a qualifying key. */
class FrequencySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def exact(df: org.apache.spark.sql.DataFrame, min: Long) =
    df.groupBy($"word").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" >= min)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

  test("zipfian skew, many partitions: sketch-prefiltered == exact") {
    // ~zipf over 5000 keys, 200k rows; key w0 alone is ~10% of the mass
    val words = spark.range(200000).select(
      concat(lit("w"), floor(pow(rand(7), 8.0) * 5000).cast("long"))
        .as("word"))
      .repartition(37) // partition count ≠ key structure
      .localCheckpoint()
    val n = words.count()
    val sketchSize = 256
    val minCount = math.max(n / sketchSize, 1L) // guarantee boundary
    val got = Frequency.heavyHitters(words, "word", sketchSize, minCount)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val want = exact(words, minCount)
    assert(want.nonEmpty, "fixture produced no heavy hitters")
    assert(got == want, s"got ${got.size} vs want ${want.size}")
  }

  test("all-distinct keys: no false positives survive the verify pass") {
    val words = spark.range(5000)
      .select(concat(lit("u"), $"id").as("word")).localCheckpoint()
    val got = Frequency.heavyHitters(words, "word",
      sketchSize = 16, minCount = 2)
    assert(got.count() == 0)
  }

  test("null keys are ignored, not counted or crashed on") {
    val words = Seq(Some("a"), Some("a"), Some("a"), None, None)
      .toDF("word")
    val got = Frequency.heavyHitters(words, "word",
      sketchSize = 4, minCount = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("a", 3L)))
  }

  test("keys beyond writeUTF's 64KB limit survive sketch serialization") {
    // regression guard: the aggregate serializer is length-prefixed raw
    // UTF-8, not writeUTF (which throws past 65,535 encoded bytes)
    val big = "x" * 70000
    val words = (Seq.fill(5)(big) ++ Seq("small")).toDF("word")
      .repartition(3) // forces partial-buffer serialize + merge
    val got = Frequency.heavyHitters(words, "word",
      sketchSize = 4, minCount = 5)
      .collect().map(r => (r.getString(0).length, r.getLong(1))).toSet
    assert(got == Set((70000, 5L)))
  }

  test("misra_gries type errors surface at analysis, not mid-job") {
    graft.functions.MisraGries.register(spark)
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(3).select(
        org.apache.spark.sql.functions.call_function("misra_gries",
          $"id", org.apache.spark.sql.functions.lit(4))).collect()
    }
    assert(e1.getMessage.contains("STRING"), e1.getMessage)
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(3).select(
        org.apache.spark.sql.functions.call_function("misra_gries",
          $"id".cast("string"), $"id".cast("int"))).collect()
    }
    assert(e2.getMessage.contains("INT literal"), e2.getMessage)
  }

  test("plan shape: native aggregate, no encoder round-trip, no distinct") {
    // the r7 rewrite claim, asserted mechanically: the candidate pass
    // is a TypedImperativeAggregate — data rows stay in Tungsten format
    // end to end (no Deserialize/SerializeFromObject), and no
    // candidate-distinct exchange exists (the only shuffled candidate
    // data is sketch-sized aggregate partials)
    val words = spark.range(2000)
      .select(concat(lit("w"), $"id" % 10).as("word")).localCheckpoint()
    val hh = Frequency.heavyHitters(words, "word",
      sketchSize = 16, minCount = 10)
    hh.collect()
    val plan = hh.queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject") &&
      !plan.contains("SerializeFromObject") &&
      !plan.contains("MapPartitions"),
      s"encoder round-trip in plan:\n$plan")
    assert(plan.contains("misra_gries"), s"native aggregate missing:\n$plan")
  }
}
