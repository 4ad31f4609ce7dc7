package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** vec_dot vs the aggregate/zip_with left fold it replaces — bit-exact
  * equality on random vectors, plus the NULL semantics. */
class VecDotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fold(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("bit-exact vs the left fold on random vectors") {
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(60)((
      Seq.fill(64)(rnd.nextDouble() * 2 - 1),
      Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    VecDot.register(spark)
    val got = rows.toDF("a", "b")
      .select(call_function("vec_dot", $"a", $"b").as("fast"),
        fold($"a", $"b").as("ref"))
      .collect()
    // exact bit equality, not tolerance — same accumulation order
    got.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("NULL on length mismatch and on null elements (fold semantics)") {
    VecDot.register(spark)
    val df = Seq(
      (Seq(Some(1.0), Some(2.0)), Seq(Some(3.0))),             // length mismatch
      (Seq(Some(1.0), None), Seq(Some(3.0), Some(4.0))),       // null element
      (Seq(Some(1.0), Some(2.0)), Seq(Some(3.0), Some(4.0))))  // clean
      .toDF("a", "b")
      .select(call_function("vec_dot", $"a", $"b").as("d"))
      .collect()
    assert(df(0).isNullAt(0))
    assert(df(1).isNullAt(0))
    assert(df(2).getDouble(0) == 11.0)
  }
}
