package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The codegen'd merge-count vs the built-in array_intersect, edge
  * cases + random sorted-distinct arrays. */
class SortedIntersectCountSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def count(a: Seq[Long], b: Seq[Long]): Int = {
    SortedIntersectCount.register(spark)
    Seq((a, b)).toDF("a", "b")
      .select(expr("sorted_intersect_count(a, b)")).collect()(0).getInt(0)
  }

  test("edge cases: empty, disjoint, identical, subset") {
    assert(count(Nil, Nil) == 0)
    assert(count(Seq(1L, 2L), Nil) == 0)
    assert(count(Seq(1L, 3L, 5L), Seq(2L, 4L, 6L)) == 0)
    assert(count(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)) == 3)
    assert(count(Seq(1L, 2L, 3L, 9L), Seq(2L, 9L)) == 2)
  }

  test("matches size(array_intersect) on random sorted-distinct arrays") {
    val rnd = new scala.util.Random(3)
    val cases = Seq.fill(50)((
      rnd.shuffle((0L to 40L).toList).take(rnd.nextInt(20)).sorted,
      rnd.shuffle((0L to 40L).toList).take(rnd.nextInt(20)).sorted))
    SortedIntersectCount.register(spark)
    val got = cases.toDF("a", "b")
      .select(expr("sorted_intersect_count(a, b)").as("fast"),
        size(array_intersect($"a", $"b")).as("ref"))
      .collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("rejects non-long-array inputs at analysis") {
    SortedIntersectCount.register(spark)
    assertThrows[org.apache.spark.sql.AnalysisException] {
      Seq((Seq("x"), Seq(1L))).toDF("a", "b")
        .select(expr("sorted_intersect_count(a, b)")).collect()
    }
  }
}
