package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Bounded top-k aggregator vs a naive sort on random grouped data. */
class TopKDoublesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("matches sort-and-take per group; skips NULLs; buffer stays bounded") {
    val rnd = new scala.util.Random(9)
    val rows = Seq.fill(300)((rnd.nextInt(4),
      if (rnd.nextInt(10) == 0) None else Some(rnd.nextDouble() * 100)))
    val top3 = udaf(new TopKDoubles(3))
    val got = rows.toDF("g", "v").groupBy($"g").agg(top3($"v").as("t"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val expected = rows.groupBy(_._1).map { case (g, vs) =>
      g -> vs.flatMap(_._2).sortBy(-_).take(3)
    }
    expected.foreach { case (g, e) => assert(got(g) == e, s"group $g") }
    // groups smaller than k return what exists
    val tiny = Seq((1, 5.0)).toDF("g", "v").groupBy($"g").agg(top3($"v"))
      .collect()(0).getSeq[Double](1)
    assert(tiny == Seq(5.0))
  }
}
