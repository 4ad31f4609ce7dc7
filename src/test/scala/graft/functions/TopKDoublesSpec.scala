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

  test("insert/merge invariants: sorted, bounded, duplicate-safe") {
    val agg = new TopKDoubles(4)
    // many inserts incl. duplicates and values below the running min
    val buf = (1 to 50).foldLeft(agg.zero)((b, i) =>
      agg.reduce(b, Double.box((i % 10).toDouble)))
    assert(buf == Seq(9.0, 9.0, 9.0, 9.0))
    // merge of two partials is a sorted bounded merge
    val a = Seq(8.0, 6.0, 2.0)
    val b = Seq(9.0, 7.0, 1.0)
    assert(agg.merge(a, b) == Seq(9.0, 8.0, 7.0, 6.0))
    assert(agg.merge(Seq.empty, b) == b)
    assert(agg.merge(b, Seq.empty) == b)
  }

  test("generic TopK works over any ordered type (strings)") {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val topS = new TopK[String, String](2,
      (s: String) => Option(s))(
      implicitly[Ordering[String]], ExpressionEncoder[Seq[String]]())
    val got = Seq("pear", null, "apple", "quince", "fig")
      .foldLeft(topS.zero)(topS.reduce)
    assert(got == Seq("quince", "pear"))
    // and through a real distributed aggregation
    val u = udaf(topS)
    val viaSpark = Seq((1, "pear"), (1, "apple"), (1, "quince"), (1, "fig"))
      .toDF("g", "s").groupBy($"g").agg(u($"s").as("t"))
      .collect()(0).getSeq[String](1)
    assert(viaSpark == Seq("quince", "pear"))
  }
}
