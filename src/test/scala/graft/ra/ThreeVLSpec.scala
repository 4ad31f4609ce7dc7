package graft.ra

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** SQL three-valued-logic truth tables (the reference claims full 3VL,
  * /root/reference/README.adoc:13): Spark Column logic vs the Kleene
  * tables, exhaustively over {TRUE, FALSE, NULL}². */
class ThreeVLSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vals: Seq[Option[Boolean]] = Seq(Some(true), Some(false), None)

  private def kleeneAnd(a: Option[Boolean], b: Option[Boolean]) = (a, b) match {
    case (Some(false), _) | (_, Some(false)) => Some(false)
    case (Some(true), Some(true)) => Some(true)
    case _ => None
  }
  private def kleeneOr(a: Option[Boolean], b: Option[Boolean]) = (a, b) match {
    case (Some(true), _) | (_, Some(true)) => Some(true)
    case (Some(false), Some(false)) => Some(false)
    case _ => None
  }

  test("AND/OR/NOT match the Kleene truth tables") {
    val pairs = for (a <- vals; b <- vals) yield (a, b)
    val df = pairs.toDF("a", "b")
      .select($"a", $"b", ($"a" && $"b").as("and"), ($"a" || $"b").as("or"),
        (!$"a").as("not"))
    df.collect().foreach { r =>
      val a = Option(r.get(0)).map(_.asInstanceOf[Boolean])
      val b = Option(r.get(1)).map(_.asInstanceOf[Boolean])
      assert(Option(r.get(2)) == kleeneAnd(a, b), s"AND($a,$b)")
      assert(Option(r.get(3)) == kleeneOr(a, b), s"OR($a,$b)")
      assert(Option(r.get(4)) == a.map(!_), s"NOT($a)")
    }
  }

  test("IS TRUE / IS FALSE / null-safe equality") {
    val df = vals.toDF("a").select($"a",
      ($"a" <=> lit(true)).as("is_true"),
      ($"a" <=> lit(false)).as("is_false"),
      ($"a" <=> lit(null).cast("boolean")).as("is_unknown"))
    val got = df.collect().map(r => (Option(r.get(0)),
      r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toSet
    assert(got == Set(
      (Some(true), true, false, false),
      (Some(false), false, true, false),
      (None, false, false, true)))
  }

  test("comparison with NULL is UNKNOWN, and filter drops UNKNOWN") {
    val df = Seq[Option[Int]](Some(1), None).toDF("x")
    assert(df.filter($"x" > 0).count() == 1)
    assert(df.filter(!($"x" > 0)).count() == 0)
    assert(df.filter(($"x" > 0).isNull).count() == 1)
  }
}
