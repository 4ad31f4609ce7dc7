package graft.ra

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Differential fuzzing (a miniature sqllogictest): random relational
  * plans over small NULL-ful bag relations, executed BOTH through the RA
  * combinators on Spark and by an independent naive in-memory evaluator
  * with explicit 3VL and bag semantics. Multisets must agree exactly.
  */
class FuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- model: a relation is (columns, bag of rows of Option[Int]) ----
  private type Row = Vector[Option[Int]]
  private case class Rel(cols: Vector[String], rows: Seq[Row])

  private val t1 = Rel(Vector("a", "b"), Seq(
    Vector(Some(1), Some(10)), Vector(Some(1), Some(10)),
    Vector(Some(2), None), Vector(None, Some(30)),
    Vector(Some(3), Some(10)), Vector(None, None)))
  private val t2 = Rel(Vector("a", "c"), Seq(
    Vector(Some(1), Some(100)), Vector(Some(2), Some(200)),
    Vector(Some(2), Some(200)), Vector(None, Some(300)),
    Vector(Some(4), None)))

  // ---- plan AST -------------------------------------------------------
  private sealed trait Plan
  private case class Base(t: Int) extends Plan
  private case class Filt(p: Plan, col: Int, op: Int, k: Int) extends Plan
  private case class Proj(p: Plan, keep: Vector[Int]) extends Plan
  private case class Dist(p: Plan) extends Plan
  private case class Uni(p1: Plan, p2: Plan) extends Plan
  private case class JoinA(p1: Plan, p2: Plan) extends Plan // equi on "a"
  private case class SemiA(p1: Plan, p2: Plan, anti: Boolean) extends Plan // on "a"
  private case class AggA(p: Plan, valCol: Int) extends Plan // group by "a"
  private case class BagOp(p1: Plan, p2: Plan, inter: Boolean) extends Plan // ALL set ops

  private def colsOf(p: Plan): Vector[String] = p match {
    case Base(0) => t1.cols
    case Base(_) => t2.cols
    case Filt(q, _, _, _) => colsOf(q)
    case Proj(q, keep) => keep.map(colsOf(q))
    case Dist(q) => colsOf(q)
    case Uni(q, _) => colsOf(q)
    case JoinA(l, r) =>
      colsOf(l) ++ colsOf(r).filterNot(_ == "a").map("r_" + _)
    case SemiA(l, _, _) => colsOf(l)
    case AggA(_, _) => Vector("a", "cnt", "tot")
    case BagOp(q, _, _) => colsOf(q)
  }

  // ---- naive evaluator (independent of Spark) -------------------------
  private def cmp3vl(v: Option[Int], op: Int, k: Int): Option[Boolean] =
    v.map(x => op match {
      case 0 => x < k
      case 1 => x >= k
      case 2 => x == k
    })

  private def evalNaive(p: Plan): Rel = p match {
    case Base(0) => t1
    case Base(_) => t2
    case Filt(q, c, op, k) =>
      val r = evalNaive(q)
      val ci = c % r.cols.length
      r.copy(rows = r.rows.filter(row => cmp3vl(row(ci), op, k).contains(true)))
    case Proj(q, keep) =>
      val r = evalNaive(q)
      Rel(keep.map(r.cols), r.rows.map(row => keep.map(row)))
    case Dist(q) =>
      val r = evalNaive(q)
      r.copy(rows = r.rows.distinct) // Vector equality: None == None
    case Uni(q1, q2) =>
      val (r1, r2) = (evalNaive(q1), evalNaive(q2))
      r1.copy(rows = r1.rows ++ r2.rows)
    case JoinA(l, r) =>
      val (rl, rr) = (evalNaive(l), evalNaive(r))
      val (li, ri) = (rl.cols.indexOf("a"), rr.cols.indexOf("a"))
      val rows = for {
        x <- rl.rows; y <- rr.rows
        if x(li).isDefined && x(li) == y(ri) // NULL never joins
      } yield x ++ y.zipWithIndex.collect { case (v, i) if i != ri => v }
      Rel(colsOf(p), rows)
    case SemiA(l, r, anti) =>
      val (rl, rr) = (evalNaive(l), evalNaive(r))
      val (li, ri) = (rl.cols.indexOf("a"), rr.cols.indexOf("a"))
      val rKeys = rr.rows.flatMap(_(ri)).toSet // NULL never matches
      rl.copy(rows = rl.rows.filter(row =>
        row(li).exists(rKeys.contains) != anti &&
          (anti || row(li).isDefined)))
    case BagOp(q1, q2, inter) =>
      // bag semantics, NULL-safe row equality (None == None):
      // INTERSECT ALL keeps min(n1, n2) copies, EXCEPT ALL max(0, n1-n2)
      val (r1, r2) = (evalNaive(q1), evalNaive(q2))
      val c2 = r2.rows.groupBy(identity).view.mapValues(_.size).toMap
      val seen = scala.collection.mutable.Map.empty[Row, Int]
      r1.copy(rows = r1.rows.filter { row =>
        val u = seen.getOrElse(row, 0)
        seen(row) = u + 1
        if (inter) u < c2.getOrElse(row, 0) else u >= c2.getOrElse(row, 0)
      })
    case AggA(q, vc) =>
      val r = evalNaive(q)
      val (ai, vi) = (r.cols.indexOf("a"), vc % r.cols.length)
      // SQL GROUP BY: NULL keys group together; count/sum skip NULLs,
      // sum of all-NULL group is NULL
      Rel(Vector("a", "cnt", "tot"),
        r.rows.groupBy(_(ai)).map { case (k, rows) =>
          val vs = rows.flatMap(_(vi))
          Vector(k, Some(rows.size),
            if (vs.isEmpty) None else Some(vs.sum))
        }.toSeq)
  }

  // ---- Spark evaluator via RA combinators -----------------------------
  private def toDf(r: Rel): DataFrame =
    r.rows.map(row => (row(0), row(1))).toDF(r.cols: _*)

  private def evalSpark(p: Plan): DataFrame = p match {
    case Base(0) => toDf(t1)
    case Base(_) => toDf(t2)
    case Filt(q, c, op, k) =>
      val df = evalSpark(q)
      val cc = col(df.columns(c % df.columns.length))
      RA.select(df, op match {
        case 0 => cc < k
        case 1 => cc >= k
        case 2 => cc === k
      })
    case Proj(q, keep) =>
      val df = evalSpark(q)
      RA.project(df, keep.map(i => col(df.columns(i))): _*)
    case Dist(q) => RA.distinct(evalSpark(q))
    case Uni(q1, q2) => RA.unionAll(evalSpark(q1), evalSpark(q2))
    case JoinA(l, r) =>
      val dl = evalSpark(l)
      val dr0 = evalSpark(r)
      val dr = dr0.columns.filterNot(_ == "a")
        .foldLeft(dr0)((d, c) => d.withColumnRenamed(c, "r_" + c))
      RA.join(dl, dr.withColumnRenamed("a", "_ra"), dl("a") === col("_ra"))
        .drop("_ra")
    case SemiA(l, r, anti) =>
      val dl = evalSpark(l)
      val dr = evalSpark(r).select(col("a").as("_ra"))
      RA.join(dl, dr, dl("a") === col("_ra"),
        if (anti) "left_anti" else "left_semi")
    case BagOp(q1, q2, inter) =>
      if (inter) evalSpark(q1).intersectAll(evalSpark(q2))
      else evalSpark(q1).exceptAll(evalSpark(q2))
    case AggA(q, vc) =>
      val df = evalSpark(q)
      val v = col(df.columns(vc % df.columns.length))
      RA.groupBy(df, Seq(col("a")),
        Seq(count(lit(1)).cast("int").as("cnt"), sum(v).cast("int").as("tot")))
  }

  // ---- generator ------------------------------------------------------
  private def genPlan(rnd: scala.util.Random, depth: Int): Plan = {
    if (depth == 0) Base(rnd.nextInt(2))
    else rnd.nextInt(9) match {
      case 8 =>
        // second operand = a filtered variant of the first: identical
        // schema, overlapping-but-different bag -> non-trivial ALL ops
        val q = genPlan(rnd, depth - 1)
        BagOp(q, Filt(q, rnd.nextInt(4), rnd.nextInt(3), rnd.nextInt(5)),
          rnd.nextBoolean())
      case 6 =>
        val l = genPlan(rnd, depth - 1)
        val r = genPlan(rnd, depth - 1)
        if (colsOf(l).contains("a") && colsOf(r).contains("a"))
          SemiA(l, r, rnd.nextBoolean())
        else Dist(l)
      case 7 =>
        val q = genPlan(rnd, depth - 1)
        if (colsOf(q).contains("a")) AggA(q, rnd.nextInt(4)) else Dist(q)
      case 0 => Base(rnd.nextInt(2))
      case 1 =>
        val q = genPlan(rnd, depth - 1)
        Filt(q, rnd.nextInt(4), rnd.nextInt(3), rnd.nextInt(5))
      case 2 =>
        val q = genPlan(rnd, depth - 1)
        val n = colsOf(q).length
        val keep = Vector.fill(1 + rnd.nextInt(n))(rnd.nextInt(n)).distinct
        Proj(q, keep)
      case 3 => Dist(genPlan(rnd, depth - 1))
      case 4 =>
        val q = genPlan(rnd, depth - 1)
        Uni(q, q) // same-shape self union keeps schemas aligned
      case 5 =>
        val l = genPlan(rnd, depth - 1)
        val r = genPlan(rnd, depth - 1)
        if (colsOf(l).contains("a") && colsOf(r).contains("a") &&
          !colsOf(l).exists(c => colsOf(r).contains("r_" + c)))
          JoinA(l, r)
        else Filt(l, 0, 1, 2)
    }
  }

  private def multiset(rows: Seq[Seq[Any]]): Map[Seq[Any], Int] =
    rows.groupBy(identity).view.mapValues(_.size).toMap

  test("50 random plans: Spark via RA == naive evaluator (bag + 3VL)") {
    val rnd = new scala.util.Random(1234)
    var nonEmpty = 0
    (1 to 50).foreach { i =>
      val plan = genPlan(rnd, 3)
      val naive = evalNaive(plan)
      val sparkRows = evalSpark(plan).collect()
        .map(_.toSeq.map(Option(_).map(_.asInstanceOf[Int]))).toSeq
      val naiveRows = naive.rows.map(_.toSeq)
      if (naiveRows.nonEmpty) nonEmpty += 1
      assert(multiset(sparkRows.map(_.toSeq)) == multiset(naiveRows.map(_.toSeq)),
        s"case $i plan=$plan")
    }
    assert(nonEmpty > 20, s"generator degenerate: only $nonEmpty non-empty")
  }
}
