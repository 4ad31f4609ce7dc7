package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `sorted_intersect_count(a, b)`: the size of the intersection of two
  * SORTED, DISTINCT `ARRAY<BIGINT>` columns — a single merge pass,
  * O(|a| + |b|), zero allocation.
  *
  * This is the dedup-verification hot path: every near-dup candidate
  * pair pays one set-intersection for its exact Jaccard. The built-in
  * `size(array_intersect(a, b))` materializes an intermediate array and
  * a hash set per row; this expression replaces it with a primitive
  * long-merge in generated code, exactly as the reference's vectorized
  * engine would. Interpreted `nullSafeEval` keeps the expression usable
  * off the codegen path.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def prettyName: String = "sorted_intersect_count"

  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "both inputs must be ARRAY<BIGINT> (sorted ascending, distinct), " +
        s"got ${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override protected def nullSafeEval(a1: Any, a2: Any): Any = {
    val a = a1.asInstanceOf[ArrayData]
    val b = a2.asInstanceOf[ArrayData]
    var i = 0
    var j = 0
    var n = 0
    val na = a.numElements()
    val nb = b.numElements()
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $i = 0; int $j = 0; int $n = 0;
         |final int $na = $a.numElements();
         |final int $nb = $b.numElements();
         |while ($i < $na && $j < $nb) {
         |  final long $x = $a.getLong($i);
         |  final long $y = $b.getLong($j);
         |  if ($x == $y) { $n++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Idempotently register `sorted_intersect_count` in the session's
    * function registry (reachable from the Column API via `expr`). */
  def register(spark: SparkSession): Unit = {
    val id = FunctionIdentifier("sorted_intersect_count")
    if (!spark.sessionState.functionRegistry.functionExists(id)) {
      spark.sessionState.functionRegistry.registerFunction(
        id,
        new ExpressionInfo(classOf[SortedIntersectCount].getName,
          "sorted_intersect_count"),
        (exprs: Seq[Expression]) => SortedIntersectCount(exprs.head, exprs(1)))
    }
  }
}
