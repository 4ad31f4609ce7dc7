package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `sorted_last_leq(arr, key)`: 1-based index of the LAST element of
  * `arr` (an array of structs sorted ascending by their first field, a
  * long) whose first field is `<= key`; 0 when no element qualifies.
  *
  * A native Catalyst expression with codegen — an O(log n) binary search
  * per row, used by the keyless as-of join to probe a broadcast sorted
  * right side. A higher-order-function scan (`aggregate`/`filter`) would
  * be O(n) per row; a join would shuffle. This is the (b)-tier extension
  * point of the build rules: custom Expression before custom operator.
  */
case class SortedLastLeq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def prettyName: String = "sorted_last_leq"

  private lazy val numFields: Int = left.dataType match {
    case ArrayType(s: StructType, _) => s.size
    case _ => 0
  }

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(s: StructType, _)
      if s.nonEmpty && s.head.dataType == LongType =>
      if (right.dataType == LongType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"key must be LONG, got ${right.dataType.simpleString}")
    case other => TypeCheckResult.TypeCheckFailure(
      "arr must be ARRAY<STRUCT<BIGINT, ...>> sorted by the first field, " +
        s"got ${other.simpleString}")
  }

  override protected def nullSafeEval(arr: Any, key: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val k = key.asInstanceOf[Long]
    var lo = 0
    var hi = a.numElements() - 1
    var res = 0
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (a.getStruct(mid, numFields).getLong(0) <= k) { res = mid + 1; lo = mid + 1 }
      else hi = mid - 1
    }
    res
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, key) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      val res = ctx.freshName("res")
      s"""
         |int $lo = 0;
         |int $hi = $arr.numElements() - 1;
         |int $res = 0;
         |while ($lo <= $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($arr.getStruct($mid, $numFields).getLong(0) <= $key) {
         |    $res = $mid + 1; $lo = $mid + 1;
         |  } else { $hi = $mid - 1; }
         |}
         |${ev.value} = $res;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLastLeq =
    copy(left = newLeft, right = newRight)
}

object SortedLastLeq {
  /** Idempotently register `sorted_last_leq` in the session's function
    * registry so it is reachable from the Column API via `expr(...)`. */
  def register(spark: SparkSession): Unit = {
    val id = FunctionIdentifier("sorted_last_leq")
    if (!spark.sessionState.functionRegistry.functionExists(id)) {
      spark.sessionState.functionRegistry.registerFunction(
        id,
        new ExpressionInfo(classOf[SortedLastLeq].getName, "sorted_last_leq"),
        (exprs: Seq[Expression]) => SortedLastLeq(exprs.head, exprs(1)))
    }
  }
}
