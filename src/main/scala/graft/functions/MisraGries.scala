package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `misra_gries(key, sketchSize)` — heavy-hitter CANDIDATE keys as an
  * array, via a bounded Misra-Gries summary run as a NATIVE Spark
  * aggregate (TypedImperativeAggregate): per-partition partial sketches
  * with map-side combine, sketch-sized partials on the wire, one merged
  * sketch at the reducer. Replaces the Dataset-encoder `mapPartitions`
  * + `distinct` formulation — no object serialization round-trip for
  * the data rows and no candidate-distinct exchange; the only shuffle
  * carries ≤ sketchSize (key, count) pairs per partition.
  *
  * Guarantee (the one [[graft.operators.Frequency.heavyHitters]]
  * builds its exactness on): a classic MG summary of size k over N
  * rows undercounts any key by at most N/k, and the COUNT-OFFSET merge
  * (sum counts, subtract the (k+1)-th largest, drop ≤ 0 — Agarwal et
  * al., "Mergeable Summaries", PODS'12) preserves exactly that bound
  * for the merged stream. So every key with true count ≥ N/sketchSize
  * survives to the final sketch with a positive count and is emitted
  * as a candidate.
  */
case class MisraGries(
    child: Expression, sketchSizeExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  private lazy val sketchSize: Int = {
    require(sketchSizeExpr.foldable && sketchSizeExpr.dataType == IntegerType,
      s"misra_gries: sketchSize must be an INT literal, got $sketchSizeExpr")
    val v = sketchSizeExpr.eval()
    require(v != null, "misra_gries: sketchSize must not be NULL")
    v.asInstanceOf[Int]
  }

  override def prettyName: String = "misra_gries"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child, sketchSizeExpr)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType != StringType)
      TypeCheckFailure(
        s"misra_gries: key must be STRING, got ${child.dataType.simpleString}")
    else if (!(sketchSizeExpr.foldable &&
        sketchSizeExpr.dataType == IntegerType))
      TypeCheckFailure("misra_gries: sketchSize must be an INT literal")
    else TypeCheckSuccess
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[UTF8String].toString
      buf.get(k) match {
        case Some(c) => buf(k) = c + 1
        case None if buf.size < sketchSize => buf(k) = 1L
        case None => // classic decrement-all step
          buf.mapValuesInPlace((_, c) => c - 1L)
          buf.filterInPlace((_, c) => c > 0L)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long])
      : mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) =>
      buf(k) = buf.getOrElse(k, 0L) + c
    }
    if (buf.size > sketchSize) {
      // subtract the (sketchSize+1)-th largest count from everything —
      // the mergeable-summaries offset step; at least one entry drops
      val d = buf.values.toArray.sortBy(-_).apply(sketchSize)
      buf.mapValuesInPlace((_, c) => c - d)
      buf.filterInPlace((_, c) => c > 0L)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keysIterator.toArray.sorted.map(UTF8String.fromString(_): Any))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      // length-prefixed raw UTF-8 — writeUTF caps at 65,535 encoded
      // bytes and would crash on long-text keys
      val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(c)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val klen = in.readInt()
      val kb = new Array[Byte](klen); in.readFully(kb)
      buf(new String(kb, java.nio.charset.StandardCharsets.UTF_8)) =
        in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren(0), sketchSizeExpr = newChildren(1))
}

object MisraGries {
  /** Idempotently register `misra_gries` so it is reachable via
    * `call_function` / SQL. */
  def register(spark: SparkSession): Unit = {
    val id = FunctionIdentifier("misra_gries")
    if (!spark.sessionState.functionRegistry.functionExists(id)) {
      spark.sessionState.functionRegistry.registerFunction(
        id,
        new ExpressionInfo(classOf[MisraGries].getName, "misra_gries"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 2,
            s"misra_gries takes (key, sketchSize), got ${exprs.length} args")
          MisraGries(exprs.head, exprs(1))
        })
    }
  }
}
