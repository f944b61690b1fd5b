package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Index of the greatest element ≤ `value` in a BROADCAST ascending-
  * sorted long array (−1 when `value` precedes every element) — the
  * row-local binary-search primitive behind
  * [[graft.ops.IntervalJoin.pointLookup]]: one `Arrays.binarySearch`
  * per row inside whole-stage codegen, the task binary carrying only
  * the broadcast handle (the [[CappedBucketContains]] delivery
  * doctrine). */
object SortedLowerBoundImpl {
  def lowerBound(arr: Array[Long], v: Long): Int = {
    val i = java.util.Arrays.binarySearch(arr, v)
    if (i >= 0) i else -i - 2
  }
}

case class SortedLowerBound(bc: Broadcast[Array[Long]],
    value: Expression) extends UnaryExpression {

  override def child: Expression = value

  override def checkInputDataTypes(): TypeCheckResult =
    value.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a long value, got ${other.simpleString}")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_lower_bound"

  override def nullSafeEval(v: Any): Any =
    SortedLowerBoundImpl.lowerBound(bc.value, v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("lowerBoundBc", bc,
      classOf[Broadcast[_]].getName)
    val arr = ctx.addMutableState("long[]", "lowerBoundArr",
      v => s"$v = (long[]) $bcRef.value();")
    defineCodeGen(ctx, ev, v =>
      s"graft.expressions.SortedLowerBoundImpl.lowerBound($arr, $v)")
  }

  override protected def withNewChildInternal(newChild: Expression): SortedLowerBound =
    copy(value = newChild)
}

object SortedLowerBound {
  /** `bc` MUST hold an ascending-sorted array (binary-search contract). */
  def lowerBound(bc: Broadcast[Array[Long]], value: Column): Column =
    Bridge.column(SortedLowerBound(bc, Bridge.expression(value)))
}
