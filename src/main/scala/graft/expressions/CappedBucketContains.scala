package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType}

/** Membership test of `value` in the ASCENDING-sorted long set
  * `sets[band]`, carried as a BROADCAST of all per-band sets.
  *
  * This is the cap-recovery skip-list probe for the dedup joins
  * ([[graft.dedup.Dedup.minHashCandidates]] / `simHashNearDups`): the
  * capped (band, bucket) exclusion set rides the owning-band filter. As
  * literal-array `array_contains` (the round-9 form) that was an
  * O(|capped|) linear scan per candidate row per band AND up to ~0.5 MB
  * of literal re-serialized into every task binary; here the task binary
  * carries only the broadcast handle (executors fetch the arrays once)
  * and each probe is one `Arrays.binarySearch` — O(log n), zero
  * allocation, inside whole-stage codegen. */
object CappedBucketContainsImpl {
  def contains(sets: Array[Array[Long]], band: Int, value: Long): Boolean =
    java.util.Arrays.binarySearch(sets(band), value) >= 0
}

case class CappedBucketContains(bc: Broadcast[Array[Array[Long]]],
    band: Expression, value: Expression) extends BinaryExpression {

  override def left: Expression = band
  override def right: Expression = value

  override def checkInputDataTypes(): TypeCheckResult =
    (band.dataType, value.dataType) match {
      case (IntegerType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (b, v) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (int band, long value), got ${b.simpleString} / ${v.simpleString}")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_capped_bucket_contains"

  override def nullSafeEval(b: Any, v: Any): Any =
    CappedBucketContainsImpl.contains(bc.value,
      b.asInstanceOf[Int], v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("cappedBc", bc,
      classOf[Broadcast[_]].getName)
    // unwrap the broadcast ONCE per task, not per row
    val sets = ctx.addMutableState("long[][]", "cappedSets",
      v => s"$v = (long[][]) $bcRef.value();")
    defineCodeGen(ctx, ev, (b, v) =>
      s"graft.expressions.CappedBucketContainsImpl.contains($sets, $b, $v)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CappedBucketContains =
    copy(band = newLeft, value = newRight)
}

object CappedBucketContains {
  /** `sets` MUST hold ascending-sorted arrays (binary-search contract). */
  def contains(bc: Broadcast[Array[Array[Long]]], band: Column,
      value: Column): Column =
    Bridge.column(CappedBucketContains(bc,
      Bridge.expression(band), Bridge.expression(value)))
}
