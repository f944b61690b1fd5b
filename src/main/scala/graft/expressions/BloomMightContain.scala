package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native codegen'd bloom-membership test over a LONG key: the row-level
  * half of [[graft.ops.Bloom]]'s semi-join pre-filter. The fitted
  * [[BloomFilter]] (built by `Dataset.stat.bloomFilter`, Spark's public
  * treeAggregate sketch) rides along as an expression argument —
  * `addReferenceObj` ships it to executors inside the generated class, so
  * the per-row test is ONE virtual call inside whole-stage codegen, never
  * a UDF. False positives pass (by contract — the exact join behind the
  * filter removes them); false negatives cannot occur, so the pre-filter
  * is semantically invisible. */
case class BloomMightContainExpr(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a long key, got ${child.dataType.simpleString}")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
}

object BloomMightContainExpr {
  def mightContain(key: Column, bloom: BloomFilter): Column =
    Bridge.column(BloomMightContainExpr(Bridge.expression(key), bloom))
}
