package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the vector dot product (SURVEY steering:
  * "a native Catalyst Expression (with doGenCode) beats a Scala UDF").
  *
  * The `zip_with` + `aggregate` higher-order formulation is CodegenFallback:
  * every pair comparison in an LSH/ANN join boxes 2×dim lambda variables and
  * allocates an intermediate array. This expression compiles to a tight
  * primitive loop over the two `ArrayData`s inside whole-stage codegen —
  * ~10× cheaper per pair, which is the difference between an ANN candidate
  * join being compute-bound or not at corpus scale.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** All `tables` random-hyperplane LSH bucket ids of a vector in ONE pass.
  *
  * The Column-level formulation (`Embeddings.lshBucket` per table) expands to
  * tables×nBits `when(dot(vec, plane_literal) >= 0, …)` branches — at 8×12×64
  * that is a ~6k-literal expression tree whose generated code blows past the
  * JIT inlining budget and re-evaluates the dim-checked cast per branch; it
  * benchmarked ~100× slower than the arithmetic it encodes. This expression
  * keeps the plane matrix as ONE flat `double[]` reference object and emits a
  * three-level primitive loop (table → bit → dim), so the whole bucketing of
  * a row is a single cache-friendly matrix-vector sweep.
  *
  * Bit semantics are identical to `lshBucket`: bit `i` of table `t`'s bucket
  * is set iff `dot(vec, plane(seed+t, i)) >= 0`, with the planes drawn from
  * `scala.util.Random(seed + t).nextGaussian()` in row-major order — so bucket
  * ids are bit-for-bit stable against the prior formulation. A vector whose
  * length differs from `dim` throws (the Column form raises the same way).
  */
case class LshBuckets(child: Expression, nBits: Int, dim: Int, tables: Int,
    seed: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(nBits > 0 && nBits <= 62, s"nBits must be in [1, 62], got $nBits")
  require(dim > 0 && tables > 0, s"dim and tables must be positive")

  // one flat row-major plane matrix: ((t * nBits + b) * dim + j)
  private lazy val planes: Array[Double] = {
    val out = new Array[Double](tables * nBits * dim)
    var t = 0
    var idx = 0
    while (t < tables) {
      val rng = new scala.util.Random(seed + t)
      var i = 0
      while (i < nBits * dim) { out(idx) = rng.nextGaussian(); idx += 1; i += 1 }
      t += 1
    }
    out
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got ${dt.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_buckets"

  private def compute(vec: ArrayData): Array[Long] = {
    if (vec.numElements() != dim)
      throw new IllegalArgumentException(
        s"$prettyName: expected vector dim $dim, got ${vec.numElements()}")
    val out = new Array[Long](tables)
    val p = planes
    var t = 0
    var idx = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < nBits) {
        var s = 0.0
        var j = 0
        while (j < dim) { s += vec.getDouble(j) * p(idx + j); j += 1 }
        if (s >= 0) bucket |= (1L << b)
        idx += dim
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    out
  }

  override def nullSafeEval(a: Any): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(compute(a.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("lshBuckets", this,
        classOf[LshBuckets].getName)
      s"$self.genCompute($v)"
    })

  /** codegen entry point (keeps the generated method tiny). */
  def genCompute(vec: ArrayData): ArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(compute(vec))

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column-level dot product over two array<double> columns. */
  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** All `tables` LSH bucket ids of `vec` as array<long> (see [[LshBuckets]]). */
  def lshBucketsAll(vec: Column, nBits: Int, dim: Int, tables: Int,
      seed: Long = 42L): Column =
    Bridge.column(LshBuckets(Bridge.expression(vec), nBits, dim, tables, seed))
}
