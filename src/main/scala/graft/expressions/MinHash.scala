package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Self-contained MinHash signature core: for each of k hash functions
  * h_j(x) = floorMod(a_j * x + b_j, 2^31 - 1) (long wrap-around multiply —
  * same family as [[graft.dedup.Dedup.minHashSignatureFromHashes]]), the
  * minimum over the input hash array. One tight O(n·k) pass over primitive
  * longs — the HOF formulation walks k interpreted `transform`+`array_min`
  * lambdas per row and dominates the corpus signature pass.
  *
  * Public static-forwarded so generated Java can call it directly. */
object MinHashImpl {
  private val Prime = 2147483647L // 2^31 - 1, matches Dedup.MersennePrime

  /** Empty input arrays yield a signature of Long.MaxValue sentinels (the
    * HOF form yields nulls there; shingling never emits an empty array —
    * even one token produces one shingle). */
  def signature(hashes: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val k = a.length
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < k) {
        val v = java.lang.Math.floorMod(h * a(j) + b(j), Prime)
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native codegen'd MinHash signature over an `array<long>` of pre-hashed
  * shingles. `a`/`b` are the permutation constants (derived from (k, seed)
  * in [[graft.dedup.Dedup]]); they ride into generated code as a reference
  * object, so the expression stays inside whole-stage codegen. */
case class MinHashSigExpr(child: Expression, a: Array[Long], b: Array[Long])
    extends UnaryExpression {
  require(a.length == b.length && a.nonEmpty, "a/b constant arrays must match and be non-empty")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashImpl.signature(input.asInstanceOf[ArrayData], a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", a, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", b, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.MinHashImpl.signature($c, $aRef, $bRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

object MinHashSigExpr {
  def minhashSig(hashes: Column, a: Array[Long], b: Array[Long]): Column =
    Bridge.column(MinHashSigExpr(Bridge.expression(hashes), a, b))
}

/** Position-wise agreement count of two equal-length `array<long>` signatures
  * (est. Jaccard = agreement / k) — a primitive loop; the `zip_with` +
  * `aggregate` HOF form is interpreted per candidate pair. */
object SigAgreementImpl {
  def count(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0; var c = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) c += 1; i += 1 }
    c
  }
}

/** Codegen'd wrapper for [[SigAgreementImpl.count]]. */
case class SigAgreement(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> inputs, got ${l.simpleString} / ${r.simpleString}")
    }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_sig_agreement"

  override def nullSafeEval(a: Any, b: Any): Any =
    SigAgreementImpl.count(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.SigAgreementImpl.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigAgreement =
    copy(left = newLeft, right = newRight)
}

object SigAgreement {
  def sigAgreement(a: Column, b: Column): Column =
    Bridge.column(SigAgreement(Bridge.expression(a), Bridge.expression(b)))
}
