package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Self-contained 64-bit SimHash core: tokenize on ASCII whitespace, hash
  * each token (FNV-1a 64 + murmur-style avalanche), ±1 vote per bit, sign →
  * bit. One tight pass over the UTF-8 bytes — no arrays, no boxing.
  *
  * Public static-forwarded so generated Java can call it directly. */
object SimHashImpl {
  def simhash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    val votes = new Array[Int](64)
    var i = 0
    val n = bytes.length
    while (i < n) {
      // skip whitespace
      while (i < n && isSpace(bytes(i))) i += 1
      if (i < n) {
        var h = 0xcbf29ce484222325L // FNV offset basis
        while (i < n && !isSpace(bytes(i))) {
          h ^= (bytes(i) & 0xffL)
          h *= 0x100000001b3L // FNV prime
          i += 1
        }
        // avalanche (splitmix64 finalizer)
        h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
        h ^= h >>> 27; h *= 0x94d049bb133111ebL
        h ^= h >>> 31
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' ||
      b == 0x0b // vertical tab: Java's \\s matches it; tokenizers must agree
}

/** Native codegen'd SimHash expression: the SQL higher-order-function
  * formulation ([[graft.dedup.Dedup.simHash64]]) walks 64 lambda frames per
  * token in interpreted eval; this compiles to a single static call inside
  * whole-stage codegen — the corpus signature pass becomes scan-bound. */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHashImpl.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.SimHashImpl.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object SimHash64Expr {
  def simhash64(c: Column): Column =
    Bridge.column(SimHash64Expr(Bridge.expression(c)))
}
