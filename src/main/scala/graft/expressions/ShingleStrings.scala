package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingle STRINGS in one pass over the UTF-8 bytes —
  * the string-producing sibling of [[ShingleHashImpl]], for the md5-twin /
  * exact-Jaccard / decontamination consumers whose cross-engine oracles
  * replay the actual shingle text. Exactly reproduces the HOF formulation
  * `array_distinct(transform(..., concat_ws(" ", slice(tokens, i, n))))`
  * (kept as [[graft.dedup.Dedup.shinglesHof]], equivalence spec'd):
  * tokenize on ASCII whitespace runs, join each window of n tokens with a
  * single space, first-occurrence-ordered distinct; fewer than n tokens →
  * ONE shingle of all tokens; zero tokens → [""] (the HOF's
  * `concat_ws(" ", [])` artifact, which consumers rely on the oracle side
  * reproducing via `array_to_string`).
  *
  * The HOF chain walks interpreted lambdas and re-evaluates the token split
  * per branch; this allocates only token offsets + one byte array per
  * distinct shingle, and is the shared floor under the d4/d6/d8/e7/t9
  * corpus passes. */
object ShingleStringsImpl {

  def shingleStrings(s: UTF8String, n: Int): GenericArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    var starts = new Array[Int](8)
    var ends = new Array[Int](8)
    var nTok = 0
    var i = 0
    while (i < len) {
      while (i < len && isSpace(bytes(i))) i += 1
      if (i < len) {
        val st = i
        while (i < len && !isSpace(bytes(i))) i += 1
        if (nTok == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nTok * 2)
          ends = java.util.Arrays.copyOf(ends, nTok * 2)
        }
        starts(nTok) = st; ends(nTok) = i; nTok += 1
      }
    }
    val seen = new java.util.LinkedHashSet[UTF8String]()
    if (nTok == 0) seen.add(UTF8String.EMPTY_UTF8)
    else {
      val width = if (nTok < n) nTok else n
      val nSh = nTok - width + 1
      var p = 0
      while (p < nSh) {
        var sz = width - 1
        var j = 0
        while (j < width) { sz += ends(p + j) - starts(p + j); j += 1 }
        val out = new Array[Byte](sz)
        var o = 0
        j = 0
        while (j < width) {
          if (j > 0) { out(o) = ' '; o += 1 }
          val l = ends(p + j) - starts(p + j)
          System.arraycopy(bytes, starts(p + j), out, o, l)
          o += l
          j += 1
        }
        seen.add(UTF8String.fromBytes(out))
        p += 1
      }
    }
    val arr = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var w = 0
    while (it.hasNext) { arr(w) = it.next(); w += 1 }
    new GenericArrayData(arr)
  }

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' ||
      b == 0x0b // must agree with ShingleHashImpl and Java's \s
}

/** Codegen'd wrapper for [[ShingleStringsImpl.shingleStrings]]. */
case class ShingleStringsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any =
    ShingleStringsImpl.shingleStrings(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.ShingleStringsImpl.shingleStrings($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleStringsExpr =
    copy(child = newChild)
}

object ShingleStringsExpr {
  def shingleStrings(c: Column, n: Int): Column =
    Bridge.column(ShingleStringsExpr(Bridge.expression(c), n))
}
