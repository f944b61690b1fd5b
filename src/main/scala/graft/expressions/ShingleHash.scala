package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct hashed word n-gram shingles in ONE pass over the UTF-8 bytes:
  * tokenize on ASCII whitespace, FNV-1a + splitmix64-avalanche per token,
  * then each n-gram's hash is a mix-combine of its n token hashes; the
  * result is sorted + deduplicated. Replaces the
  * `transform(shingles(text), xxhash64)` pipeline for hash-consuming
  * consumers (MinHash) — that form materializes every shingle STRING per row
  * through interpreted higher-order lambdas; this never allocates a string.
  * Short texts (< n tokens) hash the whole token sequence as one shingle,
  * mirroring [[graft.dedup.Dedup.shingles]]; empty texts yield an empty
  * array. The hash family differs from xxhash64-of-string — fine for any
  * consumer that only needs a deterministic well-mixed shingle identity.
  *
  * Public static-forwarded so generated Java can call it directly. */
object ShingleHashImpl {

  private def avalanche(x: Long): Long = {
    var h = x
    h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
    h ^= h >>> 27; h *= 0x94d049bb133111ebL
    h ^= h >>> 31
    h
  }

  def shingleHashes(s: UTF8String, n: Int): GenericArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // pass 1: token hashes
    var tokenHashes = new Array[Long](8)
    var nTok = 0
    var i = 0
    while (i < len) {
      while (i < len && isSpace(bytes(i))) i += 1
      if (i < len) {
        var h = 0xcbf29ce484222325L // FNV offset basis
        while (i < len && !isSpace(bytes(i))) {
          h ^= (bytes(i) & 0xffL)
          h *= 0x100000001b3L // FNV prime
          i += 1
        }
        if (nTok == tokenHashes.length)
          tokenHashes = java.util.Arrays.copyOf(tokenHashes, nTok * 2)
        tokenHashes(nTok) = avalanche(h)
        nTok += 1
      }
    }
    if (nTok == 0) return new GenericArrayData(Array.empty[Long])
    // pass 2: n-gram combine (whole sequence if shorter than n)
    val width = if (nTok < n) nTok else n
    val nShingles = nTok - width + 1
    val out = new Array[Long](nShingles)
    var p = 0
    while (p < nShingles) {
      var h = 0x9e3779b97f4a7c15L
      var j = 0
      while (j < width) {
        h = (h ^ tokenHashes(p + j)) * 0xff51afd7ed558ccdL
        j += 1
      }
      out(p) = avalanche(h)
      p += 1
    }
    java.util.Arrays.sort(out)
    // dedup in place (sorted)
    var w = 0
    var r = 0
    while (r < nShingles) {
      if (w == 0 || out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(if (w == nShingles) out else java.util.Arrays.copyOf(out, w))
  }

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' ||
      b == 0x0b // vertical tab: Java's \\s matches it; tokenizers must agree
}

/** Codegen'd wrapper for [[ShingleHashImpl.shingleHashes]]. */
case class ShingleHashExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashImpl.shingleHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.ShingleHashImpl.shingleHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashExpr =
    copy(child = newChild)
}

object ShingleHashExpr {
  def shingleHashes(c: Column, n: Int): Column =
    Bridge.column(ShingleHashExpr(Bridge.expression(c), n))
}
