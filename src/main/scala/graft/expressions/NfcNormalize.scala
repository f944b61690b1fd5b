package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical composition) — the text-hygiene
  * step that makes visually identical strings byte-identical before exact
  * dedup / fingerprinting (e.g. "e" + COMBINING ACUTE → "é"). Spark has no
  * built-in for this; `java.text.Normalizer` is the platform implementation
  * of the Unicode standard, so results agree with other engines'
  * normalizers (verified against DuckDB's `nfc_normalize` by the t7 oracle).
  *
  * Public static-forwarded so generated Java can call it directly. The
  * already-normalized fast path (`Normalizer.isNormalized`) skips the
  * allocation for the overwhelmingly common ASCII/NFC input. */
object NfcNormalizeImpl {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Codegen'd wrapper for [[NfcNormalizeImpl.nfc]]. */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcNormalizeImpl.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NfcNormalizeImpl.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

object NfcNormalizeExpr {
  def nfc(c: Column): Column = Bridge.column(NfcNormalizeExpr(Bridge.expression(c)))
}
