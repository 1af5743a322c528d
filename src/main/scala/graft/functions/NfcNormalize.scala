package graft.functions

import java.text.Normalizer
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization.
  *
  * Spark has no normalization builtin, and every real ingestion pipeline
  * canonicalizes Unicode before hashing — otherwise "é" (U+00E9) and
  * "e"+U+0301 are different bytes and defeat exact dedup, fingerprints,
  * and token statistics. NFC (canonical composition) is the standard
  * choice: it is lossless (unlike NFKC's compatibility folding) and
  * idempotent.
  *
  * The hot path avoids allocation: `Normalizer.isNormalized` is a scan
  * (true for pure-ASCII text, the overwhelmingly common case), and only
  * non-normalized strings pay the String round-trip. Oracle parity:
  * DuckDB's `nfc_normalize` (utf8proc) and java.text.Normalizer both
  * implement the Unicode canonical-composition algorithm, which is
  * fully specified — identical output for identical input. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.typeName == "string") TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = child.dataType

  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static helper shared by interpreted eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
