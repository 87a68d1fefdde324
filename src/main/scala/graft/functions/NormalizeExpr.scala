package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression.
  *
  * Web-scale text arrives in mixed normalization forms: the same visible
  * string can be composed (`é` = U+00E9) or decomposed (`e` + U+0301),
  * which silently breaks exact dedup, shingle dedup, fingerprints, and
  * tokenizer merges — two byte-distinct docs that render identically. The
  * standard fix is NFC at ingest, before any content hashing (every major
  * pipeline does this in its text-cleaning pass).
  *
  * Spark has no normalization built-in; a Scala UDF would box every row and
  * block codegen. This expression calls `java.text.Normalizer` (ICU-correct,
  * in the JDK) directly from generated code, with an ASCII fast path on the
  * raw UTF8String bytes (ASCII is always NFC): the overwhelmingly-common
  * ASCII row costs one byte scan — no String decode, no allocation. Non-ASCII
  * rows check `isNormalized` before paying for a normalize copy.
  * Oracle-portable: DuckDB's `nfc_normalize` implements the same Unicode
  * normalization, so results hash-compare exactly.
  */
object NfcNormalizeUtil {
  def nfc(s: UTF8String): UTF8String = {
    // ASCII fast path on the raw bytes: ASCII is always NFC, and real
    // corpora are overwhelmingly ASCII — the common row costs one byte
    // scan, no String decode, no allocation
    var i = 0
    val n = s.numBytes()
    var ascii = true
    while (ascii && i < n) { ascii = s.getByte(i) >= 0; i += 1 }
    if (ascii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == org.apache.spark.sql.types.NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalizeUtil.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalizeUtil.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** DataFrame-API entry: `NfcNormalize(col("text"))`. */
  def apply(c: Column): Column = GraftShims.column(NfcNormalize(GraftShims.expression(c)))
}
