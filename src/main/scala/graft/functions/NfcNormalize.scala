package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `nfc(s)` — Unicode canonical composition (NFC), the normalization a
  * text-cleaning pipeline applies BEFORE any fingerprint or shingle is
  * computed: visually identical strings with different codepoint
  * sequences (`é` vs `e` + U+0301, decomposed Hangul, …) must dedup as
  * equals, and Spark ships no normalizer among its builtins. A native
  * codegen'd expression (not a UDF) keeps the per-row call inside
  * whole-stage codegen with no serialization boundary; the JDK's
  * `java.text.Normalizer` implements the Unicode standard's canonical
  * forms, so results are engine-portable by construction (DuckDB's
  * `nfc_normalize` implements the same UAX #15 algorithm — the tx19
  * oracle leans on that).
  *
  * The NFC quick-check fast path (`isNormalized`) skips the composition
  * pass entirely for already-normal text — which is nearly all of a
  * real corpus — so the common case costs one scan of the string, no
  * allocation. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string input, got ${child.dataType}")
  override def prettyName: String = "nfc"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      NfcNormalize.normalize(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.functions.NfcNormalize.normalize($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  def normalize(s: String): String =
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) s
    else Normalizer.normalize(s, Normalizer.Form.NFC)

  def register(spark: SparkSession): Unit =
    Registry.registerOnce(spark, "nfc")(exprs => NfcNormalize(exprs(0)))
}
