package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (`graft_nfc` / NFD / NFKC / NFKD) as a native
  * Catalyst expression — the text-cleaning primitive Spark lacks (the
  * usual recourse is a Scala UDF around `java.text.Normalizer`, which
  * drops out of whole-stage codegen and pays a catalyst↔JVM string
  * conversion per row anyway; this expression stays IN the generated
  * code, calling one static helper per row, the same cost model as
  * Spark's own string builtins).
  *
  * Why a curation engine needs it: web corpora mix precomposed and
  * combining-mark encodings of identical text, so exact dedup (q26),
  * gram keys (q83/q98/q128), and token counting all fracture on
  * byte-unequal-but-canonically-equal strings unless text is
  * NFC-normalized first. The q208 gate mirrors DuckDB's
  * `nfc_normalize` exactly.
  *
  * Fast path: `Normalizer.isNormalized` (a scan, no allocation) skips
  * the rebuild for already-normalized input — the overwhelmingly common
  * case in a mostly-ASCII corpus.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_normalize expects a string, got ${child.dataType.simpleString}")
    else if (!UnicodeNormalize.FORMS.contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"unknown normalization form '$form' (NFC, NFD, NFKC, NFKD)")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StringType
  override def prettyName: String = s"graft_${form.toLowerCase}"

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""graft.expressions.UnicodeNormalize.normalize($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {
  private[expressions] val FORMS = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Static per-row worker, called from both interpreted and generated
    * code paths. */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val f = Normalizer.Form.valueOf(form)
    val str = s.toString
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }
}
