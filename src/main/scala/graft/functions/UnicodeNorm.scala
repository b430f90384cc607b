// Hosted under org.apache.spark.sql for the same reason as VecDot:
// the private[sql] Column/type helpers of the public Spark jars.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization of a text column — the FIRST transform a
  * multilingual 100 TB corpus needs before any token/gram/hash
  * operator: crawls mix composed and decomposed spellings of the same
  * text (`é` vs `e`+U+0301, full-width vs ASCII forms), and every
  * downstream exact-match primitive (line/sentence dedup, gram
  * hashes, fingerprints, phrase search) treats them as different
  * bytes. Spark has no built-in for this; `unicode_normalize(text,
  * form)` wraps `java.text.Normalizer` as a zero-shuffle codegen'd
  * projection with the `isNormalized` fast path (ASCII and
  * already-normal text — the overwhelming majority — costs one scan,
  * no allocation).
  *
  * `form` is a literal: `NFC` (canonical compose — the curation
  * default, byte-stable and lossless), `NFD`, `NFKC` (compatibility
  * compose — folds full-width/ligature presentation forms; lossy by
  * design, the dedup-canonicalization choice), `NFKD`. The NFC gate
  * replays in DuckDB's `nfc_normalize`; NFKC/NFD vectors are
  * spec-pinned (DuckDB ships NFC only). */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with ExpectsInputTypes {
  UnicodeNormImpl.formIndex(form) // validate eagerly at plan build

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unicode_normalize"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormImpl.normalize(input.asInstanceOf[UTF8String],
      UnicodeNormImpl.formIndex(form))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.UnicodeNormImpl.normalize($c, " +
        s"${UnicodeNormImpl.formIndex(form)})")

  override protected def withNewChildInternal(
      newChild: Expression): UnicodeNormalize = copy(child = newChild)
}

object UnicodeNormImpl {
  private val Forms = Array(
    java.text.Normalizer.Form.NFC, java.text.Normalizer.Form.NFD,
    java.text.Normalizer.Form.NFKC, java.text.Normalizer.Form.NFKD)

  def formIndex(form: String): Int =
    form.toUpperCase(java.util.Locale.ROOT) match {
      case "NFC" => 0
      case "NFD" => 1
      case "NFKC" => 2
      case "NFKD" => 3
      case other => throw new IllegalArgumentException(
        s"unicode_normalize: unknown form '$other' " +
          "(expected NFC, NFD, NFKC, or NFKD)")
    }

  /** See [[UnicodeNormalize]]. Static for codegen. */
  def normalize(s: UTF8String, formIdx: Int): UTF8String = {
    val str = s.toString
    val form = Forms(formIdx)
    if (java.text.Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
  }
}

object UnicodeNormColumns {
  def unicodeNormalize(text: Column, form: String): Column =
    ExpressionUtils.column(UnicodeNormalize(
      ExpressionUtils.expression(text), form))
}
