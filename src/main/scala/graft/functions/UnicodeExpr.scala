package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.ColumnBridge

/** Unicode text canonicalization for corpus prep. The same logical text
  * arrives from the web in composed and decomposed byte forms ("é" vs
  * "e"+U+0301); every byte-level operator downstream — fingerprint dedup,
  * minhash shingles, exact-match decontamination — silently treats them as
  * different documents unless the corpus is normalized first. Per-row,
  * O(doc length), no shuffle; both forms are reproduced bit-exactly by
  * DuckDB (`nfc_normalize`, `strip_accents`), so they are oracle-gated.
  *
  * (CodegenFallback: the JDK normalizer is compiled code; only the
  * expression boundary is interpreted.)
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with CodegenFallback {
  require(Set("NFC", "NFD", "NFKC", "NFKD")(form),
    s"normalization form must be NFC|NFD|NFKC|NFKD, got '$form'")

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"unicode_normalize requires string, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // Fast path: NFC/NFKC inputs are the overwhelming common case and
    // isNormalized is a cheap scan — skip the rebuild when already clean.
    val f = Normalizer.Form.valueOf(form)
    if (Normalizer.isNormalized(s, f)) input
    else UTF8String.fromString(Normalizer.normalize(s, f))
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

/** Remove combining diacritical marks: NFD-decompose, drop the combining
  * class, NFC-recompose — "café" → "cafe", standalone letters like "Ø"
  * untouched (this is decomposition-based stripping, NOT ICU locale
  * folding; DuckDB's `strip_accents` agrees, which makes it gateable).
  */
case class StripAccents(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"strip_accents requires string, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val nfd = Normalizer.normalize(s, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(
      Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

object UnicodeExpr {
  /** Column wrapper: canonical NFC form (web-default composition). */
  def nfcNormalize(c: Column): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(c), "NFC"))

  /** Column wrapper: compatibility NFKC form (folds ligatures/width). */
  def nfkcNormalize(c: Column): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(c), "NFKC"))

  /** Column wrapper: combining diacritics removed. */
  def stripAccents(c: Column): Column =
    ColumnBridge.column(StripAccents(ColumnBridge.expression(c)))
}
