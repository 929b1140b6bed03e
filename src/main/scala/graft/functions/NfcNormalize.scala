package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper for [[NfcNormalize]], called directly from generated
  * Java. The `isNormalized` quick-check runs first: for corpus text that
  * is already NFC (the overwhelmingly common case — web text arrives
  * composed), the check walks the char array once against the Unicode
  * quick-check properties and returns the INPUT UTF8String untouched —
  * no String materialization, no re-encode, no allocation. Only rows
  * that actually contain decomposed sequences pay the normalize +
  * re-encode cost. */
object NfcHelper {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Accent-fold + casefold: NFD decomposition, strip every non-spacing
    * mark (general category Mn — covers both precomposed `é` after
    * decomposition and already-decomposed `a` + U+0301), then
    * root-locale lowercase. ASCII fast path: text that is already
    * lowercase ASCII (the overwhelmingly common corpus case) returns
    * the input UTF8String untouched. Matches DuckDB's independent
    * `strip_accents(lower(·))` on the full Latin accent range. */
  private val Marks = java.util.regex.Pattern.compile("\\p{Mn}+")
  def accentFold(s: UTF8String): UTF8String = {
    val n = s.numBytes
    var i = 0
    var asciiLower = true
    while (asciiLower && i < n) {
      val b = s.getByte(i)
      if (b < 0 || (b >= 'A' && b <= 'Z')) asciiLower = false
      i += 1
    }
    if (asciiLower) return s
    val folded = Marks.matcher(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFD)).replaceAll("")
      .toLowerCase(java.util.Locale.ROOT)
    UTF8String.fromString(folded)
  }
}

/** Native codegen'd Unicode NFC normalization (canonical composition):
  * decomposed sequences like `e` + U+0301 COMBINING ACUTE become the
  * precomposed codepoint `é`. Tokenizers, hashes, and dedup shingles all
  * key on raw bytes, so a corpus mixing the two encodings of the same
  * visible text under-deduplicates and splits token statistics — NFC
  * normalization is the standard first pass of a text pipeline. Matches
  * DuckDB's `nfc_normalize` (both implement Unicode canonical
  * composition).
  *
  * The reference engine normalizes strings field-by-field in Python
  * (`lib/DataProcessor.py:44-45` coerces to `str`) and never addresses
  * encoding forms; this is part of the beyond-parity text tier.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcHelper.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcHelper.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native codegen'd accent-fold + casefold — the canonical dedup key
  * for text that differs only by case or diacritics ("Café" / "CAFE" /
  * decomposed "Cafe" + combining acute are one document to a dedup
  * pass). Lowercase-ASCII rows (the common corpus case) return the
  * input untouched; see [[NfcHelper.accentFold]]. */
case class AccentFold(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "accent_fold"

  override protected def nullSafeEval(input: Any): Any =
    NfcHelper.accentFold(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcHelper.accentFold($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
