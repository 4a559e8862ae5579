package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode NFC normalization — the first pass of any multilingual
  * text pipeline: crawled text mixes precomposed (é = U+00E9) and
  * decomposed (e + U+0301) spellings of the SAME grapheme, so exact
  * dedup, shingling, token counting and equality joins all silently
  * fracture until every document is put in one canonical form. NFC
  * (canonical decomposition + canonical composition, UAX #15) is the
  * form the web overwhelmingly uses. Implemented over the JDK's ICU
  * lineage [[java.text.Normalizer]]; the common all-ASCII row is
  * short-circuited with a cheap scan (Normalizer's own quick-check then
  * never allocates), which matters when 95 % of a crawl is ASCII.
  * Participates in whole-stage codegen through a static helper call.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfcNormalize$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  def compute(s: UTF8String): UTF8String = {
    // ASCII fast path: NFC is the identity on pure ASCII
    if (UnicodeNorm.isAscii(s)) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Column form. */
  def apply(c: Column): Column =
    GraftSql.column(NfcNormalize(GraftSql.expression(c)))
}

/** Accent stripping — the fold a search/linkage pipeline applies before
  * fuzzy matching (`café` must hit `cafe`): canonical decomposition
  * (NFD), then every combining mark (Unicode category Mn) dropped.
  * Matches the conventional `strip_accents` of DuckDB/Lucene on Latin
  * text. ASCII short-circuits like [[NfcNormalize]].
  */
case class StripAccents(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_strip_accents"

  override protected def nullSafeEval(input: Any): Any =
    StripAccents.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.StripAccents$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

/** Shared fast-path predicate for both expressions. */
private[functions] object UnicodeNorm {
  def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }
}

object StripAccents {

  def compute(s: UTF8String): UTF8String = {
    if (UnicodeNorm.isAscii(s)) return s
    val nfd = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val sb = new StringBuilder(nfd.length)
    var j = 0
    while (j < nfd.length) {
      val cp = nfd.codePointAt(j)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendAll(Character.toChars(cp))
      j += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  /** Column form. */
  def apply(c: Column): Column =
    GraftSql.column(StripAccents(GraftSql.expression(c)))
}
