package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftGlue
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization as native Catalyst expressions — the
  * canonicalization step every multilingual corpus needs BEFORE hashing,
  * deduplication or joining on text: the same user-visible string arrives
  * from the web in composed (é) and decomposed (e + U+0301) forms, which
  * hash differently, dedup separately, and fail equality joins. NFC
  * (UAX #15 canonical composition, via the JDK's `java.text.Normalizer` —
  * no external ICU needed) makes byte equality match visual equality;
  * accent folding (NFD, strip combining marks, re-compose) is the
  * aggressive variant for locale-insensitive matching, the JVM analog of
  * PostgreSQL's `unaccent` and DuckDB's `strip_accents` — and of the
  * reference's name standardization (etl_ida.py normalizes group names
  * by upper/underscore only because its corpus is pt-BR spreadsheets that
  * arrive pre-composed; web text does not).
  *
  * Native expressions, not UDFs (SURVEY §7.3 preference order): evaluated
  * per row on UTF8String with no SerDe boundary; ASCII-only strings — the
  * overwhelming majority of crawl bytes — short-circuit without
  * normalization (Normalizer.isNormalized is a cheap scan). Codegen emits
  * direct static calls to the helpers below (no boxed eval). */
object UnicodeFns {

  /** Static twin for generated code: NFC with the ASCII fast path. */
  final def nfcOf(u: UTF8String): UTF8String = {
    val s = u.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) u
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  /** Static twin for generated code: NFD -> drop Mn marks -> NFC. */
  final def stripAccentsOf(u: UTF8String): UTF8String = {
    val s = u.toString
    // NFD exposes every combining mark as its own code point; dropping
    // category Mn then re-composing yields the unaccented base form
    val decomposed = Normalizer.normalize(s, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(decomposed.length)
    var i = 0
    while (i < decomposed.length) {
      val cp = decomposed.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(
      Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
  }

  case class NfcNormalize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"nfc expects string, got $other")
    }
    override def nullSafeEval(input: Any): Any =
      nfcOf(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeFns.nfcOf($c)")
    override protected def withNewChildInternal(c: Expression): NfcNormalize =
      copy(c)
  }

  case class StripAccents(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"strip_accents expects string, got $other")
    }
    override def nullSafeEval(input: Any): Any =
      stripAccentsOf(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeFns.stripAccentsOf($c)")
    override protected def withNewChildInternal(c: Expression): StripAccents =
      copy(c)
  }

  /** NFC canonical composition. */
  def nfc(c: Column): Column =
    GraftGlue.toColumn(NfcNormalize(GraftGlue.toExpression(c)))

  /** Accent folding (unaccent): NFD → drop combining marks → NFC. */
  def stripAccents(c: Column): Column =
    GraftGlue.toColumn(StripAccents(GraftGlue.toExpression(c)))
}
