package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode NFC normalization over a string column.
  *
  * Why it exists: canonical normalization is step zero of any real text
  * pipeline — the SAME user-visible text arrives both precomposed
  * ("café", U+00E9) and decomposed ("cafe" + U+0301) depending on the
  * source (macOS filenames and many scrapers emit NFD), and every
  * downstream identity in this engine (exact-dedup content hashes,
  * shingle fingerprints, token equality against vocabularies) silently
  * splits on the byte difference unless the text is normalized first.
  * Spark has no built-in for it; the usual fallback is a Scala UDF,
  * which breaks whole-stage codegen exactly where q62's gate chain is
  * hottest. This expression stays inside the generated loop (SURVEY
  * §7.3's preference order: builtin > native Expression > UDF).
  *
  * Fast path: `Normalizer.isNormalized` is a quick-check scan that
  * accepts without allocating on already-NFC input — which is nearly
  * all real text (ASCII is NFC by construction) — so the common case
  * costs one pass and zero copies; only genuinely decomposed strings
  * pay for the rebuild.
  *
  * Registered for SQL as `nfc_normalize` by
  * [[graft.GraftExtensions]] — name-compatible with DuckDB's
  * `nfc_normalize`, which is what the q151 oracle verifies against
  * (both implement the same Unicode standard algorithm).
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects a string argument, got $other")
  }
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    NfcNormalizeExpr.nfcStatic(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfcNormalizeExpr.nfcStatic($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalizeExpr {
  /** Column-API entry point. */
  def nfcNormalize(c: Column): Column =
    GraftSqlBridge.column(NfcNormalizeExpr(GraftSqlBridge.expression(c)))

  /** Called from generated code. Quick-check fast path: already-NFC
    * strings (all ASCII, most real text) return the input buffer
    * untouched. */
  def nfcStatic(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
