package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd Catalyst expression — the
  * composition step of the text-cleanup pipeline rung
  * ([[graft.operators.TextFix]]). Spark ships no normalizer builtin;
  * a Scala UDF would pay the Catalyst→String→Catalyst conversion per
  * row over the corpus text scan (the [[AnnEncode]] rationale — though
  * here the String materialization is inherent to `java.text.Normalizer`,
  * so the expression saves the UDF wrapper, not the copy). DuckDB's
  * `nfc_normalize` implements the same Unicode NFC, so oracle queries
  * replay it exactly.
  */
object Nfc {
  /** Static kernel shared by interpreted eval and generated code.
    * NFC-normalized copy, or the SAME reference when already normal
    * (the overwhelmingly common case for crawl text — skips the copy).
    */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc expects string input, got $other")
  }

  override def nullSafeEval(a: Any): Any =
    Nfc.normalize(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.Nfc.normalize($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "nfc"
}

/** Column builder. */
object NormalizeFunctions {
  import org.apache.spark.sql.GraftSqlBridge

  /** Unicode NFC normalization of a string column. */
  def nfc(c: Column): Column =
    GraftSqlBridge.column(NfcNormalizeExpr(GraftSqlBridge.expression(c)))
}
