package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression.
  *
  * Spark SQL ships no `normalize()` function (DuckDB has
  * `nfc_normalize`), and decomposed-vs-composed representation is a
  * real hazard in web text: 'é' as U+00E9 and as 'e'+U+0301 are
  * different byte strings, so fingerprinting, dedup and equality
  * comparisons silently split on them. A Scala `udf` would close the
  * gap but drops out of whole-stage codegen and pays per-row ser/de;
  * this expression stays fused — the generated code calls the JDK
  * normalizer (the same Unicode tables DuckDB's ICU build follows for
  * the BMP inputs the corpus contract guarantees) directly.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"NfcNormalize needs a string arg, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), " +
        "java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object TextExprs {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Unicode NFC normalization — drop-in string Column function. */
  def nfc(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
