package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}

/** Unicode NFC normalization as a native codegen'd expression — the
  * first step of any text-ingest clean stage (decomposed accents,
  * mixed-source corpora). Spark has no normalization builtin, so the
  * alternative is a Scala UDF (serialization + codegen fence); this
  * expression stays inside whole-stage codegen via a static kernel
  * call, the same shape as [[ZOrderKey]].
  *
  * Correctness is cross-checked against an independent implementation:
  * the t_unicode_clean gate hash-matches DuckDB's utf8proc-based
  * `nfc_normalize` on deterministically decomposed fixture text.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def nullSafeEval(s: Any): Any =
    graft.core.UnicodeNorm.nfc(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.UnicodeNorm.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  def nfc(c: Column): Column =
    GraftSqlShim.column(NfcNormalize(GraftSqlShim.expression(c)))
}
