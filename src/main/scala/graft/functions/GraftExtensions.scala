package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-distance expression over (col, row) — the space-time storage
  * index twin of ZOrderKey (api/package.scala:148-152). Order 16 covers
  * the int key range the catalog uses. */
case class HilbertKey(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(c: Any, r: Any): Any =
    graft.core.Hilbert.xy2d(16, c.asInstanceOf[Int], r.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, r) => s"graft.core.Hilbert.xy2d(16, $c, $r)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object HilbertKey {
  def hilbert(col: Column, row: Column): Column =
    GraftSqlShim.column(HilbertKey(GraftSqlShim.expression(col), GraftSqlShim.expression(row)))
}

/** Session extension (SURVEY §7.3: SparkSessionExtensions registration
  * point): exposes the engine's native expressions to the SQL frontend
  * so `spark.sql("SELECT zorder(c, r) ...")` plans them codegen'd.
  *
  * Usage: SparkSession.builder().withExtensions(new GraftExtensions) or
  * spark.sql.extensions=graft.functions.GraftExtensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("zorder"),
      new ExpressionInfo(classOf[ZOrderKey].getName, "zorder"),
      (args: Seq[Expression]) => ZOrderKey(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("hilbert"),
      new ExpressionInfo(classOf[HilbertKey].getName, "hilbert"),
      (args: Seq[Expression]) => HilbertKey(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
  }
}
