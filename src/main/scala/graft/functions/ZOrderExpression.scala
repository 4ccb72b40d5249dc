package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Catalyst expression computing the Z-order (Morton) key of
  * (col, row) — the engine's storage index, replacing the reference's
  * `ZCurveKeyIndexMethod` (api/package.scala:143). Codegen'd so it stays
  * inside whole-stage codegen in the sort-before-write path.
  */
/** Inputs must already be IntegerType (call sites cast); kept free of
  * ExpectsInputTypes because AbstractDataType is sql-private. */
case class ZOrderKey(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(col: Any, row: Any): Any =
    graft.core.ZOrder.interleave(col.asInstanceOf[Int], row.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, r) => s"graft.core.ZOrder.interleave($c, $r)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrderKey {
  def zorder(col: Column, row: Column): Column =
    GraftSqlShim.column(ZOrderKey(GraftSqlShim.expression(col), GraftSqlShim.expression(row)))
}
