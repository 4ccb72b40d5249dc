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
    // range-join → binned equi-join rewrite (off unless
    // spark.graft.rangeJoin.binWidth is set; see RangeJoinRule)
    e.injectOptimizerRule(_ => graft.plans.RangeJoinRule)
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
    e.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => NfcNormalize(args(0))))
    e.injectFunction((
      FunctionIdentifier("kmv_distinct"),
      new ExpressionInfo(classOf[graft.ops.Sketches.KmvDistinct].getName, "kmv_distinct"),
      GraftExtensions.kmvDistinctBuilder))
    // the portable-hash primitives every sampling/split/dedup query is
    // built on, for SQL-only users: builders assemble the SAME
    // codegen'd builtin tree the Column API builds (TextOps.h60), so
    // SQL and DataFrame callers can never drift
    e.injectFunction((
      FunctionIdentifier("h60"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "h60"),
      (args: Seq[Expression]) => GraftExtensions.h60Expr(args(0))))
    e.injectFunction((
      FunctionIdentifier("hash_bucket"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "hash_bucket"),
      GraftExtensions.hashBucketBuilder))
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Literal, Md5, Remainder, Substring}
  import org.apache.spark.sql.types.{BinaryType, StringType}

  /** Catalyst twin of `TextOps.h60` (same tree:
    * conv(substring(md5(cast binary), 1, 15), 16, 10) cast long). */
  def h60Expr(child: Expression): Expression =
    Cast(Conv(Substring(Md5(Cast(child, BinaryType)),
      Literal(1), Literal(15)), Literal(16), Literal(10)), LongType)

  /** `hash_bucket(key, n)` = h60(cast(key as string)) % n — the shared
    * split/sampling primitive (TextOps.hashBucket) for SQL callers. */
  val hashBucketBuilder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, s"hash_bucket(key, n) takes 2 arguments, got ${args.length}")
    require(args(1).foldable, "hash_bucket's n must be a literal")
    val n = args(1).eval(null) match {
      case m: Number => m.longValue
      case other => throw new IllegalArgumentException(
        s"hash_bucket's n must be a non-null integer literal, got ${Option(other).getOrElse("NULL")}")
    }
    Remainder(h60Expr(Cast(args(0), StringType)), Literal(n))
  }
  /** `kmv_distinct(hash_col, k)` as a SQL aggregate: the typed
    * KmvDistinct Aggregator wrapped as a ScalaAggregator expression —
    * the same registration path `spark.udf.register(udaf(...))` takes,
    * but available declaratively via spark.sql.extensions. `k` must be
    * a foldable integer (it sizes the aggregation buffer at plan time). */
  val kmvDistinctBuilder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, s"kmv_distinct(hash, k) takes 2 arguments, got ${args.length}")
    require(args(1).foldable, "kmv_distinct's k must be a literal")
    val k = args(1).eval(null) match {
      case n: Number => n.intValue
      case other => throw new IllegalArgumentException(
        s"kmv_distinct's k must be a non-null integer literal, got ${Option(other).getOrElse("NULL")}")
    }
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    new org.apache.spark.sql.execution.aggregate.ScalaAggregator[Long, Array[Long], Double](
      Seq(args(0)), new graft.ops.Sketches.KmvDistinct(k),
      ExpressionEncoder[Long](), ExpressionEncoder[Array[Long]](),
      true, true, 0, 0, Some("kmv_distinct")).toAggregateExpression()
  }
}
