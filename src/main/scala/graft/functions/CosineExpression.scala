package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native cosine similarity over two numeric arrays.
  *
  * Spark evaluates higher-order-function lambdas interpreted (no
  * codegen), so the `aggregate(zip_with(...))` cosine pays per-element
  * closure dispatch in every ANN candidate pair — the hottest loop in
  * the similarity suite. This expression emits a fused Java loop via
  * `doGenCode` (one pass computing dot, |a|^2, |b|^2).
  *
  * Determinism contract (Fixtures.scala): elements widen to double
  * BEFORE multiplication and all three sums fold strictly left-to-right
  * — bit-identical to the HOF formulation and to DuckDB's list_reduce
  * oracle twin. That twin propagates a null ELEMENT to a null result
  * (zip_with yields a null product, aggregate's sum absorbs it), so for
  * `containsNull` arrays this expression does the same instead of
  * reading the raw slot bits as 0.0 — the domain matches the HOF form
  * it replaces.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // explicit input check instead of ExpectsInputTypes: AbstractDataType
  // is sql-private (same pattern as ZOrderKey)
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"cosine expects numeric arrays, got $other")
  }

  override def dataType: DataType = DoubleType

  private def elemNullable(t: DataType): Boolean = t match {
    case ArrayType(_, n) => n
    case _ => false
  }

  // null elements make the result null even when both arrays are non-null
  override def nullable: Boolean =
    left.nullable || right.nullable ||
    elemNullable(left.dataType) || elemNullable(right.dataType)

  private def elemGetter(t: DataType): (ArrayData, Int) => Double = t match {
    case ArrayType(FloatType, _) => (a, i) => a.getFloat(i).toDouble
    case ArrayType(DoubleType, _) => (a, i) => a.getDouble(i)
    case other => throw new IllegalArgumentException(s"cosine over $other")
  }

  private def anyNullElem(a: ArrayData, check: Boolean): Boolean = {
    if (!check) return false
    var i = 0
    while (i < a.numElements()) { if (a.isNullAt(i)) return true; i += 1 }
    false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (anyNullElem(a, elemNullable(left.dataType)) ||
        anyNullElem(b, elemNullable(right.dataType))) return null
    val ga = elemGetter(left.dataType)
    val gb = elemGetter(right.dataType)
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = ga(a, i); val y = gb(b, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    // trailing elements still count toward their own norm (full-array
    // norms, matching sqrt(norm2(a)) * sqrt(norm2(b)) of the HOF form)
    var j = n
    while (j < a.numElements()) { val x = ga(a, j); na += x * x; j += 1 }
    var k = n
    while (k < b.numElements()) { val y = gb(b, k); nb += y * y; k += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def javaGet(t: DataType, arr: String, i: String): String = t match {
    case ArrayType(FloatType, _) => s"(double) $arr.getFloat($i)"
    case ArrayType(DoubleType, _) => s"$arr.getDouble($i)"
    case other => throw new IllegalArgumentException(s"cosine over $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val hasNull = ctx.freshName("hasNull")
      val core =
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $x = ${javaGet(left.dataType, a, i)};
           |  double $y = ${javaGet(right.dataType, b, i)};
           |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
           |}
           |for (int $i = $n; $i < $a.numElements(); $i++) {
           |  double $x = ${javaGet(left.dataType, a, i)}; $na += $x * $x;
           |}
           |for (int $i = $n; $i < $b.numElements(); $i++) {
           |  double $y = ${javaGet(right.dataType, b, i)}; $nb += $y * $y;
           |}
           |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         """.stripMargin
      // null-element scan only generated for containsNull inputs — the
      // common non-null schema keeps the original branch-free hot loop
      // (and, when the expression is non-nullable, never touches ev.isNull)
      def scan(arr: String, check: Boolean): String =
        if (!check) ""
        else s"""for (int $i = 0; !$hasNull && $i < $arr.numElements(); $i++) {
                |  if ($arr.isNullAt($i)) $hasNull = true;
                |}""".stripMargin
      if (!elemNullable(left.dataType) && !elemNullable(right.dataType)) core
      else
        s"""
           |boolean $hasNull = false;
           |${scan(a, elemNullable(left.dataType))}
           |${scan(b, elemNullable(right.dataType))}
           |if ($hasNull) {
           |  ${ev.isNull} = true;
           |} else {
           |  $core
           |}
         """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

object CosineSimilarity {
  def cosine(a: Column, b: Column): Column =
    GraftSqlShim.column(CosineSimilarity(GraftSqlShim.expression(a), GraftSqlShim.expression(b)))
}
