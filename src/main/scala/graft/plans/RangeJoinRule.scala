package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Optimizer rule: plan an inequality-only RANGE JOIN as a binned
  * equi-join.
  *
  * An inner join whose whole condition is `lo <= x <= hi` (any
  * spelling, strict or not, either operand order) has no equi-key, so
  * Spark can only plan it as a broadcast nested-loop — a dead end when
  * both sides are large. With `spark.graft.rangeJoin.binWidth = w`
  * set, this rule rewrites the LOGICAL join: the point side gains
  * `floor(x / w)`, the interval side EXPLODES into the bins its
  * [lo, hi] overlaps, and the join becomes an equality on the bin plus
  * the original (exact) range predicate — hash-partitionable with two
  * huge sides. This is the same rewrite `AdvancedQueries.bandJoin`
  * states by hand (and r_point_in_poly's grid join in 2-D), promoted
  * to a `Rule[LogicalPlan]` so ANY user join of that shape gets the
  * scalable plan declaratively — the Catalyst extension tier between
  * "compose existing ops" and "custom physical operator".
  *
  * Correctness: a matching row satisfies lo <= x <= hi, so x's bin
  * lies in [floor(lo/w), floor(hi/w)] — the exploded set — and the
  * point has exactly ONE bin, so no pair can match twice (no dedup
  * needed). NULL bounds/points fail the original predicate and
  * produce NULL bins / empty explodes — dropped either way.
  *
  * Registered by [[graft.functions.GraftExtensions]] (build-time) or
  * `spark.experimental.extraOptimizations` (runtime). Off unless the
  * width conf is set; a rewritten join is marked by its `_graft_bin`
  * attributes so a fixed-point optimizer pass cannot re-fire. */
object RangeJoinRule extends Rule[LogicalPlan] {

  val WidthConf = "spark.graft.rangeJoin.binWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = SQLConf.get.getConfString(WidthConf, "0").toDouble
    if (w <= 0) plan
    else plan.transform {
      case j @ Join(_, _, Inner, Some(cond), _) if !alreadyBinned(cond) =>
        extract(cond, j.left, j.right)
          .map { case (x, lo, hi, pointLeft) => rewrite(j, x, lo, hi, pointLeft, w) }
          .getOrElse(j)
    }
  }

  private def alreadyBinned(cond: Expression): Boolean =
    cond.exists {
      case a: AttributeReference => a.name.startsWith("_graft_bin")
      case _ => false
    }

  /** Interpretations of one comparison: ('L', x, lo) = lower bound on x,
    * ('U', x, hi) = upper bound on x. */
  private def interp(e: Expression): Seq[(Char, Expression, Expression)] = e match {
    case GreaterThanOrEqual(a, b) => Seq(('L', a, b), ('U', b, a))
    case GreaterThan(a, b)        => Seq(('L', a, b), ('U', b, a))
    case LessThanOrEqual(a, b)    => Seq(('U', a, b), ('L', b, a))
    case LessThan(a, b)           => Seq(('U', a, b), ('L', b, a))
    case _                        => Seq.empty
  }

  /** Match `cond` as (x between lo and hi) with x wholly from one join
    * side and lo/hi wholly from the other; returns (x, lo, hi,
    * pointIsLeft). */
  private def extract(cond: Expression, l: LogicalPlan, r: LogicalPlan)
      : Option[(Expression, Expression, Expression, Boolean)] = cond match {
    case And(c1, c2) =>
      val combos = for {
        (k1, x1, b1) <- interp(c1)
        (k2, x2, b2) <- interp(c2)
        if k1 == 'L' && k2 == 'U' && x1.semanticEquals(x2)
        if x1.dataType.isInstanceOf[NumericType] &&
          b1.dataType.isInstanceOf[NumericType] && b2.dataType.isInstanceOf[NumericType]
        pointLeft <- sideOf(x1, b1, b2, l, r)
      } yield (x1, b1, b2, pointLeft)
      combos.headOption
    case _ => None
  }

  private def sideOf(x: Expression, lo: Expression, hi: Expression,
                     l: LogicalPlan, r: LogicalPlan): Option[Boolean] = {
    val bounds = lo.references ++ hi.references
    val xL = x.references.nonEmpty && x.references.subsetOf(l.outputSet)
    val xR = x.references.nonEmpty && x.references.subsetOf(r.outputSet)
    val bL = bounds.nonEmpty && bounds.subsetOf(l.outputSet)
    val bR = bounds.nonEmpty && bounds.subsetOf(r.outputSet)
    if (xL && bR) Some(true)
    else if (xR && bL) Some(false)
    else None
  }

  // the rule runs post-analysis, so time-zone-aware expressions (Cast,
  // Sequence) must be born with their zone — ResolveTimeZone will not
  // run again
  private def tz: Option[String] = Some(SQLConf.get.sessionLocalTimeZone)

  private def bin(e: Expression, w: Double): Expression =
    Floor(Divide(Cast(e, DoubleType, tz), Literal(w))) // floor(double) is LongType

  private def rewrite(j: Join, x: Expression, lo: Expression, hi: Expression,
                      pointLeft: Boolean, w: Double): LogicalPlan = {
    val (pointSide, intervalSide) = if (pointLeft) (j.left, j.right) else (j.right, j.left)
    val pAlias = Alias(bin(x, w), "_graft_bin_p")()
    val pProj = Project(pointSide.output :+ pAlias, pointSide)
    val gAttr = AttributeReference("_graft_bin_i", LongType, nullable = false)()
    val gen = Generate(
      Explode(Sequence(bin(lo, w), bin(hi, w), Some(Literal(1L)), tz)),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(gAttr), child = intervalSide)
    val newCond = And(EqualTo(pAlias.toAttribute, gAttr), j.condition.get)
    val (nl, nr) = if (pointLeft) (pProj, gen) else (gen, pProj)
    val out = Project(j.output, Join(nl, nr, Inner, Some(newCond), j.hint))
    // a post-analysis rule must hand back a RESOLVED tree; bail to the
    // original join rather than fail plan validation if a Spark upgrade
    // changes an expression's resolution contract
    if (out.resolved) out else j
  }
}
