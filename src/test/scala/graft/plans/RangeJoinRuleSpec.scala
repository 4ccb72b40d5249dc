package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase.spark

/** The range-join rewrite must change the PLAN (nested-loop → binned
  * equi-join) without changing the ANSWER, across comparison
  * spellings, operand orders and sidedness. */
class RangeJoinRuleSpec extends AnyFunSuite {
  import spark.implicits._

  private val points = (0 until 400)
    .map(i => (i.toLong, (i * 37 % 997) / 3.0)).toDF("pid", "x")
  private val ivals = (0 until 250)
    .map { i => val lo = (i * 31 % 941) / 3.0; (i.toLong, lo, lo + i % 17) }
    .toDF("iid", "lo", "hi")

  private def withRule[A](width: Double)(f: => A): A = {
    val had = spark.experimental.extraOptimizations
    if (!had.contains(RangeJoinRule))
      spark.experimental.extraOptimizations = had :+ RangeJoinRule
    spark.conf.set(RangeJoinRule.WidthConf, width.toString)
    try f finally {
      spark.conf.unset(RangeJoinRule.WidthConf)
      spark.experimental.extraOptimizations = had
    }
  }

  test("binned plan replaces the nested loop and keeps the exact answer") {
    val cond = $"x" >= $"lo" && $"x" <= $"hi"
    val naive = points.join(ivals, cond)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    withRule(8.0) {
      val df = points.join(ivals, cond).select("pid", "iid")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("_graft_bin"), "rule did not fire")
      assert(!plan.contains("BroadcastNestedLoopJoin"), "still a nested loop")
      assert(df.as[(Long, Long)].collect().toSet == naive)
    }
  }

  test("spelling/order/side variants all match; non-range joins are untouched") {
    val naive = points.join(ivals, $"x" >= $"lo" && $"x" < $"hi")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    withRule(8.0) {
      // strict upper bound, flipped operands, interval side on the left
      val df = ivals.join(points, $"lo" <= $"x" && $"hi" > $"x").select("pid", "iid")
      assert(df.queryExecution.executedPlan.toString.contains("_graft_bin"))
      assert(df.as[(Long, Long)].collect().toSet == naive)
      // an equi-join must pass through unchanged
      val eq = points.join(ivals, $"pid" === $"iid")
      assert(!eq.queryExecution.executedPlan.toString.contains("_graft_bin"))
      assert(eq.count() == 250)
    }
  }

  test("rule is inert without the width conf") {
    val had = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = had :+ RangeJoinRule
    try {
      val df = points.join(ivals, $"x" >= $"lo" && $"x" <= $"hi")
      assert(!df.queryExecution.executedPlan.toString.contains("_graft_bin"))
    } finally spark.experimental.extraOptimizations = had
  }
}
