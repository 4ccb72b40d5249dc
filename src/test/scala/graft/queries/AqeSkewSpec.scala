package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase.spark

/** AQE skew-join handling — the runtime half of the skew story (the
  * compile-time half is ops.Skew salting, gated by a_salted_agg /
  * a_salted_join): when one join key carries most of the rows, AQE
  * splits the oversized partition into parallel sub-reads instead of
  * letting one task straggle. This spec builds a deliberately skewed
  * join (99% of rows on one key, thresholds lowered so the toy size
  * triggers) and asserts the executed plan marks the join skew=true —
  * plus result correctness under the rewrite. */
class AqeSkewSpec extends AnyFunSuite {
  import spark.implicits._

  test("a skewed sort-merge join is split by AQE and stays correct") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      // the groupBy AFTER the join reuses the join's hash partitioning;
      // splitting the skewed partition breaks that reuse, so AQE skips
      // the split unless told the extra shuffle is worth it — at real
      // scale it is (one straggler task vs one more exchange)
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val fact = spark.range(0, 200000)
        .select((when($"id" % 100 === 0, expr("(id div 100) % 50")).otherwise(lit(7L))).as("k"),
          $"id".as("payload"))
      val dim = spark.range(0, 50).select($"id".as("k"), ($"id" * 10).as("dv"))
      val joined = fact.join(dim, Seq("k")).groupBy($"k")
        .agg(count(lit(1)).as("n"), sum($"dv").as("s"))
      val rows = joined.collect() // materialize so AQE finalizes the plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE must mark the skewed join:\n$plan")
      // correctness under the split: key 7 carries ~99% of the fact
      // (198000 hot rows + its 40-row share of the spread keys)
      val n7 = rows.find(_.getLong(0) == 7L).map(_.getLong(1)).getOrElse(0L)
      assert(n7 == 198000L + 40L)
      assert(rows.map(_.getLong(1)).sum == 200000L)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
