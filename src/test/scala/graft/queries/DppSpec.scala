package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase.spark

/** Dynamic partition pruning — the mechanism that makes star-schema
  * joins over partitioned fact tables scale: the dim side's filter is
  * turned into a runtime IN-subquery on the fact side's PARTITION
  * column, so the fact scan reads only matching directories instead of
  * the full table. At 100 TB fact / small dim this is the difference
  * between scanning one partition and scanning everything. The catalog
  * (LayerStore) gets the same effect statically from zoom/time
  * partition filters; this spec pins the DYNAMIC (join-driven) variant
  * on a plain partitioned parquet layout. */
class DppSpec extends AnyFunSuite {
  import spark.implicits._

  test("a selective dim filter prunes fact partitions at runtime") {
    val base = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .write.mode("overwrite").partitionBy("o_orderpriority").parquet(s"$base/fact")
    // dim must be a filterable SCAN for DPP to fire (a LocalRelation
    // has no selective predicate for the optimizer to reuse)
    Seq(("1-URGENT", "u"), ("5-LOW", "l")).toDF("prio", "tag")
      .write.mode("overwrite").parquet(s"$base/dim")

    val fact = spark.read.parquet(s"$base/fact")
    val dim = spark.read.parquet(s"$base/dim").where($"tag" === "u")
    val joined = fact.join(dim, fact("o_orderpriority") === dim("prio"))
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"fact scan must carry a dynamicpruning partition filter:\n$plan")

    // and the pruned result is the plain filtered answer
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .where($"o_orderpriority" === "1-URGENT")
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want && got.keySet == Set("1-URGENT"))
  }
}
