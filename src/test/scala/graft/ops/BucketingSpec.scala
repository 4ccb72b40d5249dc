package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase.spark

class BucketingSpec extends AnyFunSuite {
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.toString
      .linesIterator.count(l => l.contains("Exchange") && !l.contains("Broadcast"))

  test("same-bucketed tables join with zero shuffles; plain tables pay two") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_orderkey", $"l_quantity")
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_orderkey".as("l_orderkey"), $"o_totalprice")
    Bucketing.writeBucketed(li, "b_lineitem", "l_orderkey", 8)
    Bucketing.writeBucketed(o, "b_orders", "l_orderkey", 8)

    val bucketed = Bucketing.bucketedJoin(spark, "b_lineitem", "b_orders", "l_orderkey")
    assert(shuffleCount(bucketed) == 0,
      "co-bucketed join must not exchange:\n" + bucketed.queryExecution.executedPlan)

    val plain = li.join(o.hint("merge"), "l_orderkey")
    assert(shuffleCount(plain) >= 2, "unbucketed merge join should shuffle both sides")

    // identical results (same rows, same aggregate over them)
    val agg = (df: org.apache.spark.sql.DataFrame) =>
      df.agg(count(lit(1)), sum($"l_quantity").cast("decimal(20,2)"),
        sum($"o_totalprice").cast("decimal(20,2)")).head.toSeq
    assert(agg(bucketed) == agg(plain) && bucketed.count() > 0)
  }

  test("bucket-key aggregation also skips the exchange") {
    val byKey = spark.table("b_lineitem")
      .groupBy($"l_orderkey").agg(sum($"l_quantity").as("q"))
    assert(shuffleCount(byKey) == 0,
      "groupBy on the bucket key must reuse the layout:\n" + byKey.queryExecution.executedPlan)
  }
}
