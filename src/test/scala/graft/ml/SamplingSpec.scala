package graft.ml

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase.spark

class SamplingSpec extends AnyFunSuite {
  import spark.implicits._
  lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  test("training partitions scale with data volume, not a constant cap") {
    val perRow = 8L * 64 + 32 // 64-dim vectors
    val small = Classify.sizedPartitions(2000, perRow)
    assert(small == 1) // tiny data -> one partition (no treeAggregate barrier waste)
    val big = Classify.sizedPartitions(2000L * 1000, perRow)
    assert(big > small, s"10^3x rows should raise partitions, got $big")
    assert(Classify.sizedPartitions(2000L * 10000, perRow) > big) // keeps scaling
    assert(Classify.sizedPartitions(Long.MaxValue / perRow, perRow) == 10000) // sane cap
  }

  test("seeded sampling is reproducible and roughly sized") {
    val a = Sampling.uniform(emb, 0.3, seed = 7).select($"vec_id").as[Long].collect().toSet
    val b = Sampling.uniform(emb, 0.3, seed = 7).select($"vec_id").as[Long].collect().toSet
    assert(a == b)
    assert(math.abs(a.size - 150) < 60) // 30% of 500, loose Bernoulli bound
  }

  test("stratified sampling honors per-class fractions") {
    val s = Sampling.stratified(emb, "label", Map(0 -> 1.0, 1 -> 0.0), seed = 7)
    val labels = s.select($"label").distinct().as[Int].collect().toSet
    assert(labels.contains(0) && !labels.contains(1))
  }

  test("balanceClasses caps every class near the minority size") {
    val bal = Sampling.balanceClasses(emb, "label", seed = 7)
    val counts = bal.groupBy($"label").count().select($"count").as[Long].collect()
    val minOrig = emb.groupBy($"label").count().agg(min($"count")).head().getLong(0)
    assert(counts.forall(_ <= minOrig * 2)) // loose Bernoulli bound
  }
}
