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

  /** Driver-side twin of [[Sampling.priorityKey]]: the exact E-S math
    * off java MD5, so the Column expression can't drift silently. */
  private def priorityRef(id: Long, w: Double): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    val h = java.lang.Long.parseLong(hex, 16)
    // StrictMath, not Math: Spark's Log expression evaluates via
    // StrictMath.log for platform-independent plans
    StrictMath.log((h + 1).toDouble / 1.152921504606846976e18) / w
  }

  test("priorityKey matches the driver-side E-S formula bit-for-bit") {
    val rows = Seq((1L, 10.0), (2L, 10.0), (42L, 250.0), (9999L, 3.0))
    val got = rows.toDF("id", "w")
      .select($"id", $"w", Sampling.priorityKey($"id", $"w").as("p"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    rows.foreach { case (id, w) =>
      assert(got((id, w)) == priorityRef(id, w), s"drift at id=$id w=$w")
    }
  }

  test("priorityKey favors heavier rows: same hash, higher weight, higher key") {
    val p1 = priorityRef(7L, 1.0)
    val p10 = priorityRef(7L, 10.0)
    assert(p10 > p1) // ln(u) < 0, so a larger weight pulls the key toward 0
  }
}
