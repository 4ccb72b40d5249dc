package graft.sim

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase.spark

class SimilaritySpec extends AnyFunSuite {
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"
  lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet").cache()

  test("brute-force top-k: self-similarity excluded, scores in [-1,1], k per query") {
    val topk = Similarity.bruteForceTopK(emb.where($"vec_id" < 5), emb, 3).cache()
    assert(topk.count() == 15)
    assert(topk.where($"qid" === $"cid").count() == 0)
    assert(topk.where(abs($"cos") > 1.0000001).count() == 0)
    // rank 1 really is the max
    val r1 = topk.where($"qid" === 0 && $"rank" === 1).select($"cos").head().getDouble(0)
    val mx = topk.where($"qid" === 0).agg(max($"cos")).head().getDouble(0)
    assert(r1 == mx)
  }

  test("IVF top-k: probing finds mostly the same neighbors as brute force") {
    val queries = emb.where($"vec_id" < 10)
    val brute = Similarity.bruteForceTopK(queries, emb, 3)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(queries, emb, 3, nlist = 4, nprobe = 2)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    assert(ivf.size == 30)
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall@3 too low: $recall")
  }

  test("sign-LSH bucket code is stable and bounded") {
    val b = emb.select(Similarity.signBucket($"embedding", 6).as("b"))
      .agg(min($"b"), max($"b")).head()
    assert(b.getLong(0) >= 0 && b.getLong(1) < 64)
  }
}
