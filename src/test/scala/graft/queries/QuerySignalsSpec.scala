package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Exact-value and invariant checks for the round-5 quality-signal
  * queries, beyond their DuckDB hash gates: crafted corpora with
  * hand-computed answers for the repetition and chunk-dedup signals,
  * structural invariants (error bounds, completeness) for the
  * quantization census and the centroid classifier.
  */
class QuerySignalsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Write a crafted `documents` table into a temp dir shaped like a
    * testdata sf dir, so the registry queries run on it unchanged. */
  private def docsDir(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_docs").toString
    rows.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("repetition: hand-computed degenerate vs varied doc") {
    // doc 0: "a b a b a b" -> bigrams [a b, b a, a b, b a, a b]: top 3/5
    //        trigrams [a b a, b a b, a b a, b a b]: all repeated -> 1.0
    // doc 1: all-distinct grams -> top bigram 1/4, dup trigrams 0.0
    val dir = docsDir(Seq(0L -> "a b a b a b", 1L -> "v w x y z"))
    val out = TextQueries.repetition(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out(0L) == ((3.0 / 5.0, 1.0)))
    assert(out(1L) == ((1.0 / 4.0, 0.0)))
  }

  test("chunk dedup: a shared 16-token window is flagged in both docs") {
    val shared = (1 to 16).map(i => s"s$i").mkString(" ")
    val u1 = (1 to 16).map(i => s"p$i").mkString(" ")
    val u2 = (1 to 16).map(i => s"q$i").mkString(" ")
    // both docs: [shared chunk, unique chunk] -> 2 chunks, 1 shared
    val dir = docsDir(Seq(0L -> s"$shared $u1", 1L -> s"$shared $u2"))
    val out = TextQueries.chunkDedup(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(0L) == ((2L, 1L, 0.5)) && out(1L) == ((2L, 1L, 0.5)))
  }

  private val Sf = "/root/testdata/sf0.001"

  test("quantize census: per-element error bound and guaranteed saturation") {
    val rows = SimQueries.quantizeErr(spark, Sf)
      .select($"amax", $"mean_abs_err", $"n_sat").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (amax, err, sat) = (r.getDouble(0), r.getDouble(1), r.getInt(2))
      // |x - recon| <= scale/2 per element with scale = amax/127
      assert(err <= amax / 254.0 + 1e-12, s"err $err exceeds bound for amax $amax")
      // the element attaining amax quantizes to exactly +-127
      assert(sat >= 1)
    }
  }

  test("centroid classifier: complete partition of the test split over real classes") {
    val e = spark.read.parquet(s"$Sf/embeddings.parquet")
    val labels = e.select($"label".cast("long")).distinct().as[Long].collect().toSet
    val cm = SimQueries.centroidConfusion(spark, Sf)
      .select($"label".cast("long"), $"pred".cast("long"), $"n").collect()
    assert(cm.forall(r => labels.contains(r.getLong(0)) && labels.contains(r.getLong(1))))
    val nTest = e.where(graft.text.TextOps.hashBucket($"vec_id", 10) === 9).count()
    assert(cm.map(_.getLong(2)).sum == nTest, "every test row classified exactly once")
  }
}
