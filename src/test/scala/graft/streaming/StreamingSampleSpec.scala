package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase.spark
import graft.ml.Sampling

/** Streaming twin of the weighted sampler: the bounded TopKPriority
  * aggregator holds k (priority, id) pairs per stratum — no watermark,
  * no unbounded state — and a complete-mode streaming groupBy converges
  * to exactly the batch sample, however the rows are split into
  * micro-batches. */
class StreamingSampleSpec extends AnyFunSuite {
  import spark.implicits._

  private val rows = (0L until 40L).map(i => (s"src${i % 3}", i, 20L + (i * 37) % 400))

  private def sample(df: org.apache.spark.sql.DataFrame) =
    df.groupBy($"source")
      .agg(Sampling.topKByPriority(5)(
        Sampling.priorityKey($"doc_id", $"n_chars"), $"doc_id").as("sample"))

  test("stream over two micro-batches == batch sample, with k pairs of state per stratum") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val q = sample(input.toDS().toDF("source", "doc_id", "n_chars"))
      .writeStream.format("memory").queryName("wsample_out")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    input.addData(rows.take(25): _*)
    q.processAllAvailable()
    q.awaitTermination()
    // second tranche: a NEW query run resumes from fresh state over the
    // full memory stream content (MemoryStream replays for AvailableNow)
    input.addData(rows.drop(25): _*)
    val q2 = sample(input.toDS().toDF("source", "doc_id", "n_chars"))
      .writeStream.format("memory").queryName("wsample_out2")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q2.processAllAvailable()
    q2.awaitTermination()
    val streamed = spark.table("wsample_out2")
      .as[(String, Seq[Long])].collect().toMap
    val batch = sample(rows.toDF("source", "doc_id", "n_chars"))
      .as[(String, Seq[Long])].collect().toMap
    assert(streamed == batch)
    assert(streamed.values.forall(_.size == 5))
  }

  test("aggregator merge is order-free and bounded") {
    val agg = new Sampling.TopKPriority(3)
    val xs = Seq((0.9, 1L), (0.5, 2L), (0.7, 3L), (0.99, 4L), (0.1, 5L))
    val left = xs.take(2).foldLeft(agg.zero)(agg.reduce)
    val right = xs.drop(2).foldLeft(agg.zero)(agg.reduce)
    val ab = agg.finish(agg.merge(left, right))
    val ba = agg.finish(agg.merge(right, left))
    val all = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
    assert(ab == ba && ab == all && ab == Seq(4L, 1L, 3L))
    assert(agg.merge(left, right).length <= 3)
  }
}
