package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase.spark

/** Streaming MODEL SERVING: score an unbounded document stream against
  * the trained Naive Bayes model (TextQueries.nbModel / nbScore — the
  * m_naive_bayes gate's exact arithmetic) via foreachBatch. Scoring is
  * per-document, so micro-batch boundaries cannot change any verdict —
  * the spec streams the test docs in TWO batches and proves the
  * accumulated predictions equal the one-shot batch scorer's,
  * prediction for prediction. This is the standard serve shape: model
  * frames stay static (broadcast into every micro-batch's join), the
  * stream only carries documents.
  */
class StreamingNbSpec extends AnyFunSuite {
  import spark.implicits._

  test("foreachBatch NB scoring equals the batch scorer across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val train = Seq(
      ("sports", "ball game win team ball score"),
      ("sports", "team game play ball"),
      ("cooking", "salt pan stir salt oil"),
      ("cooking", "oil pan heat stir"))
      .toDF("source", "text")
      .select(col("source"), graft.text.TextOps.tokens(col("text")).as("toks"))
    val (consts, lnc) = graft.queries.TextQueries.nbModel(train)

    val testDocs = Seq(
      (1L, "ball team score"), // sports
      (2L, "salt oil pan"), // cooking
      (3L, "play heat"), // mixed
      (4L, "zzz unseen tokens only"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), graft.text.TextOps.tokens(col("text")).as("toks"))
    val expected = graft.queries.TextQueries.nbScore(testDocs, consts, lnc)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(expected(1L) == "sports" && expected(2L) == "cooking")

    val input = MemoryStream[(Long, String)]
    val scored = scala.collection.mutable.Map.empty[Long, String]
    val q = input.toDS().toDF("doc_id", "text")
      .select(col("doc_id"), graft.text.TextOps.tokens(col("text")).as("toks"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.queries.TextQueries.nbScore(batch, consts, lnc)
          .collect().foreach(r => scored.synchronized {
            scored.update(r.getLong(0), r.getString(1))
          })
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    input.addData(1L -> "ball team score", 2L -> "salt oil pan")
    val r1 = q.start(); r1.awaitTermination(60000)
    input.addData(3L -> "play heat", 4L -> "zzz unseen tokens only")
    val r2 = q.start(); r2.awaitTermination(60000)

    assert(scored.toMap == expected)
  }
}
