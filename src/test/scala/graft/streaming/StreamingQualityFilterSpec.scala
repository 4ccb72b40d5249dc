package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase.spark

/** Streaming twin of the t_quality_filter KEEP/DROP stage: the SAME
  * `TextQueries.qualityFilterStage` transform (stateless, zero
  * Exchanges — every signal computed map-side per row, including the
  * row-wise repetition kernel) applied to an unbounded ingest stream
  * must emit row-for-row what the batch gate computes. This is the
  * ingest-time pre-filter a crawl pipeline runs BEFORE documents ever
  * land in the batch dedup passes.
  */
class StreamingQualityFilterSpec extends AnyFunSuite {
  import spark.implicits._

  test("stream verdicts equal batch verdicts row-for-row, all rules exercised") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      1L -> "the quick brown fox jumps over the lazy dog and runs far", // keep
      2L -> "too short", // len fail
      3L -> "spam spam spam spam spam spam spam spam spam spam", // rep + lang fail
      4L -> "w1 w2 w3 w4 w5 w6 w7 w8", // no lang marker -> und
      5L -> "")
    val withToks = (d: org.apache.spark.sql.DataFrame) =>
      graft.queries.TextQueries.qualityFilterStage(
        d.withColumn("toks", graft.text.TextOps.tokens($"text")))

    val batch = withToks(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap

    val input = MemoryStream[(Long, String)]
    val q = withToks(input.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("qf_out").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    input.addData(rows: _*)
    val run = q.start(); run.awaitTermination(60000)

    val streamed = spark.table("qf_out")
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(streamed == batch)
    // non-vacuity: the fixture must exercise keep AND every drop rule
    def flag(id: Long, i: Int) = batch(id)(i).asInstanceOf[Boolean]
    assert(flag(1L, 4)) // keep
    assert(!flag(2L, 0)) // len_ok fails
    assert(!flag(3L, 3) && !flag(3L, 2)) // rep_ok and lang_ok fail
    assert(!flag(4L, 2)) // lang_ok fails
    assert(!flag(5L, 4)) // empty doc dropped
  }
}
