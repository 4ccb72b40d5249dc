package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase.spark

/** Streaming twin of the dedup family: exact dedup over an unbounded
  * document stream with bounded state via watermark
  * (dropDuplicatesWithinWatermark) — the shape an LLM-ingest pipeline
  * runs in front of the batch near-dup passes. */
class StreamingDedupSpec extends AnyFunSuite {
  import spark.implicits._

  test("stream dedup drops repeated content hashes within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val deduped = input.toDS().toDF("ts", "doc_id", "text")
      .withColumn("content_hash", md5($"text".cast("binary")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("content_hash")
    input.addData(
      (t("2024-01-01 00:00:01"), 1L, "alpha beta"),
      (t("2024-01-01 00:00:02"), 2L, "alpha beta"), // dup content
      (t("2024-01-01 00:00:03"), 3L, "gamma delta"),
      (t("2024-01-01 00:01:00"), 4L, "alpha beta")) // still within watermark
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val kept = spark.table("dedup_out").select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }
}
