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

  test("stream chunk dedup drops repeated boilerplate windows, keeps fresh ones") {
    // the streaming stage of t_chunk_dedup: same TextOps.chunkTexts
    // expression, state bounded by the watermark — crawl pages share
    // headers (the shared window) but differ in bodies
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val header = (1 to 16).map(i => s"s$i").mkString(" ")
    val body1 = (1 to 16).map(i => s"p$i").mkString(" ")
    val body2 = (1 to 16).map(i => s"q$i").mkString(" ")
    val survivors = input.toDS().toDF("ts", "doc_id", "text")
      .select($"ts", $"doc_id",
        explode(graft.text.TextOps.chunkTexts(graft.text.TextOps.tokens($"text"), 16)).as("chunk"))
      .withColumn("h", graft.text.TextOps.h60($"chunk"))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("h")
    input.addData(
      (t("2024-01-01 00:00:01"), 1L, s"$header $body1"),
      (t("2024-01-01 00:00:02"), 2L, s"$header $body2")) // header repeats
    val q = survivors.writeStream.format("memory").queryName("chunk_dedup_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val perDoc = spark.table("chunk_dedup_out").groupBy($"doc_id").count()
      .as[(Long, Long)].collect().toMap
    // doc 1 keeps header+body; doc 2's header chunk is deduped away
    assert(perDoc == Map(1L -> 2L, 2L -> 1L))
  }

  test("stream repetition filter: the row-wise kernel scores docs statelessly in-flight") {
    // ingest-time quality filtering with TextOps.repetitionScores: a
    // plain per-row expression — no watermark, no state store — whose
    // batch twin (t_repetition_rowwise) hash-matches the SAME oracle
    // as the batch explode+groupBy plan
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val scored = input.toDS().toDF("doc_id", "text")
      .select($"doc_id",
        graft.text.TextOps.repetitionScores(graft.text.TextOps.tokens($"text")).as("r"))
      .select($"doc_id", $"r".getItem(0).as("top_bigram_frac"))
    input.addData(
      (1L, "spam spam spam spam spam"),  // 4/4 identical bigrams
      (2L, "the quick brown fox jumps"), // all bigrams unique
      (3L, "one"))                       // < 2 tokens -> 0.0
    val q = scored.writeStream.format("memory").queryName("rep_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val byDoc = spark.table("rep_out").as[(Long, Double)].collect().toMap
    assert(byDoc == Map(1L -> 1.0, 2L -> 0.25, 3L -> 0.0))
  }
}
