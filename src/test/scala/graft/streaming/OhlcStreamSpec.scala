package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Streaming twin of the q_ohlc bars: the SAME aggregate expressions
  * (RelationalQueries.ohlcAggs — struct-min/max open/close with
  * event-id tie-breaks) under a watermarked event-time window must
  * equal the batch roll-up of the same rows, bar keys included, even
  * when the bar's events arrive across micro-batches. */
class OhlcStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("windowed streaming OHLC equals the batch bars across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      // user 1, bar 00: open=100 (earliest), high=500, low=50, close=50 (latest)
      (1L, t("2024-01-01 00:05:00"), 10L, 100L),
      (1L, t("2024-01-01 00:20:00"), 11L, 500L),
      (1L, t("2024-01-01 00:20:00"), 12L, 40L), // same ts: event_id breaks the tie
      (1L, t("2024-01-01 00:50:00"), 13L, 50L),
      // user 1, bar 01
      (1L, t("2024-01-01 01:10:00"), 14L, 70L),
      // user 2, bar 00
      (2L, t("2024-01-01 00:30:00"), 15L, 30L))
    val (first, second) = rows.splitAt(3) // bar 00 straddles the batches

    val input = MemoryStream[(Long, java.sql.Timestamp, Long, Long)]
    val aggs = graft.queries.RelationalQueries.ohlcAggs
    val streamed = input.toDS().toDF("user_id", "ts", "event_id", "c")
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), window(col("ts"), "1 hour").as("w"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("user_id"), col("w.start").as("bar"),
        col("n"), col("open_c"), col("high_c"), col("low_c"), col("close_c"))
    val q = streamed.writeStream.format("memory").queryName("ohlc_out")
      .outputMode("append").start()
    try {
      input.addData(first: _*); q.processAllAvailable()
      input.addData(second: _*); q.processAllAvailable()
      // advance the watermark far past every bar so all windows close
      input.addData((99L, t("2024-01-02 00:00:00"), 999L, 0L)); q.processAllAvailable()
      input.addData((98L, t("2024-01-03 00:00:00"), 998L, 0L)); q.processAllAvailable()

      val got = spark.table("ohlc_out").where($"user_id" < 90)
        .as[(Long, java.sql.Timestamp, Long, Long, Long, Long, Long)]
        .collect().toSet
      val batch = rows.toDF("user_id", "ts", "event_id", "c")
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("bar"))
        .agg(aggs.head, aggs.tail: _*)
        .select(col("user_id"), col("bar"),
          col("n"), col("open_c"), col("high_c"), col("low_c"), col("close_c"))
        .as[(Long, java.sql.Timestamp, Long, Long, Long, Long, Long)]
        .collect().toSet
      assert(got == batch, s"stream $got != batch $batch")
      // and the tie-break really bound: open of user-1 bar-00 is 100,
      // close is 50, high took the 500 spike, low the 40 same-ts row
      val bar0 = got.find(r => r._1 == 1L && r._2 == t("2024-01-01 00:00:00")).get
      assert(bar0 == ((1L, t("2024-01-01 00:00:00"), 4L, 100L, 500L, 40L, 50L)))
    } finally q.stop()
  }
}
