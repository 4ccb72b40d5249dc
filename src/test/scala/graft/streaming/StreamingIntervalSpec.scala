package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase.spark
import graft.streaming.IntervalStream.{Claim, Island}

/** Stream == batch for the interval-union sweep: the same claim set
  * goes through AdvancedQueries.intervalMerge (batch windows) and
  * IntervalStream.mergedIslands (flatMapGroupsWithState), split
  * across micro-batches mid-island; the closed islands' per-user
  * rollup must equal the gate's output exactly. A far-future sentinel
  * claim per user closes each final island on the stream side only
  * (its own island stays open and unemitted). */
class StreamingIntervalSpec extends AnyFunSuite {
  import spark.implicits._

  test("streaming islands roll up to the batch gate across micro-batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val Span = 300000000L // 5 min, the gate's claim span
    val t0 = 1704067200000000L
    // user 1: two islands (chain of overlaps, then a gap); user 2: three
    // islands including a single-claim island and a start-tie pair
    val events = Seq(
      (1L, 1L, t0), (2L, 1L, t0 + Span / 2), (3L, 1L, t0 + Span),
      (4L, 1L, t0 + 3 * Span),
      (10L, 2L, t0), (11L, 2L, t0 + 2 * Span),
      (12L, 2L, t0 + 2 * Span), // start tie
      (13L, 2L, t0 + 6 * Span))

    val dir = java.nio.file.Files.createTempDirectory("graft_interval").toString
    events.toDF("event_id", "user_id", "ts_us")
      .select($"event_id", org.apache.spark.sql.functions.timestamp_micros($"ts_us").as("ts"),
        $"user_id", org.apache.spark.sql.functions.lit("view").as("event_type"),
        org.apache.spark.sql.functions.lit(1.00).as("value"),
        org.apache.spark.sql.functions.lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.queries.AdvancedQueries.intervalMerge(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch == Set((1L, 2L, 3 * Span), (2L, 3L, 3 * Span)),
      s"fixture sanity: $batch")

    val sentinels = Seq((900L, 1L, t0 + 1000 * Span), (901L, 2L, t0 + 1000 * Span))
    val claims = (events ++ sentinels).sortBy(c => (c._3, c._1))
      .map(c => Claim(c._2, c._1, c._3, c._3 + Span))
    val input = MemoryStream[Claim]
    val q = IntervalStream.mergedIslands(input.toDS())
      .writeStream.format("memory").queryName("island_out")
      .outputMode("append").start()
    val (first, rest) = claims.splitAt(3) // split mid-island for user 1
    input.addData(first: _*)
    q.processAllAvailable()
    val (second, third) = rest.splitAt(4)
    input.addData(second: _*)
    q.processAllAvailable()
    input.addData(third: _*)
    q.processAllAvailable()
    q.stop()

    val islands = spark.table("island_out").as[Island].collect()
    val rollup = islands.groupBy(_.user_id)
      .map { case (u, is) => (u, is.length.toLong, is.map(_.covered_us).sum) }.toSet
    assert(rollup == batch,
      s"closed streaming islands must roll up to the gate: $rollup vs $batch")
  }
}
