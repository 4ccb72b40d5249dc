package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase.spark
import graft.streaming.TransitionStream.TEvent

/** Stream == batch for the event-transition matrix: the real sf0.001
  * events go through RelationalQueries.eventTransitions (lead window)
  * and TransitionStream.transitions (stateful single pass) split
  * across micro-batches; the aggregated transition counts must be
  * identical — including pairs that STRADDLE the micro-batch boundary
  * (the state carries the last event across). */
class TransitionStreamSpec extends AnyFunSuite {
  import spark.implicits._

  test("streamed transition counts equal the batch lead-window matrix on real events") {
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val batch = graft.queries.RelationalQueries.eventTransitions(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap

    val evts = graft.queries.Fixtures.events(spark, sf)
      .select($"event_id", $"user_id",
        org.apache.spark.sql.functions.unix_micros($"ts").as("ts_us"), $"event_type")
      .as[TEvent].collect().sortBy(e => (e.ts_us, e.event_id))

    val input = MemoryStream[TEvent]
    val q = TransitionStream.transitions(input.toDS())
      .writeStream.format("memory").queryName("trans_out")
      .outputMode("append").start()
    val (a, b) = evts.splitAt(evts.length / 2)
    input.addData(a.toIndexedSeq: _*); q.processAllAvailable()
    input.addData(b.toIndexedSeq: _*); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("trans_out")
      .groupBy($"from_type", $"to_type")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.count_distinct($"user_id").as("n_users"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap

    assert(streamed == batch)
  }
}
