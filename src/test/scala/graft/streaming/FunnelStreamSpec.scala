package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase.spark
import graft.streaming.FunnelStream.FunnelEvent

/** Stream == batch for the conversion funnel: the real sf0.001 events
  * table goes through RelationalQueries.funnel (window query) and
  * FunnelStream.funnel (stateful single pass), split across
  * micro-batches; the latest emission per user must equal the batch
  * row exactly. */
class FunnelStreamSpec extends AnyFunSuite {
  import spark.implicits._

  test("latest streamed funnel state per user equals the batch funnel on real events") {
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val batch = graft.queries.RelationalQueries.funnel(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getInt(4)))).toMap

    val evts = graft.queries.Fixtures.events(spark, sf)
      .select($"event_id", $"user_id",
        org.apache.spark.sql.functions.unix_micros($"ts").as("ts_us"), $"event_type")
      .as[FunnelEvent].collect().sortBy(e => (e.ts_us, e.event_id))

    val input = MemoryStream[FunnelEvent]
    val q = FunnelStream.funnel(input.toDS())
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    val (a, b) = evts.splitAt(evts.length / 2)
    input.addData(a.toIndexedSeq: _*); q.processAllAvailable()
    input.addData(b.toIndexedSeq: _*); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("funnel_out")
      .collect().map(r => (r.getLong(0), (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
        r.getInt(4), r.getLong(5))))
      .groupBy(_._1).map { case (u, rows) =>
        val last = rows.maxBy(_._2._5)._2
        u -> ((last._1, last._2, last._3, last._4))
      }
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (u, s) => assert(s == batch(u), s"user $u") }
  }
}
