package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase.spark
import graft.streaming.AnomalyStream.ValueEvent

/** Stream == batch for the rolling z-score monitor: the same crafted
  * event set goes through AdvancedQueries.anomaly (batch window query)
  * and AnomalyStream.anomalies (flatMapGroupsWithState), split across
  * micro-batches mid-stream; every emitted row must match bitwise. */
class StreamingAnomalySpec extends AnyFunSuite {
  import spark.implicits._

  test("streaming anomalies equal the batch query across micro-batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    // two users: one quiet series with a spike, one noisy series.
    // values have exactly 2 decimals (the events fixture contract).
    val events = (0 until 40).map { i =>
      val v = if (i == 30) 99.00 else 10.00 + (i % 3) * 0.50
      (i.toLong, 1L, 1704067200000000L + i * 60000000L, v)
    } ++ (0 until 40).map { i =>
      (100L + i, 2L, 1704067200000000L + i * 60000000L, (i * 37 % 11) * 1.25)
    }

    // batch side: a testdata-shaped dir the registry query reads
    val dir = java.nio.file.Files.createTempDirectory("graft_anom").toString
    events.toDF("event_id", "user_id", "ts_us", "value")
      .select($"event_id", org.apache.spark.sql.functions.timestamp_micros($"ts_us").as("ts"),
        $"user_id", org.apache.spark.sql.functions.lit("view").as("event_type"),
        $"value", org.apache.spark.sql.functions.lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.queries.AdvancedQueries.anomaly(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5))).toSet
    assert(batch.nonEmpty && batch.exists(_._6), "fixture must produce at least one anomaly")

    // stream side: same rows, split mid-series across two micro-batches
    val input = MemoryStream[ValueEvent]
    val out = AnomalyStream.anomalies(input.toDS())
    // ONE continuous query: state must survive the micro-batch boundary
    val q = out.writeStream.format("memory").queryName("anom_out")
      .outputMode("append").start()
    val (first, second) = events.sortBy(e => (e._3, e._1)).splitAt(45)
    input.addData(first.map(e => ValueEvent(e._1, e._2, e._3, e._4)): _*)
    q.processAllAvailable()
    input.addData(second.map(e => ValueEvent(e._1, e._2, e._3, e._4)): _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("anom_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5))).toSet
    assert(streamed == batch)
  }
}
