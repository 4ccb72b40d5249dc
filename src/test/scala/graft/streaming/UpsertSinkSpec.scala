package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase.spark
import graft.streaming.PixelStream._

/** K2-streaming: micro-batches of reassembled tiles merged into the
  * catalog via foreachBatch (SURVEY §2.8 "layer upsert sink"). */
class UpsertSinkSpec extends AnyFunSuite {
  import spark.implicits._

  test("streaming tiles upsert into the layer store per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val ts = 2
    val root = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val store = new graft.catalog.LayerStore(spark, root)
    val input = MemoryStream[PixelEvent]
    val tiles = reassemble(input.toDS(), ts, ts, timeoutMs = 0).toDF()
    input.addData(
      PixelEvent(0, 0, 0, 0, 1.0), PixelEvent(0, 0, 1, 0, 2.0),
      PixelEvent(0, 0, 0, 1, 3.0), PixelEvent(0, 0, 1, 1, 4.0),
      PixelEvent(1, 1, 0, 0, 9.0), PixelEvent(1, 1, 1, 0, 9.0),
      PixelEvent(1, 1, 0, 1, 9.0), PixelEvent(1, 1, 1, 1, 9.0))
    val q = upsertSink(tiles, store, "live", 4)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    assert(store.exists("live", 4))
    val cells = store.readTile("live", 4, 0, 0).select($"cells").as[Seq[Double]].head()
    assert(cells == Seq(1.0, 2.0, 3.0, 4.0))
    assert(store.read("live", 4).count() == 2)

    // second stream run: overwrite tile (0,0) -> incoming wins
    val input2 = MemoryStream[PixelEvent]
    val tiles2 = reassemble(input2.toDS(), ts, ts, timeoutMs = 0).toDF()
    input2.addData(
      PixelEvent(0, 0, 0, 0, 7.0), PixelEvent(0, 0, 1, 0, 7.0),
      PixelEvent(0, 0, 0, 1, 7.0), PixelEvent(0, 0, 1, 1, 7.0))
    val q2 = upsertSink(tiles2, store, "live", 4)
      .option("checkpointLocation", root + "/ckpt2")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q2.awaitTermination(60000)
    val merged = store.readTile("live", 4, 0, 0).select($"cells").as[Seq[Double]].head()
    assert(merged == Seq(7.0, 7.0, 7.0, 7.0))
    assert(store.read("live", 4).count() == 2) // tile (1,1) survived the merge
  }
}
