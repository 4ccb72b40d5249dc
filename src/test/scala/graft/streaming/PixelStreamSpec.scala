package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase.spark
import graft.streaming.PixelStream._

class PixelStreamSpec extends AnyFunSuite {
  import spark.implicits._

  test("wire codec round-trips keyed labeled pixels") {
    val df = Seq(
      (1.0, Seq(0.5, 2.25, -3.0), 3, 7, 12, 200),
      (0.0, Seq(9.0), 0, 0, 0, 0))
      .toDF("label", "features", "tile_col", "tile_row", "px", "py")
    val encoded = df.select(encodeWire($"label", $"features", $"tile_col", $"tile_row", $"px", $"py").as("value"))
    val wire = encoded.as[String].collect()
    assert(wire(0) == "1.0;0.5;2.25;-3.0;SpatialKey(3,7);12;200")
    val back = encoded.select(decodeWire($"value").as("d")).select($"d.*")
    val r = back.where($"tile_col" === 3).head()
    assert(r.getAs[Double]("label") == 1.0)
    assert(r.getAs[scala.collection.Seq[Double]]("features").toSeq == Seq(0.5, 2.25, -3.0))
    assert(r.getAs[Int]("px") == 12 && r.getAs[Int]("py") == 200)
  }

  test("streaming reassembly emits complete tiles (memory source)") {
    implicit val sqlCtx = spark.sqlContext
    val ts = 2
    val input = MemoryStream[PixelEvent]
    val out = reassemble(input.toDS(), ts, ts, timeoutMs = 0)
    val q = out.writeStream.format("memory").queryName("tiles_out")
      .outputMode("append").start()
    try {
      // tile (0,0): all 4 pixels over two batches; tile (9,9): 1 pixel only
      input.addData(PixelEvent(0, 0, 0, 0, 1.0), PixelEvent(0, 0, 1, 0, 2.0),
        PixelEvent(9, 9, 0, 0, 42.0))
      q.processAllAvailable()
      input.addData(PixelEvent(0, 0, 0, 1, 3.0), PixelEvent(0, 0, 1, 1, 4.0))
      q.processAllAvailable()
      val rows = spark.table("tiles_out").collect()
      assert(rows.length == 1) // only the complete tile emitted; (9,9) still pending
      val r = rows.head
      assert(r.getAs[Int]("tile_col") == 0 && r.getAs[Boolean]("complete"))
      assert(r.getAs[scala.collection.Seq[Double]]("cells").toSeq == Seq(1.0, 2.0, 3.0, 4.0))
    } finally q.stop()
  }

  test("stream-static enrichment join broadcasts the dimension per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PixelEvent]
    val dim = Seq((0, "core"), (9, "edge")).toDF("tile_col", "zone")
    val q = enrich(input.toDS().toDF(), dim, Seq("tile_col"))
      .writeStream.format("memory").queryName("enriched_out")
      .outputMode("append").start()
    try {
      input.addData(PixelEvent(0, 0, 0, 0, 1.0), PixelEvent(9, 9, 1, 1, 2.0),
        PixelEvent(5, 5, 0, 0, 3.0)) // 5 has no dim row: inner join drops it
      q.processAllAvailable()
      val rows = spark.table("enriched_out")
        .select($"tile_col", $"zone").as[(Int, String)].collect().toSet
      assert(rows == Set((0, "core"), (9, "edge")))
    } finally q.stop()
  }

  test("windowed counts with watermark run on a streamed events table") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDS().toDF("ts", "event_type", "value")
    val q = windowedCounts(events).writeStream
      .format("memory").queryName("win_out").outputMode("append").start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      input.addData(
        (t("2024-01-01 00:01:00"), "click", 1.5),
        (t("2024-01-01 00:02:00"), "click", 2.5),
        (t("2024-01-01 00:07:00"), "view", 1.0))
      q.processAllAvailable()
      // advance event time far enough to close the first windows
      input.addData((t("2024-01-01 01:00:00"), "click", 9.0))
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select($"event_type", $"n", $"sum_value").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains(("click", 2L, 4.0)))
      assert(rows.contains(("view", 1L, 1.0)))
    } finally q.stop()
  }

  test("sliding windows stream: one event lands in two windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDS().toDF("ts", "event_type", "value")
    val q = slidingCounts(events).writeStream
      .format("memory").queryName("slide_out").outputMode("append").start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      input.addData((t("2024-01-01 00:07:00"), "click", 1.0))
      q.processAllAvailable()
      input.addData((t("2024-01-01 01:00:00"), "click", 9.0)) // advance watermark
      q.processAllAvailable()
      val wins = spark.table("slide_out").where($"event_type" === "click" && $"n" === 1)
        .select($"win_start").collect().map(_.getTimestamp(0).toString).toSet
      // 00:07 falls in [00:00,00:10) and [00:05,00:15)
      assert(wins == Set("2024-01-01 00:00:00.0", "2024-01-01 00:05:00.0"))
    } finally q.stop()
  }

  test("session windows stream: gap closes a session at the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val events = input.toDS().toDF("ts", "user_id", "value")
    val q = sessionCounts(events).writeStream
      .format("memory").queryName("sess_out").outputMode("append").start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      input.addData(
        (t("2024-01-01 00:01:00"), 7L, 1.0),
        (t("2024-01-01 00:05:00"), 7L, 1.0), // same session (gap 10m)
        (t("2024-01-01 00:30:00"), 7L, 1.0)) // new session
      q.processAllAvailable()
      input.addData((t("2024-01-01 02:00:00"), 8L, 1.0)) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("sess_out").where($"user_id" === 7L)
        .select($"sess_start", $"n_events").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSet
      assert(rows == Set(("2024-01-01 00:01:00.0", 2L), ("2024-01-01 00:30:00.0", 1L)))
    } finally q.stop()
  }

  test("stream-stream interval join matches keys within the event-time window") {
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val lhs = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val rhs = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val joined = intervalJoin(
      lhs.toDS().toDF("user_id", "ts", "value"),
      rhs.toDS().toDF("user_id", "ts", "value"), key = "user_id")
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      lhs.addData((1L, t("2024-01-01 00:10:00"), 1.0))
      rhs.addData(
        (1L, t("2024-01-01 00:12:00"), 2.0), // within 5 min -> joins
        (1L, t("2024-01-01 00:20:00"), 3.0), // outside interval -> no
        (2L, t("2024-01-01 00:10:00"), 4.0)) // other key -> no
      q.processAllAvailable()
      val rows = spark.table("ssj_out").select($"user_id", $"value", $"r_value")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
      assert(rows == Set((1L, 1.0, 2.0)))
    } finally q.stop()
  }

  test("left-outer interval join emits the unmatched row with nulls after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val lhs = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val rhs = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val joined = intervalJoin(
      lhs.toDS().toDF("user_id", "ts", "value"),
      rhs.toDS().toDF("user_id", "ts", "value"),
      key = "user_id", joinType = "leftOuter")
    val q = joined.writeStream.format("memory").queryName("ssj_outer_out")
      .outputMode("append").start()
    try {
      lhs.addData(
        (1L, t("2024-01-01 00:10:00"), 1.0), // will match
        (3L, t("2024-01-01 00:10:00"), 9.0)) // never matches
      rhs.addData((1L, t("2024-01-01 00:12:00"), 2.0))
      q.processAllAvailable()
      // push both watermarks far past ts + interval so the null row fires
      lhs.addData((99L, t("2024-01-01 03:00:00"), 0.0))
      rhs.addData((99L, t("2024-01-01 03:00:00"), 0.0))
      q.processAllAvailable()
      lhs.addData((98L, t("2024-01-01 06:00:00"), 0.0))
      rhs.addData((98L, t("2024-01-01 06:00:00"), 0.0))
      q.processAllAvailable()
      val rows = spark.table("ssj_outer_out").where($"user_id" <= 3L)
        .select($"user_id", $"value", $"r_value")
        .collect().map(r => (r.getLong(0), r.getDouble(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
      assert(rows == Set((1L, 1.0, Some(2.0)), (3L, 9.0, None)),
        s"got $rows")
    } finally q.stop()
  }

  test("reassemble emits the partial tile with NaN holes after a wall-clock timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PixelEvent]
    val tiles = reassemble(input.toDS(), 2, 2, timeoutMs = 500).toDF()
    val q = tiles.writeStream.format("memory").queryName("timeout_tiles")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("250 milliseconds"))
      .start()
    try {
      // 3 of 4 cells: the tile can never complete, only time out
      input.addData(PixelEvent(0, 0, 0, 0, 1.0), PixelEvent(0, 0, 1, 0, 2.0),
        PixelEvent(0, 0, 0, 1, 3.0))
      var rows = Array.empty[org.apache.spark.sql.Row]
      val deadline = System.currentTimeMillis + 60000
      while (rows.isEmpty && System.currentTimeMillis < deadline) {
        Thread.sleep(200)
        rows = spark.sql("SELECT * FROM timeout_tiles").collect()
      }
      assert(rows.nonEmpty, "partial tile was not emitted after the processing-time timeout")
      val r = rows.head
      assert(r.getAs[Int]("tile_col") == 0 && r.getAs[Int]("tile_row") == 0)
      assert(!r.getAs[Boolean]("complete"))
      val cells = r.getSeq[Double](2)
      assert(cells(0) == 1.0 && cells(1) == 2.0 && cells(2) == 3.0 && cells(3).isNaN)
    } finally q.stop()
  }
}
