package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.core.TileMath

/** Structured Streaming surface (SURVEY §2.8): the reference's intended
  * "pixel stream through Kafka" topology (WorkflowExample.scala:153-162,
  * UtilsKafka.scala:18-34) rebuilt on readStream/writeStream.
  *
  *  - wire codec: `label;f1;...;fn;SpatialKey(c,r);x;y`
  *    (UtilsSVM.scala:170-191) as pure Column expressions, usable as a
  *    Kafka `value` payload;
  *  - tile reassembly of a classified pixel stream = the A3 aggregation
  *    as flatMapGroupsWithState: emit a tile when all its pixels arrived
  *    or when the state times out (emit-partial-on-timeout — the
  *    reference never defined a late-data policy, we do);
  *  - upsert sink: foreachBatch into LayerStore.merge (K2).
  */
object PixelStream {

  // -------------------------------------------------------------------
  // Wire codec (P10)
  // -------------------------------------------------------------------

  /** Encode (label, features, tile_col, tile_row, px, py) to the
    * reference's CSV wire string. */
  def encodeWire(label: Column, features: Column, tileCol: Column, tileRow: Column,
                 x: Column, y: Column): Column =
    concat_ws(";",
      label.cast("string"),
      concat_ws(";", transform(features, f => f.cast("string"))),
      concat(lit("SpatialKey("), tileCol.cast("string"), lit(","), tileRow.cast("string"), lit(")")),
      x.cast("string"), y.cast("string"))

  /** Decode the wire string back to typed columns. */
  def decodeWire(value: Column): Column = {
    val parts = split(value, ";")
    val n = size(parts)
    struct(
      element_at(parts, 1).cast("double").as("label"),
      slice(parts, lit(2), n - lit(4)).cast("array<double>").as("features"),
      regexp_extract(element_at(parts, -3), "SpatialKey\\((\\d+),(\\d+)\\)", 1).cast("int").as("tile_col"),
      regexp_extract(element_at(parts, -3), "SpatialKey\\((\\d+),(\\d+)\\)", 2).cast("int").as("tile_row"),
      element_at(parts, -2).cast("int").as("px"),
      element_at(parts, -1).cast("int").as("py"))
  }

  // -------------------------------------------------------------------
  // Stateful tile reassembly (A3 streaming)
  // -------------------------------------------------------------------

  case class PixelEvent(tile_col: Int, tile_row: Int, px: Int, py: Int, v: Double)
  case class TileState(cells: Array[Double], filled: Int)
  case class TileOut(tile_col: Int, tile_row: Int, cells: Seq[Double], complete: Boolean)

  /** Reassemble tiles from a pixel stream. Emits a tile as soon as all
    * cols*rows cells arrived; on processing-time timeout emits the
    * partial tile (NaN holes), reproducing a bounded-late policy.
    * timeoutMs <= 0 disables the timeout (complete-tiles-only mode —
    * also what synchronous tests use, since pending processing-time
    * timeouts keep scheduling micro-batches). */
  def reassemble(pixels: Dataset[PixelEvent], cols: Int, rows: Int,
                 timeoutMs: Long = 30000): Dataset[TileOut] = {
    import pixels.sparkSession.implicits._
    val timeoutConf =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    pixels
      .groupByKey(p => (p.tile_col, p.tile_row))
      .flatMapGroupsWithState[TileState, TileOut](
        OutputMode.Append, timeoutConf) {
        case ((tc, tr), events, state: GroupState[TileState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(TileOut(tc, tr, st.cells.toSeq, complete = false))
          } else {
            val st = state.getOption.getOrElse(TileState(TileMath.empty(cols, rows), 0))
            var filled = st.filled
            events.foreach { p =>
              val i = p.px + p.py * cols
              if (i >= 0 && i < st.cells.length && TileMath.isData(p.v)) {
                if (!TileMath.isData(st.cells(i))) filled += 1
                st.cells(i) = p.v
              }
            }
            if (filled >= cols * rows) {
              state.remove()
              Iterator.single(TileOut(tc, tr, st.cells.toSeq, complete = true))
            } else {
              state.update(TileState(st.cells, filled))
              if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
              Iterator.empty
            }
          }
      }
  }

  // -------------------------------------------------------------------
  // Windowed event aggregation (the events-table streaming shape)
  // -------------------------------------------------------------------

  /** Tumbling event-time window aggregation with watermark — the
    * streaming twin of RelationalQueries.tumblingWindow. */
  def windowedCounts(events: DataFrame, watermark: String = "10 minutes",
                     window: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding event-time windows (streaming twin of
    * RelationalQueries.slidingWindow): each event lands in
    * length/slide windows; state is watermark-bounded. */
  def slidingCounts(events: DataFrame, watermark: String = "10 minutes",
                    window: String = "10 minutes", slide: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))

  /** Session windows per user (streaming twin of
    * RelationalQueries.sessionWindows): gap-based session_window state,
    * closed and emitted once the watermark passes the gap. */
  def sessionCounts(events: DataFrame, watermark: String = "10 minutes",
                    gap: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("sess_start"), col("n_events"))

  /** Stream-static enrichment join — the per-event dimension lookup an
    * ingest path needs (tile → zone, sensor → calibration). Stateless:
    * the static side is re-resolved and broadcast per micro-batch, so
    * a dimension refresh on disk is picked up by the next batch and no
    * watermark or join state accumulates. Works identically on batch
    * frames (the broadcast hash join is the same plan). */
  def enrich(stream: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys)

  /** Stream-stream interval join: enrich a pixel/event stream with a
    * second stream keyed the same way, matching within a bounded
    * event-time interval. Both sides carry watermarks, so join state is
    * purged once the watermark passes the interval — the unbounded-state
    * trap of naive stream joins is structurally impossible here. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   watermark: String = "10 minutes",
                   interval: String = "5 minutes",
                   joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
    val r = right.select(col(key).as("r_key"), col("ts").as("r_ts"),
      col("value").as("r_value")).withWatermark("r_ts", watermark)
    // leftOuter is legal in streaming because BOTH sides carry a
    // watermark and the condition time-bounds r_ts against ts: unmatched
    // left rows emit with nulls once the right watermark passes
    // ts + interval (Structured Streaming's outer interval-join rule).
    l.join(r,
      col(key) === col("r_key") &&
        col("r_ts") >= col("ts") - expr(s"INTERVAL $interval") &&
        col("r_ts") <= col("ts") + expr(s"INTERVAL $interval"),
      joinType)
      .drop("r_key")
  }

  // -------------------------------------------------------------------
  // Kafka topology (K9)
  // -------------------------------------------------------------------

  /** K9 source: the reference's Kafka pixel topic (UtilsKafka.scala:18-34,
    * WorkflowExample.scala:153-162) as a readStream. Uses the string-based
    * DataSource API, so this compiles with no Kafka jars on the classpath;
    * resolution happens at `load()` — run with
    * `--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>` online. */
  def kafkaPixelSource(spark: SparkSession, bootstrap: String, topic: String): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
      .select(decodeWire(col("value").cast("string")).as("d"))
      .select(col("d.*"))

  /** K9 sink: wire-encoded labeled pixels to a Kafka topic (the
    * producer's `send(topic, msg)` role). `df` must carry the wire
    * columns (label, features, tile_col, tile_row, px, py). */
  def kafkaPixelSink(df: DataFrame, bootstrap: String, topic: String,
                     checkpoint: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.select(encodeWire(col("label"), col("features"),
        col("tile_col"), col("tile_row"), col("px"), col("py")).as("value"))
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)

  /** Upsert sink (K2 streaming): each micro-batch merges into the
    * catalog layer. */
  def upsertSink(tiles: DataFrame, store: graft.catalog.LayerStore,
                 layer: String, zoom: Int): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    tiles.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, _: Long) =>
        store.merge(batch.select(col("tile_col"), col("tile_row"), col("cells")), layer, zoom)
    }
}
