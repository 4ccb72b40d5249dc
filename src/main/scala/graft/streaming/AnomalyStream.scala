package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch rolling z-score monitor
  * (AdvancedQueries.anomaly): per-entity state is ONE bounded ring of
  * the last `frame` values — constant bytes per user however long the
  * stream runs, no watermark needed (the frame is row-based, not
  * time-based). The arithmetic mirrors the batch query exactly:
  * 2-decimal values land in scaled-long (decimal) sums, mean/variance
  * are the same fixed-order double chain, so for an in-order stream the
  * emitted flags are BIT-IDENTICAL to the batch result
  * (StreamingAnomalySpec proves stream == batch on a shared fixture).
  * Ordering contract: events must arrive per-user in (ts, event_id)
  * order across micro-batches (in-batch disorder is sorted out here);
  * out-of-order ingestion needs an upstream watermark+sort stage. */
object AnomalyStream {

  case class ValueEvent(event_id: Long, user_id: Long, ts_us: Long, value: Double)
  case class RollState(window: Seq[Double])
  case class AnomalyOut(event_id: Long, user_id: Long, value: Double,
                        mean_prev: Double, z: Double, is_anomaly: Boolean)

  def anomalies(events: Dataset[ValueEvent], frame: Int = 20, minPrev: Int = 5,
                zCut: Double = 3.0): Dataset[AnomalyOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[RollState, AnomalyOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (user, evts, state: GroupState[RollState]) =>
          var win = state.getOption.map(_.window.toVector).getOrElse(Vector.empty[Double])
          val out = Vector.newBuilder[AnomalyOut]
          evts.toVector.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            if (win.length >= minPrev) {
              // scaled-long sums = the batch query's DECIMAL(12,2) sums
              val cents = win.map(x => math.round(x * 100))
              val s1 = cents.sum
              val s2 = cents.map(c => c * c).sum
              val n = win.length
              val mean = (s1 / 100.0) / n
              val varp = (s2 / 10000.0) / n - mean * mean
              if (varp > 0) {
                val z = (e.value - mean) / math.sqrt(varp)
                out += AnomalyOut(e.event_id, user, e.value, mean, z, math.abs(z) > zCut)
              }
            }
            win = (win :+ e.value).takeRight(frame)
          }
          state.update(RollState(win))
          out.result().iterator
      }
  }
}
