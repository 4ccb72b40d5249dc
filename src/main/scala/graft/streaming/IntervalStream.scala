package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch interval-union sweep
  * (AdvancedQueries.intervalMerge): per-user state is ONE open island —
  * two longs (start, running max end) — constant bytes per user however
  * long the stream runs. An island is emitted the moment a claim starts
  * past the open island's max end, exactly the batch sweep's start
  * flag, so for an in-order stream the closed islands are IDENTICAL to
  * the batch islands (StreamingIntervalSpec proves the rollup equals
  * the a_interval_merge gate). The last island per user stays open
  * forever by construction — real deployments close it with an
  * event-time timeout; the spec closes it with a far-future sentinel
  * claim. Ordering contract: claims arrive per-user in (st_us,
  * event_id) order across micro-batches (in-batch disorder is sorted
  * out here), the same contract as AnomalyStream. */
object IntervalStream {

  case class Claim(user_id: Long, event_id: Long, st_us: Long, en_us: Long)
  case class IslandState(start: Long, maxEnd: Long)
  case class Island(user_id: Long, start_us: Long, end_us: Long, covered_us: Long)

  def mergedIslands(claims: Dataset[Claim]): Dataset[Island] = {
    import claims.sparkSession.implicits._
    claims
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[IslandState, Island](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (user, it, state: GroupState[IslandState]) =>
          var cur = state.getOption
          val out = Vector.newBuilder[Island]
          it.toVector.sortBy(c => (c.st_us, c.event_id)).foreach { c =>
            cur match {
              case Some(s) if c.st_us <= s.maxEnd =>
                cur = Some(IslandState(s.start, math.max(s.maxEnd, c.en_us)))
              case Some(s) =>
                out += Island(user, s.start, s.maxEnd, s.maxEnd - s.start)
                cur = Some(IslandState(c.st_us, c.en_us))
              case None =>
                cur = Some(IslandState(c.st_us, c.en_us))
            }
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }
}
