package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch event-transition matrix
  * (RelationalQueries.eventTransitions): per-user state is the single
  * LAST event — constant bytes per user forever — and every arriving
  * event emits exactly one (from → to) transition row, because for an
  * in-order stream the batch's lead-window pairs are exactly
  * "previous event, this event". Downstream the transition rows
  * aggregate incrementally (a streaming groupBy count); the spec
  * proves the emitted pair multiset equals the batch lead-window
  * pairs on the same events across micro-batch boundaries. Same
  * ordering contract as FunnelStream/AnomalyStream. */
object TransitionStream {

  case class TEvent(event_id: Long, user_id: Long, ts_us: Long, event_type: String)
  case class TState(lastType: String, lastTs: Long, lastId: Long)
  case class Transition(user_id: Long, from_type: String, to_type: String)

  def transitions(events: Dataset[TEvent]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TState, Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (user, evts, state: GroupState[TState]) =>
          var st = state.getOption.orNull
          val out = Vector.newBuilder[Transition]
          evts.toVector.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            if (st != null) out += Transition(user, st.lastType, e.event_type)
            st = TState(e.event_type, e.ts_us, e.event_id)
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }
}
