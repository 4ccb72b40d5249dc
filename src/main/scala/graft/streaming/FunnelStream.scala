package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch conversion funnel
  * (RelationalQueries.funnel): per-user state is THREE timestamps —
  * constant bytes per user forever — updated in one pass, because for
  * an in-order stream the batch's "earliest X after Y" minima are
  * exactly "first X seen once Y is known". Emits the user's funnel row
  * on every state change (Update-style); the latest emission per user
  * equals the batch result on the same events (FunnelStreamSpec).
  * Same ordering contract as AnomalyStream. */
object FunnelStream {

  case class FunnelEvent(event_id: Long, user_id: Long, ts_us: Long, event_type: String)
  case class FunnelState(t1: Option[Long], t2: Option[Long], t3: Option[Long], updates: Long)
  case class FunnelOut(user_id: Long, view_us: Option[Long], click_us: Option[Long],
                       purchase_us: Option[Long], stage: Int, updates: Long)

  def funnel(events: Dataset[FunnelEvent]): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (user, evts, state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(None, None, None, 0L))
          evts.toVector.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            st = e.event_type match {
              case "view" if st.t1.isEmpty =>
                st.copy(t1 = Some(e.ts_us), updates = st.updates + 1)
              case "click" if st.t2.isEmpty && st.t1.exists(e.ts_us > _) =>
                st.copy(t2 = Some(e.ts_us), updates = st.updates + 1)
              case "purchase" if st.t3.isEmpty && st.t2.exists(e.ts_us > _) =>
                st.copy(t3 = Some(e.ts_us), updates = st.updates + 1)
              case _ => st.copy(updates = st.updates + 1)
            }
          }
          state.update(st)
          val stage =
            if (st.t3.isDefined) 3 else if (st.t2.isDefined) 2
            else if (st.t1.isDefined) 1 else 0
          Iterator.single(FunnelOut(user, st.t1, st.t2, st.t3, stage, st.updates))
      }
  }
}
