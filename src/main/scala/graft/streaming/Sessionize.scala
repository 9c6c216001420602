package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state sessionization via flatMapGroupsWithState (SURVEY §2.8 /
  * brief: "KeyValueGroupedDataset.mapGroupsWithState / flatMapGroupsWithState
  * for custom state") — the stateful analog of the window-based
  * rel_events_sessions query.
  *
  * State machine per user: (last event ts, session count, event count). A
  * new session starts when the gap to the previous event exceeds gapSec
  * (strictly — ties share a session), matching the SQL lag() formulation
  * exactly. Events inside one invocation are sorted by (ts, event_id)
  * before folding, so per-batch iterator order never matters.
  *
  * Modes:
  *  - BATCH (the oracle path): flatMapGroupsWithState on a batch Dataset
  *    runs the function once per key with ALL its events and empty state —
  *    output equals the window/lag SQL exactly.
  *  - STREAMING: Update mode, state carried across micro-batches, the
  *    latest per-user totals re-emitted whenever the user receives events.
  *    Exact when each user's events arrive in event-time order across
  *    batches (the replay/backfill shape); out-of-order arrivals within
  *    one batch are handled by the sort, across batches they would need a
  *    watermark-buffered variant — documented scope.
  */
object Sessionize {

  final case class Event(event_id: Long, user_id: Long, ts: java.sql.Timestamp)
  final case class SessionState(lastTsSec: Long, sessions: Long, events: Long)
  final case class UserSessions(user_id: Long, sessions: Long, events: Long)

  val defaultGapSec = 1800L

  /** Fold sorted events into the running state. */
  def advance(state: Option[SessionState], sorted: Iterator[Event],
              gapSec: Long): SessionState = {
    var st = state.getOrElse(SessionState(Long.MinValue, 0L, 0L))
    sorted.foreach { e =>
      val ts = e.ts.getTime / 1000
      val newSession = st.events == 0L || ts - st.lastTsSec > gapSec
      st = SessionState(ts, st.sessions + (if (newSession) 1L else 0L), st.events + 1L)
    }
    st
  }

  /** Works on both batch and streaming Datasets (see class doc). */
  def sessionStats(events: Dataset[Event],
                   gapSec: Long = defaultGapSec): Dataset[UserSessions] = {
    implicit val stEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[UserSessions]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSessions](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (user, it, state: GroupState[SessionState]) =>
          val sorted = it.toArray.sortBy(e => (e.ts.getTime, e.event_id)).iterator
          val st = advance(state.getOption, sorted, gapSec)
          state.update(st)
          Iterator.single(UserSessions(user, st.sessions, st.events))
      }
  }
}
