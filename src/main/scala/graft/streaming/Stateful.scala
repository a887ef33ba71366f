package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom arbitrary state via `mapGroupsWithState` (SURVEY north star:
  * KeyValueGroupedDataset state for what windowed aggs can't express).
  *
  * The operator keeps one running per-user aggregate across ALL
  * micro-batches — cumulative count, cumulative value, last event time —
  * i.e. state that never aligns to a window boundary. The state store
  * holds one small record per user; with a real workload a timeout
  * (`GroupStateTimeout`) would expire idle users to bound state size at
  * 100 TB/day — wired here, set to NoTimeout for deterministic tests.
  */
final case class UserEvent(ts: java.sql.Timestamp, user_id: Long, event_type: String, value: Double)
final case class UserRunning(user_id: Long, n_events: Long, total_value: Double, last_ts: java.sql.Timestamp)

object Stateful {

  def updateUser(
      uid: Long,
      events: Iterator[UserEvent],
      state: GroupState[UserRunning]): UserRunning = {
    val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0, new java.sql.Timestamp(0)))
    val next = events.foldLeft(prev) { (acc, e) =>
      UserRunning(uid, acc.n_events + 1, acc.total_value + e.value,
        if (e.ts.after(acc.last_ts)) e.ts else acc.last_ts)
    }
    state.update(next)
    next
  }

  /** Running per-user totals across micro-batches. Use with
    * `OutputMode.Update` — each batch emits only the users it touched. */
  def runningUserTotals(events: Dataset[UserEvent]): Dataset[UserRunning] = {
    implicit val enc = Encoders.product[UserRunning]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateUser)
  }

  val outputMode: OutputMode = OutputMode.Update()

  private val GapMs = 30L * 60 * 1000

  def sessionize(
      uid: Long,
      events: Iterator[UserEvent],
      state: GroupState[UserSession]): Iterator[UserSession] =
    if (state.hasTimedOut) {
      // watermark passed last_ts + gap with no new events: the session is
      // final — emit it exactly once and drop the state
      val done = state.get
      state.remove()
      Iterator.single(done)
    } else {
      // The 30-min idle gap must be enforced against the DATA, not only
      // via the event-time timeout: a user whose own traffic drives the
      // watermark can deliver post-gap events before the timeout fires
      // (e.g. 10:00 then 13:00 in successive batches). Sort the incoming
      // batch and split on every gap — against the stored session's
      // last_ts first, then within the batch — emitting each closed
      // session immediately; only the trailing open session stays in
      // state with a refreshed timeout.
      val sorted = events.toArray.sortBy(_.ts.getTime)
      val closed = scala.collection.mutable.ArrayBuffer.empty[UserSession]
      var open = state.getOption
      sorted.foreach { e =>
        open match {
          case Some(sess) if e.ts.getTime - sess.last_ts.getTime > GapMs =>
            closed += sess
            open = Some(UserSession(uid, 1L, e.ts, e.ts))
          case Some(sess) =>
            open = Some(UserSession(uid, sess.n_events + 1,
              if (e.ts.before(sess.first_ts)) e.ts else sess.first_ts,
              if (e.ts.after(sess.last_ts)) e.ts else sess.last_ts))
          case None =>
            open = Some(UserSession(uid, 1L, e.ts, e.ts))
        }
      }
      open.foreach { sess =>
        state.update(sess)
        state.setTimeoutTimestamp(sess.last_ts.getTime + GapMs)
      }
      closed.iterator
    }

  /** Timeout-driven sessionization via `flatMapGroupsWithState` with an
    * EVENT-TIME timeout: a user's session closes (and emits, exactly
    * once, in append mode) when the watermark passes 30 idle minutes
    * after their last event. This is the custom-state production shape
    * `session_window` can't express (arbitrary per-session payloads,
    * emit-on-close side outputs) — and the timeout is what bounds the
    * state store on an unbounded stream. Caller must set a watermark on
    * `ts` upstream. */
  def idleSessions(events: Dataset[UserEvent]): Dataset[UserSession] = {
    implicit val enc = Encoders.product[UserSession]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(sessionize)
  }
}

final case class UserSession(
    user_id: Long, n_events: Long,
    first_ts: java.sql.Timestamp, last_ts: java.sql.Timestamp)
