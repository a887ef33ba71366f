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

  /** Incremental twin of `ts_ewma`: the same integer-quantized
    * recurrence `e = (x + 3·e_prev) div 4` carried across micro-batches
    * in per-user state. Events inside a batch fold in (ts, event id)
    * order so replays and batch boundaries can't reorder the
    * recurrence; the state record is two longs per user — the bounded
    * per-key footprint that lets the incremental form track a 100 TB/day
    * feed while the batch form reprocesses history. */
  final case class EwmaState(ew: Long, n: Long)
  final case class UserEwma(user_id: Long, ew_cents: Long, n_obs: Long)

  def updateEwma(
      uid: Long,
      events: Iterator[UserEvent],
      state: GroupState[EwmaState]): UserEwma = {
    val ordered = events.toArray.sortBy(e => (e.ts.getTime, e.value))
    val prev = state.getOption.getOrElse(EwmaState(0L, 0L))
    val next = ordered.foldLeft(prev) { (acc, e) =>
      val cents = math.round(e.value * 100)
      if (acc.n == 0L) EwmaState(cents, 1L)
      else EwmaState((cents + 3 * acc.ew) / 4, acc.n + 1)
    }
    state.update(next)
    UserEwma(uid, next.ew, next.n)
  }

  /** Running per-user EWMA across micro-batches (Update mode). */
  def runningEwma(events: Dataset[UserEvent]): Dataset[UserEwma] = {
    implicit val outEnc = Encoders.product[UserEwma]
    implicit val stateEnc = Encoders.product[EwmaState]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateEwma)
  }

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

  /** Incremental ordered-stage funnel (the streaming twin of
    * `StreamingQueries.streamFunnel`): per-user state machine tracking
    * the first view, the first click at-or-after that view, and the
    * first purchase at-or-after that click, across micro-batches.
    * Each batch's events are processed in event-time order, so an
    * in-batch view→click→purchase chain advances all three stages at
    * once. Emits the user's current funnel state every batch it is
    * touched (Update mode); state is three optional epochs — O(1) per
    * user regardless of event volume. */
  def funnelStep(
      uid: Long,
      events: Iterator[UserEvent],
      state: GroupState[FunnelState]): FunnelState = {
    var st = state.getOption.getOrElse(FunnelState(uid, -1L, -1L, -1L))
    events.toArray.sortBy(_.ts.getTime).foreach { e =>
      val t = e.ts.getTime
      e.event_type match {
        case "view" if st.v_ms < 0 => st = st.copy(v_ms = t)
        case "click" if st.c_ms < 0 && st.v_ms >= 0 && t >= st.v_ms =>
          st = st.copy(c_ms = t)
        case "purchase" if st.p_ms < 0 && st.c_ms >= 0 && t >= st.c_ms =>
          st = st.copy(p_ms = t)
        case _ => ()
      }
    }
    state.update(st)
    st
  }

  def funnelStates(events: Dataset[UserEvent]): Dataset[FunnelState] = {
    implicit val enc = Encoders.product[FunnelState]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(funnelStep)
  }

  /** Streaming AS-OF enrich — the incremental twin of the custom batch
    * operator (`graft.plans.AsOfJoin`, backward mode): each "left" event
    * pairs with the most recent "right" event of the same key at-or-
    * before its time; unmatched lefts emit with the -1 sentinel (the
    * batch operator's null-extension). State per key is ONE (ts, value)
    * record — the same O(1) bound the batch merge holds per partition.
    * Each batch's events are processed in event-time order, rights
    * before lefts on equal timestamps (the ≤ band). A right that ARRIVES
    * in a later batch than a left cannot retro-match — the inherent
    * streaming/batch divergence under disorder; with sources in event-
    * time order across batches, outputs equal the batch operator's
    * exactly (asserted in StreamingSpec). */
  def asofStep(
      uid: Long,
      events: Iterator[UserEvent],
      state: GroupState[AsOfLatest]): Iterator[AsOfMatch] = {
    var latest = state.getOption.getOrElse(AsOfLatest(uid, -1L, 0.0))
    val out = scala.collection.mutable.ArrayBuffer.empty[AsOfMatch]
    events.toArray
      .sortBy(e => (e.ts.getTime, if (e.event_type == "right") 0 else 1))
      .foreach { e =>
        val t = e.ts.getTime
        if (e.event_type == "right") latest = AsOfLatest(uid, t, e.value)
        else out += AsOfMatch(uid, t, latest.r_ms,
          if (latest.r_ms >= 0) latest.r_value else 0.0)
      }
    state.update(latest)
    out.iterator
  }

  def asofEnrich(events: Dataset[UserEvent]): Dataset[AsOfMatch] = {
    implicit val outEnc = Encoders.product[AsOfMatch]
    implicit val stateEnc = Encoders.product[AsOfLatest]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(asofStep)
  }
}

/** Latest right-side event per key (asofEnrich state); r_ms = -1 until
  * one arrives. Fixed-width primitives for the state store. */
final case class AsOfLatest(user_id: Long, r_ms: Long, r_value: Double)

/** One as-of match per left event; right_ms = -1 = unmatched. */
final case class AsOfMatch(user_id: Long, left_ms: Long, right_ms: Long, right_value: Double)

/** Funnel progress per user; -1 = stage not reached (epoch millis
  * otherwise). Kept as primitives so the state-store row stays fixed
  * width. */
final case class FunnelState(user_id: Long, v_ms: Long, c_ms: Long, p_ms: Long)

final case class UserSession(
    user_id: Long, n_events: Long,
    first_ts: java.sql.Timestamp, last_ts: java.sql.Timestamp)
