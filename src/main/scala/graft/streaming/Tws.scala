package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming._

/** Spark 4 `transformWithState` — the successor stateful-processing API
  * to `mapGroupsWithState` (SURVEY north star: custom state beyond
  * windowed aggs). What it adds over the mapGroups form
  * (`Stateful.scala`):
  *  - composable named state variables (ValueState / ListState /
  *    MapState) instead of one monolithic state object;
  *  - per-state TTL (`TTLConfig`) — the state-bounding mechanism for
  *    unbounded key spaces at 100 TB/day: idle keys expire without the
  *    hand-rolled timeout choreography GroupStateTimeout needs;
  *  - timers (`registerTimer`) for scheduled emission;
  *  - batch execution of the SAME processor (TimeMode.None), which is
  *    what lets the operator run under the DuckDB hash gate.
  * Streaming execution requires the RocksDB state store provider
  * (`userTotalsStream` documents the conf); batch works on any store.
  *
  * Determinism discipline (§2.C): no float ever enters the state path —
  * money arrives as exact integer cents (decimal-cast upstream in the
  * DataFrame), event time as unix micros, and the fold is
  * max/sum/count, all order-independent, so the result is identical at
  * any partitioning and mirrors exactly in DuckDB.
  */
object Tws {

  /** Typed input: exact units only (cents as long, event time as unix
    * micros) — prepared with decimal casts in the DataFrame layer so the
    * stateful fold never touches a double. */
  final case class CentEvent(user_id: Long, us: Long, cents: Long)

  /** Running per-user totals: event count, exact cents sum, last event
    * time in micros. */
  final case class UserTotals(user_id: Long, n_events: Long, total_cents: Long, last_us: Long)

  /** Internal state record. NOT private: the state Encoder's generated
    * code must construct/access it from outside this object (a private
    * case class fails Janino compilation at plan time). */
  final case class Totals(n: Long, cents: Long, lastUs: Long)

  /** Running totals per user with one named ValueState; `ttl` bounds
    * state lifetime for idle keys (pass `TTLConfig.NONE` for the
    * deterministic batch/event-time paths — TTL is processing-time
    * only). */
  class UserTotalsProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, CentEvent, UserTotals] {
    @transient private var totals: ValueState[Totals] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[Totals]("totals", Encoders.product[Totals], ttl)

    override def handleInputRows(
        key: Long,
        rows: Iterator[CentEvent],
        timerValues: TimerValues): Iterator[UserTotals] = {
      // count/sum/max are order-independent — no sort needed for
      // partition-order determinism
      val prev = if (totals.exists()) totals.get() else Totals(0L, 0L, Long.MinValue)
      val next = rows.foldLeft(prev) { (acc, e) =>
        Totals(acc.n + 1, acc.cents + e.cents, math.max(acc.lastUs, e.us))
      }
      totals.update(next)
      Iterator.single(UserTotals(key, next.n, next.cents, next.lastUs))
    }
  }

  /** Batch run of the processor (TimeMode.None): every key's rows arrive
    * in one handleInputRows call; the same class drives the streaming
    * twin. */
  def userTotals(events: Dataset[CentEvent]): Dataset[UserTotals] = {
    // batch TWS still routes through the RocksDB provider, which asks
    // for the StateStoreCoordinator RPC endpoint. That endpoint is
    // created by the StreamingQueryManager's CONSTRUCTOR, so in a pure
    // batch session it doesn't exist yet and the task dies with
    // RpcEndpointNotFoundException. Touching the public `streams`
    // handle forces the manager (and with it the endpoint) into
    // existence — one lazy init, no streaming query started.
    events.sparkSession.streams
    implicit val outEnc = Encoders.product[UserTotals]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new UserTotalsProcessor(TTLConfig.NONE),
        TimeMode.None(), OutputMode.Append())
  }

  /** Streaming twin (Update mode): cumulative totals re-emitted per
    * micro-batch. Requires
    * `spark.sql.streaming.stateStore.providerClass =
    * org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`
    * (transformWithState is RocksDB-only in streaming).
    *
    * `ttl = Some(d)` runs in ProcessingTime mode with per-state TTL —
    * the production posture for an unbounded key space (idle users
    * expire after d). NOTE: processing-time mode keeps scheduling
    * timer micro-batches, so `Trigger.AvailableNow` never
    * self-terminates under it — drive it with a continuous trigger and
    * stop explicitly. `ttl = None` runs in TimeMode.None (no TTL, no
    * timer batches): state still carries across micro-batches and
    * restarts, and AvailableNow drains and stops — the deterministic
    * test posture. */
  def userTotalsStream(events: Dataset[CentEvent], ttl: Option[java.time.Duration]): Dataset[UserTotals] = {
    implicit val outEnc = Encoders.product[UserTotals]
    val (cfg, mode) = ttl match {
      case Some(d) => (TTLConfig(d), TimeMode.ProcessingTime())
      case None    => (TTLConfig.NONE, TimeMode.None())
    }
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new UserTotalsProcessor(cfg), mode, OutputMode.Update())
  }
}
