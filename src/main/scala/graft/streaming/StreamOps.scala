package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming forms of the stream_* operators (SURVEY §2.B).
  *
  * Each transform is written against an unbounded DataFrame and is the
  * SAME declarative plan the batch twins in
  * `graft.queries.StreamingQueries` run over the bounded events table —
  * `readStream` vs `read` is the only difference, which is the point of
  * Structured Streaming. State: windowed aggregations and dropDuplicates
  * keep per-key state in the StateStore; the watermark bounds that state
  * (and drops late rows) so a 100 TB/day stream doesn't accumulate
  * unbounded state.
  */
object StreamOps {

  /** 1-day tumbling count+sum per event type (stream_tumbling_count). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n"), col("sum_value"))

  /** 1-hour sliding windows every 30 min (stream_sliding_avg shape). */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("n"))

  /** Per-user 30-min-gap session windows (stream_session_window). */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n"))

  /** One event per (user, type): streaming dedup with watermark-bounded
    * state (stream_dedup).
    *
    * Semantics note — this is ARRIVAL-order dedup, the intended
    * Structured Streaming `dropDuplicates` behavior: the first row to
    * ARRIVE wins, whatever its event time. The batch twin
    * (`StreamingQueries.streamDedup`) instead keeps the EVENT-TIME
    * earliest row by (ts, event_id). On in-order input the two agree;
    * on out-of-order input they can keep different rows (same keys,
    * different payload) — asserted by StreamingSpec. An event-time-
    * earliest streaming form would need a min_by aggregation in update
    * mode (different output mode, same state bound), which callers who
    * need replay-stable payloads should use instead. */
  def dedupFirst(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicates("user_id", "event_type")

  /** Bounded-state dedup (stream_dedup_bounded): one row per
    * (user, type, HOUR bucket) via `dropDuplicatesWithinWatermark` —
    * the state store evicts every key once the watermark passes it,
    * so state size is bounded by keys-per-2-hours FOREVER, where plain
    * `dropDuplicates` state grows with lifetime-distinct keys (the
    * difference between a job that runs for a day and one that runs
    * for a year on a 100 TB/day feed). The hour column makes the
    * bounded semantics exact: a key recurring in a LATER hour is a new
    * row by definition, not an eviction artifact. */
  def dedupBounded(events: DataFrame): DataFrame =
    events
      .withColumn("hour", date_trunc("hour", col("ts")))
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("user_id", "event_type", "hour")

  /** Stream-stream interval join (stream_interval_join): clicks ⋈
    * purchases of the same user with the purchase inside (click_ts,
    * click_ts + 1h]. Both sides carry watermarks and the join condition
    * bounds event time in BOTH directions, so the state store can evict
    * clicks older than watermark + 1h and purchases older than the
    * watermark — bounded state on an unbounded stream, the requirement
    * for running this over a 100 TB/day event feed. */
  def intervalJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "1 hour")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", "1 hour")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("value"))
    c.join(p,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("click_ts") &&
        col("p_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("c_user").as("user_id"), col("click_ts"), col("p_ts"), col("value"))
  }

  /** LEFT OUTER stream-stream interval join (streaming twin of
    * `stream_left_outer_join`): clicks pair with purchases within 30
    * minutes; a click with NO purchase emits a null-match row — but only
    * once the purchase-side watermark has passed click_ts + 30min, since
    * until then a matching purchase could still arrive. The watermark
    * bounds both the join state and the null-emission delay. */
  def leftOuterIntervalJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("value"))
    c.join(p,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("click_ts") &&
        col("p_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"),
      "leftOuter")
      .select(col("c_user").as("user_id"), col("click_ts"), col("p_ts"), col("value"))
  }

  /** Stream-static enrichment join: an unbounded event stream joined to
    * a bounded dimension table. The static side is planned as a
    * broadcast per micro-batch — no streaming state at all (unlike
    * stream-stream joins), which is why enrichment dims should stay
    * static/broadcast even when the fact stream is 100 TB/day. Stateless,
    * so append mode needs no watermark. */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), "user_id")
      .select(col("user_id"), col("ts"), col("event_type"), col("segment"),
        round(col("value") * col("weight"), 2).as("weighted_value"))

  /** Watermarked hourly counts in append mode — rows later than the
    * 10-minute watermark are dropped (stream_watermark_late). */
  def watermarkedHourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n"))

  /** Streaming → RDBMS sink via `foreachBatch` UPSERT: each micro-batch's
    * per-type aggregate is merged into a JDBC table keyed by event_type
    * (DELETE+INSERT inside one connection per batch — idempotent under
    * micro-batch replay because the merge is keyed, the production
    * requirement for an at-least-once sink). The aggregation state lives
    * in Spark; the RDBMS only ever sees small keyed summaries. Embedded
    * Derby stands in for Postgres exactly as in SinkQueries. */
  def foreachBatchJdbcUpsert(events: DataFrame, url: String, table: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    events
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch.collect() // bounded: one row per event type
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val st = conn.createStatement()
          try st.execute(
            s"""CREATE TABLE $table (event_type VARCHAR(64) PRIMARY KEY,
               |  n BIGINT, sum_value DOUBLE)""".stripMargin)
          catch {
            // swallow ONLY Derby's table-already-exists (SQLState X0Y32);
            // a real DDL/connection failure must surface here, not as a
            // confusing DELETE/INSERT error later
            case e: java.sql.SQLException if e.getSQLState == "X0Y32" => ()
          } finally st.close()
          val del = conn.prepareStatement(s"DELETE FROM $table WHERE event_type = ?")
          val ins = conn.prepareStatement(s"INSERT INTO $table VALUES (?, ?, ?)")
          try rows.foreach { r =>
            del.setString(1, r.getString(0)); del.executeUpdate()
            ins.setString(1, r.getString(0))
            ins.setLong(2, r.getLong(1))
            ins.setDouble(3, r.getDouble(2))
            ins.executeUpdate()
          } finally { del.close(); ins.close() }
          conn.commit()
        } finally conn.close()
      }
  }

  /** CDC apply to a JDBC mirror (stream_cdc_apply's incremental twin):
    * the SAME one-row-per-key `max_by` last-writer reduction as the
    * batch form (`StreamingQueries.streamCdcApply`) runs in UPDATE
    * mode — state is one candidate row per key, and `max_by` over the
    * (us, event_id) total order is arrival-order-INDEPENDENT, so any
    * micro-batch slicing of the feed converges to the batch answer —
    * and each micro-batch's changed keys MERGE into the mirror: DELETE
    * then re-INSERT when the key's current last op is an upsert, DELETE
    * alone when a tombstone ('error') is last. The keyed merge is
    * idempotent under micro-batch replay (the at-least-once sink
    * requirement). The mirror only ever sees live-key-sized deltas.
    * Input columns: (user_id, event_type, cents, us, event_id). */
  def cdcApply(changes: DataFrame, url: String, table: String,
      onBatchApplied: Long => Unit = _ => ())
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    changes
      .groupBy(col("user_id"))
      .agg(max_by(
        struct(col("event_type"), col("cents"), col("us")),
        struct(col("us"), col("event_id"))).as("last"))
      .select(col("user_id"), col("last.event_type").as("op_type"),
        col("last.cents").as("cents"), col("last.us").as("us"))
      .writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val rows = batch.collect() // bounded: only keys whose state changed
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val st = conn.createStatement()
          try st.execute(
            s"""CREATE TABLE $table (user_id BIGINT PRIMARY KEY,
               |  last_cents BIGINT, last_ts_us BIGINT)""".stripMargin)
          catch {
            // swallow ONLY Derby's table-already-exists (SQLState X0Y32)
            case e: java.sql.SQLException if e.getSQLState == "X0Y32" => ()
          } finally st.close()
          val del = conn.prepareStatement(s"DELETE FROM $table WHERE user_id = ?")
          val ins = conn.prepareStatement(s"INSERT INTO $table VALUES (?, ?, ?)")
          try rows.foreach { r =>
            del.setLong(1, r.getLong(0)); del.executeUpdate()
            if (r.getString(1) != "error") {
              ins.setLong(1, r.getLong(0))
              ins.setLong(2, r.getLong(2))
              ins.setLong(3, r.getLong(3))
              ins.executeUpdate()
            }
          } finally { del.close(); ins.close() }
          conn.commit()
        } finally conn.close()
        // post-merge hook (default no-op): `StreamRecoverySpec` injects
        // a crash HERE — after the JDBC transaction committed, before
        // Spark's offset-log commit — to prove the keyed DELETE+INSERT
        // merge absorbs the replayed batch idempotently (the one
        // failure window the checkpoint protocol leaves open).
        onBatchApplied(batchId)
      }
  }
}
