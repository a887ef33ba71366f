package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamOps

case class TestEvent(ts: Timestamp, user_id: Long, event_type: String, value: Double)
case class CdcChange(user_id: Long, event_type: String, cents: Long, us: Long, event_id: Long)

/** Structured-Streaming twins of the stream_* operators, driven through
  * MemoryStream micro-batches (SURVEY §5.2: mandatory coverage for
  * stream_watermark_late, plus batch/stream agreement for the rest). */
class StreamingSpec extends GraftSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def runBatches[A](q: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                            mode: OutputMode,
                            batches: Seq[Seq[TestEvent]]): Array[org.apache.spark.sql.Row] = {
    implicit val sqlCtx = spark.sqlContext
    import SparkSpecBase.spark.implicits._
    val in = MemoryStream[TestEvent]
    val sinkName = s"sink_${System.nanoTime()}"
    val query = q(in.toDF()).writeStream
      .format("memory").queryName(sinkName).outputMode(mode).start()
    try {
      batches.foreach { b => in.addData(b); query.processAllAvailable() }
      spark.table(sinkName).collect()
    } finally query.stop()
  }

  test("streaming tumbling counts equal the batch plan on the same rows") {
    val rows = Seq(
      TestEvent(ts("2024-01-01 01:00:00"), 1, "click", 1.0),
      TestEvent(ts("2024-01-01 05:00:00"), 1, "click", 2.0),
      TestEvent(ts("2024-01-01 09:00:00"), 2, "view", 3.0),
      TestEvent(ts("2024-01-02 01:00:00"), 1, "click", 4.0))
    val got = runBatches(StreamOps.tumblingCounts, OutputMode.Complete(), Seq(rows))
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).sorted
    import SparkSpecBase.spark.implicits._
    val batch = StreamOps.tumblingCounts(rows.toDF())
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).sorted
    assert(got.sameElements(batch))
    assert(got.length == 3)
  }

  test("streaming dedup keeps one row per (user, type)") {
    val rows = Seq(
      TestEvent(ts("2024-01-01 01:00:00"), 1, "click", 1.0),
      TestEvent(ts("2024-01-01 01:05:00"), 1, "click", 99.0),
      TestEvent(ts("2024-01-01 01:06:00"), 1, "view", 2.0))
    val got = runBatches(StreamOps.dedupFirst, OutputMode.Append(), Seq(rows))
    assert(got.length == 2)
  }

  test("bounded dedup drops within-hour repeats but admits the key again next hour") {
    val got = runBatches(StreamOps.dedupBounded, OutputMode.Append(), Seq(
      Seq( // hour 01: duplicate (1, click) collapses to one row
        TestEvent(ts("2024-01-01 01:00:00"), 1, "click", 1.0),
        TestEvent(ts("2024-01-01 01:05:00"), 1, "click", 99.0)),
      Seq( // hour 02: same (user, type) is a NEW hour-bucketed key —
        // admitted even though the state store evicted nothing yet
        TestEvent(ts("2024-01-01 02:10:00"), 1, "click", 2.0)),
      Seq( // advance the watermark far past hour 02 (evicts its state),
        // then a LATE duplicate of hour 01 arrives: dropped only if the
        // engine's within-watermark contract held; a late row BEHIND
        // the watermark never reaches the operator in append mode
        TestEvent(ts("2024-01-01 09:00:00"), 2, "view", 3.0))))
    val keys = got.map(r => (r.getLong(1), r.getString(2),
      r.getTimestamp(4).toString)).sorted
    assert(keys.length == 3, keys.mkString(", "))
    assert(keys.count { case (u, t2, _) => u == 1L && t2 == "click" } == 2,
      "expected (1, click) once per hour bucket")
  }

  test("streaming dedup is arrival-order: first-ARRIVED row wins on out-of-order input") {
    // The ts=01:05 row arrives in batch 1; the event-time-earlier 01:00
    // row arrives in batch 2. dropDuplicates keeps the batch-1 arrival
    // (value 99.0) — the documented divergence from the batch twin,
    // which would keep the 01:00 row (value 1.0) via min-by-(ts,id).
    val batch1 = Seq(TestEvent(ts("2024-01-01 01:05:00"), 1, "click", 99.0))
    val batch2 = Seq(TestEvent(ts("2024-01-01 01:00:00"), 1, "click", 1.0))
    val got = runBatches(StreamOps.dedupFirst, OutputMode.Append(), Seq(batch1, batch2))
    assert(got.length == 1)
    assert(got(0).getAs[Double]("value") == 99.0)
    assert(got(0).getAs[Timestamp]("ts") == ts("2024-01-01 01:05:00"))
  }

  test("stream-stream interval join pairs purchases with clicks inside the hour") {
    implicit val sqlCtx = spark.sqlContext
    import SparkSpecBase.spark.implicits._
    val clicks = MemoryStream[TestEvent]
    val purchases = MemoryStream[TestEvent]
    val sinkName = s"ssj_sink_${System.nanoTime()}"
    val query = StreamOps.intervalJoin(clicks.toDF(), purchases.toDF()).writeStream
      .format("memory").queryName(sinkName).outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(
        TestEvent(ts("2024-01-01 10:00:00"), 1, "click", 0.0),
        TestEvent(ts("2024-01-01 12:00:00"), 2, "click", 0.0))
      purchases.addData(
        TestEvent(ts("2024-01-01 10:30:00"), 1, "purchase", 5.0), // in window
        TestEvent(ts("2024-01-01 11:30:00"), 1, "purchase", 7.0), // > 1h after click
        TestEvent(ts("2024-01-01 12:10:00"), 3, "purchase", 9.0)) // no matching user
      query.processAllAvailable()
      val got = spark.table(sinkName).collect()
        .map(r => (r.getLong(0), r.getTimestamp(2).toString, r.getDouble(3)))
      assert(got.toSeq == Seq((1L, "2024-01-01 10:30:00.0", 5.0)))
    } finally query.stop()
  }

  test("left-outer interval join emits null-match only after watermark passes the window") {
    implicit val sqlCtx = spark.sqlContext
    import SparkSpecBase.spark.implicits._
    val clicks = MemoryStream[TestEvent]
    val purchases = MemoryStream[TestEvent]
    val sinkName = s"lsoj_sink_${System.nanoTime()}"
    val query = StreamOps.leftOuterIntervalJoin(clicks.toDF(), purchases.toDF()).writeStream
      .format("memory").queryName(sinkName).outputMode(OutputMode.Append()).start()
    try {
      // user 1 converts inside 30 min; user 2 never converts
      clicks.addData(
        TestEvent(ts("2024-01-01 10:00:00"), 1, "click", 0.0),
        TestEvent(ts("2024-01-01 10:00:00"), 2, "click", 0.0))
      purchases.addData(TestEvent(ts("2024-01-01 10:20:00"), 1, "purchase", 5.0))
      query.processAllAvailable()
      val matchedOnly = spark.table(sinkName).collect()
      // user 2's null-match must NOT have emitted yet: its window is
      // still open (watermark hasn't passed 10:30 + delay)
      assert(matchedOnly.map(_.getLong(0)).toSet == Set(1L))
      // advance both watermarks well past the window...
      clicks.addData(TestEvent(ts("2024-01-01 12:00:00"), 9, "click", 0.0))
      purchases.addData(TestEvent(ts("2024-01-01 12:00:00"), 9, "purchase", 1.0))
      query.processAllAvailable()
      val rows = spark.table(sinkName).collect()
        .map(r => (r.getLong(0), Option(r.get(2)).map(_.toString).orNull))
        .sortBy(r => (r._1, Option(r._2).getOrElse("")))
      // ...now user 2 appears with a NULL purchase side
      assert(rows.exists(r => r._1 == 2L && r._2 == null),
        s"no null-match row for user 2 in ${rows.mkString(", ")}")
    } finally query.stop()
  }

  test("foreachBatch JDBC upsert: keyed merge is cumulative and replay-idempotent") {
    implicit val sqlCtx = spark.sqlContext
    import SparkSpecBase.spark.implicits._
    val url = s"jdbc:derby:${System.getProperty("java.io.tmpdir")}/graft_stream_sink_${System.nanoTime()};create=true"
    val in = MemoryStream[TestEvent]
    val query = StreamOps.foreachBatchJdbcUpsert(in.toDF(), url, "stream_agg")
      .option("checkpointLocation",
        s"${System.getProperty("java.io.tmpdir")}/graft_ckpt_${System.nanoTime()}")
      .start()
    def table(): Map[String, (Long, Double)] = {
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val rs = conn.createStatement().executeQuery(
          "SELECT event_type, n, sum_value FROM stream_agg")
        val b = scala.collection.mutable.Map[String, (Long, Double)]()
        while (rs.next()) b += rs.getString(1) -> (rs.getLong(2), rs.getDouble(3))
        b.toMap
      } finally conn.close()
    }
    try {
      in.addData(
        TestEvent(ts("2024-01-01 10:00:00"), 1, "click", 2.0),
        TestEvent(ts("2024-01-01 10:01:00"), 2, "click", 3.0),
        TestEvent(ts("2024-01-01 10:02:00"), 1, "view", 7.0))
      query.processAllAvailable()
      assert(table() == Map("click" -> (2L, 5.0), "view" -> (1L, 7.0)))
      // second batch UPDATES the click row (streaming agg state is
      // cumulative) — the keyed DELETE+INSERT must not double-count
      in.addData(TestEvent(ts("2024-01-01 10:03:00"), 3, "click", 10.0))
      query.processAllAvailable()
      assert(table() == Map("click" -> (3L, 15.0), "view" -> (1L, 7.0)))
    } finally query.stop()
  }

  test("cdcApply foreachBatch MERGE: cumulative upsert+tombstone state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import SparkSpecBase.spark.implicits._
    val url = s"jdbc:derby:${System.getProperty("java.io.tmpdir")}/graft_cdc_mirror_${System.nanoTime()};create=true"
    val in = MemoryStream[CdcChange]
    val query = StreamOps.cdcApply(in.toDF(), url, "cdc_mirror")
      .option("checkpointLocation",
        s"${System.getProperty("java.io.tmpdir")}/graft_cdc_ckpt_${System.nanoTime()}")
      .start()
    def mirror(): Map[Long, (Long, Long)] = {
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val rs = conn.createStatement().executeQuery(
          "SELECT user_id, last_cents, last_ts_us FROM cdc_mirror")
        val b = scala.collection.mutable.Map[Long, (Long, Long)]()
        while (rs.next()) b += rs.getLong(1) -> (rs.getLong(2), rs.getLong(3))
        b.toMap
      } finally conn.close()
    }
    try {
      // batch 1: two fresh upserts
      in.addData(
        CdcChange(1L, "purchase", 100L, 10L, 1L),
        CdcChange(2L, "view", 200L, 20L, 2L))
      query.processAllAvailable()
      assert(mirror() == Map(1L -> (100L, 10L), 2L -> (200L, 20L)))
      // batch 2: update key 1, TOMBSTONE key 2 ('error' op), insert key 3
      in.addData(
        CdcChange(1L, "purchase", 150L, 30L, 3L),
        CdcChange(2L, "error", 0L, 40L, 4L),
        CdcChange(3L, "click", 300L, 5L, 5L))
      query.processAllAvailable()
      assert(mirror() == Map(1L -> (150L, 30L), 3L -> (300L, 5L)),
        "tombstone must remove key 2; upsert must advance key 1")
      // batch 3: STALE out-of-order change for key 1 (us 25 < 30) must
      // not regress the mirror; key 2 re-appears after its delete
      in.addData(
        CdcChange(1L, "purchase", 999L, 25L, 6L),
        CdcChange(2L, "purchase", 500L, 50L, 7L))
      query.processAllAvailable()
      assert(mirror() == Map(1L -> (150L, 30L), 2L -> (500L, 50L), 3L -> (300L, 5L)),
        "stale change regressed the mirror or post-delete re-insert failed")
    } finally query.stop()
  }

  test("stream-static join enriches each micro-batch from a broadcast dim, stateless") {
    implicit val sqlCtx = spark.sqlContext
    import SparkSpecBase.spark.implicits._
    val dim = Seq((1L, "gold", 2.0), (2L, "basic", 1.0)).toDF("user_id", "segment", "weight")
    val in = MemoryStream[TestEvent]
    val sinkName = s"enrich_sink_${System.nanoTime()}"
    val query = StreamOps.enrichWithDim(in.toDF(), dim).writeStream
      .format("memory").queryName(sinkName).outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        TestEvent(ts("2024-01-01 10:00:00"), 1, "click", 1.5),
        TestEvent(ts("2024-01-01 10:01:00"), 2, "view", 3.0),
        TestEvent(ts("2024-01-01 10:02:00"), 3, "click", 9.9)) // no dim row → dropped
      query.processAllAvailable()
      in.addData(TestEvent(ts("2024-01-01 11:00:00"), 1, "view", 2.0))
      query.processAllAvailable()
      val got = spark.table(sinkName).collect()
        .map(r => (r.getLong(0), r.getString(3), r.getDouble(4))).sorted
      assert(got.toSeq == Seq((1L, "gold", 3.0), (1L, "gold", 4.0), (2L, "basic", 3.0)),
        s"got ${got.toSeq}")
      // stateless: the progress metrics must report no state store rows
      val lastProgress = query.lastProgress
      assert(lastProgress.stateOperators.isEmpty ||
        lastProgress.stateOperators.forall(_.numRowsTotal == 0),
        "stream-static join should keep no state")
    } finally query.stop()
  }

  test("session windows merge events within the 30-minute gap") {
    val rows = Seq(
      TestEvent(ts("2024-01-01 01:00:00"), 1, "click", 1.0),
      TestEvent(ts("2024-01-01 01:20:00"), 1, "click", 1.0), // same session
      TestEvent(ts("2024-01-01 03:00:00"), 1, "click", 1.0), // new session
      // watermark driver: push watermark past 03:30 so sessions finalize
      TestEvent(ts("2024-01-01 06:00:00"), 9, "view", 0.0))
    val got = runBatches(StreamOps.sessionCounts, OutputMode.Complete(), Seq(rows))
      .filter(_.getLong(0) == 1L)
      .map(r => (r.getTimestamp(1).toString, r.getLong(2))).sorted
    assert(got.toSeq == Seq(("2024-01-01 01:00:00.0", 2L), ("2024-01-01 03:00:00.0", 1L)))
  }

  test("mapGroupsWithState carries per-user running totals across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import SparkSpecBase.spark.implicits._
    import graft.streaming.{Stateful, UserEvent}
    val in = MemoryStream[UserEvent]
    val sinkName = s"state_sink_${System.nanoTime()}"
    val query = Stateful.runningUserTotals(in.toDS()).writeStream
      .format("memory").queryName(sinkName).outputMode(Stateful.outputMode).start()
    try {
      in.addData(UserEvent(ts("2024-01-01 01:00:00"), 1, "click", 1.5),
        UserEvent(ts("2024-01-01 01:01:00"), 1, "view", 2.0),
        UserEvent(ts("2024-01-01 01:02:00"), 2, "click", 7.0))
      query.processAllAvailable()
      in.addData(UserEvent(ts("2024-01-01 02:00:00"), 1, "click", 4.0))
      query.processAllAvailable()
      // Update mode appends each batch's touched users; the LAST row per
      // user is the cumulative state spanning both micro-batches.
      val last = spark.table(sinkName).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).map { case (u, rs) => rs.maxBy(_._2) }.toSet
      assert(last == Set((1L, 3L, 7.5), (2L, 1L, 7.0)))
    } finally query.stop()
  }

  test("incremental EWMA state is batch-boundary invariant and matches the direct fold") {
    implicit val sqlCtx = spark.sqlContext
    import SparkSpecBase.spark.implicits._
    import graft.streaming.{Stateful, UserEvent}
    val events = Seq(
      UserEvent(ts("2024-01-01 01:00:00"), 1, "purchase", 100.00),
      UserEvent(ts("2024-01-01 02:00:00"), 1, "purchase", 200.00),
      UserEvent(ts("2024-01-01 03:00:00"), 1, "purchase", 50.00),
      UserEvent(ts("2024-01-01 04:00:00"), 1, "purchase", 300.00),
      UserEvent(ts("2024-01-01 01:30:00"), 2, "purchase", 10.00))
    // direct fold of the quantized recurrence, in event-time order
    def fold(xs: Seq[Long]): Long = xs.tail.foldLeft(xs.head)((e, c) => (c + 3 * e) / 4)
    val want1 = fold(Seq(10000L, 20000L, 5000L, 30000L))
    def run(batches: Seq[Seq[UserEvent]]): Set[(Long, Long, Long)] = {
      val in = MemoryStream[UserEvent]
      val sinkName = s"ewma_sink_${System.nanoTime()}"
      val query = Stateful.runningEwma(in.toDS()).writeStream
        .format("memory").queryName(sinkName).outputMode(Stateful.outputMode).start()
      try {
        batches.foreach { b => in.addData(b); query.processAllAvailable() }
        spark.table(sinkName).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .groupBy(_._1).map { case (_, rs) => rs.maxBy(_._3) }.toSet
      } finally query.stop()
    }
    val oneBatch = run(Seq(events))
    val threeBatches = run(Seq(events.take(2), events.slice(2, 4), events.drop(4)))
    assert(oneBatch == threeBatches, s"$oneBatch != $threeBatches")
    assert(oneBatch.contains((1L, want1, 4L)), s"user 1 EWMA mismatch: $oneBatch want $want1")
    assert(oneBatch.contains((2L, 1000L, 1L)))
  }

  test("incremental funnel state matches the batch funnel counts on the events table") {
    implicit val sqlCtx = spark.sqlContext
    import SparkSpecBase.spark.implicits._
    import graft.streaming.{Stateful, UserEvent}
    // feed the REAL events table through micro-batches in event-time
    // order, then compare stage counts with the batch streamFunnel
    val all = graft.tables.Tables.t(spark, sfDir, "events")
      .select(col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[UserEvent].collect().sortBy(_.ts.getTime)
    val in = MemoryStream[UserEvent]
    val sinkName = s"funnel_sink_${System.nanoTime()}"
    val query = Stateful.funnelStates(in.toDS()).writeStream
      .format("memory").queryName(sinkName).outputMode(OutputMode.Update()).start()
    try {
      all.grouped(math.max(1, all.length / 3)).foreach { b =>
        in.addData(b.toSeq); query.processAllAvailable()
      }
      val finalStates = spark.table(sinkName).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .groupBy(_._1).map { case (_, rs) => rs.last }
      val nV = finalStates.count(_._2 >= 0)
      val nC = finalStates.count(_._3 >= 0)
      val nP = finalStates.count(_._4 >= 0)
      val batch = graft.queries.StreamingQueries.streamFunnel(spark, sfDir).collect().head
      assert((nV.toLong, nC.toLong, nP.toLong) ==
        (batch.getLong(0), batch.getLong(1), batch.getLong(2)))
    } finally query.stop()
  }

  test("flatMapGroupsWithState event-time timeout closes idle sessions exactly once") {
    implicit val sqlCtx = spark.sqlContext
    import SparkSpecBase.spark.implicits._
    import graft.streaming.{Stateful, UserEvent}
    val in = MemoryStream[UserEvent]
    val sinkName = s"sess_sink_${System.nanoTime()}"
    val query = Stateful.idleSessions(
        in.toDS().withWatermark("ts", "10 minutes")).writeStream
      .format("memory").queryName(sinkName).outputMode(OutputMode.Append()).start()
    try {
      // user 1: two events, then goes idle
      in.addData(
        UserEvent(ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        UserEvent(ts("2024-01-01 10:05:00"), 1, "view", 2.0))
      query.processAllAvailable()
      assert(spark.table(sinkName).count() == 0) // session still open
      // advance the watermark far past 10:35 (last_ts + 30min gap)
      in.addData(UserEvent(ts("2024-01-01 12:00:00"), 9, "click", 0.0))
      query.processAllAvailable()
      // one more batch so the timed-out state is processed
      in.addData(UserEvent(ts("2024-01-01 12:30:00"), 9, "click", 0.0))
      query.processAllAvailable()
      val sessions = spark.table(sinkName).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).toString, r.getTimestamp(3).toString))
      assert(sessions.toSeq == Seq((1L, 2L, "2024-01-01 10:00:00.0", "2024-01-01 10:05:00.0")),
        s"got ${sessions.toSeq}")
    } finally query.stop()
  }

  test("streaming as-of enrich equals the custom batch AsOfJoin on in-order input") {
    implicit val sqlCtx = spark.sqlContext
    import SparkSpecBase.spark.implicits._
    import graft.streaming.{Stateful, UserEvent}
    // rights/lefts per user covering: unmatched left (before any right),
    // equal-ts match (≤ band), latest-of-several-rights, and a
    // cross-batch match (right in batch 1, left in batch 2)
    val batch1 = Seq(
      UserEvent(ts("2024-01-01 09:00:00"), 1, "left", 0.0),   // unmatched
      UserEvent(ts("2024-01-01 10:00:00"), 1, "right", 10.0),
      UserEvent(ts("2024-01-01 10:00:00"), 2, "right", 20.0),
      UserEvent(ts("2024-01-01 10:00:00"), 2, "left", 0.0),   // equal ts → matches 20.0
      UserEvent(ts("2024-01-01 10:30:00"), 1, "right", 11.0),
      UserEvent(ts("2024-01-01 11:00:00"), 1, "left", 0.0))   // latest right wins → 11.0
    val batch2 = Seq(
      UserEvent(ts("2024-01-01 12:00:00"), 1, "left", 0.0),   // matches batch-1 state → 11.0
      UserEvent(ts("2024-01-01 12:30:00"), 3, "left", 0.0))   // user never saw a right
    val in = MemoryStream[UserEvent]
    val sinkName = s"sink_${System.nanoTime()}"
    val query = Stateful.asofEnrich(in.toDS()).writeStream
      .format("memory").queryName(sinkName).outputMode(OutputMode.Append()).start()
    val got = try {
      Seq(batch1, batch2).foreach { b => in.addData(b); query.processAllAvailable() }
      spark.table(sinkName).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sorted
    } finally query.stop()

    // batch reference: the custom AsOfJoin operator over the same rows
    val all = batch1 ++ batch2
    val lefts = all.filter(_.event_type == "left")
      .map(e => (e.user_id, e.ts)).toDF("user_id", "ts")
    val rights = all.filter(_.event_type == "right")
      .map(e => (e.user_id, e.ts, e.value)).toDF("r_user", "rts", "value")
    val want = graft.plans.AsOf.join(lefts, rights, "user_id", "ts", "r_user", "rts")
      .collect().map { r =>
        (r.getLong(0), r.getTimestamp(1).getTime,
          if (r.isNullAt(3)) -1L else r.getTimestamp(3).getTime,
          if (r.isNullAt(4)) 0.0 else r.getDouble(4))
      }.sorted
    assert(got.toSeq == want.toSeq)
  }

  test("idle-gap sessions split on in-data gaps even when the same user drives the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import SparkSpecBase.spark.implicits._
    import graft.streaming.{Stateful, UserEvent}
    val in = MemoryStream[UserEvent]
    val sinkName = s"sess_gap_sink_${System.nanoTime()}"
    val query = Stateful.idleSessions(
        in.toDS().withWatermark("ts", "10 minutes")).writeStream
      .format("memory").queryName(sinkName).outputMode(OutputMode.Append()).start()
    try {
      // user 1 at 10:00, then again at 13:00 — 3h gap, but the 13:00
      // event ARRIVES before any other traffic advances the watermark
      // past 10:30, so the event-time timeout has not fired. The gap
      // check against stored last_ts must split the sessions anyway.
      in.addData(UserEvent(ts("2024-01-01 10:00:00"), 1, "click", 1.0))
      query.processAllAvailable()
      in.addData(
        UserEvent(ts("2024-01-01 13:00:00"), 1, "click", 2.0),
        // and a within-batch gap: 13:05 same session, 16:00 a third one
        UserEvent(ts("2024-01-01 13:05:00"), 1, "view", 3.0),
        UserEvent(ts("2024-01-01 16:00:00"), 1, "click", 4.0))
      query.processAllAvailable()
      val emitted = spark.table(sinkName).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).toString, r.getTimestamp(3).toString))
      // first session (10:00, 1 event) closed by the 13:00 arrival; second
      // (13:00-13:05, 2 events) closed by the within-batch 16:00 gap; the
      // 16:00 session is still open in state, not emitted
      assert(emitted.toSet == Set(
        (1L, 1L, "2024-01-01 10:00:00.0", "2024-01-01 10:00:00.0"),
        (1L, 2L, "2024-01-01 13:00:00.0", "2024-01-01 13:05:00.0")),
        s"got ${emitted.toSeq}")
    } finally query.stop()
  }

  test("stream_watermark_late: rows behind the watermark are dropped") {
    val batch1 = Seq(
      TestEvent(ts("2024-01-01 10:05:00"), 1, "click", 1.0),
      TestEvent(ts("2024-01-01 10:15:00"), 2, "click", 1.0))
    // advances watermark to 11:50 — the 10:00 window can finalize
    val batch2 = Seq(TestEvent(ts("2024-01-01 12:00:00"), 3, "view", 1.0))
    // LATE: 10:30 is far behind watermark 11:50 → must be dropped
    val batch3 = Seq(TestEvent(ts("2024-01-01 10:30:00"), 4, "click", 1.0))
    // advances watermark past 13:00 so the 12:00 window also emits
    val batch4 = Seq(TestEvent(ts("2024-01-01 14:00:00"), 5, "view", 1.0))
    val got = runBatches(StreamOps.watermarkedHourlyCounts, OutputMode.Append(),
      Seq(batch1, batch2, batch3, batch4))
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
    // 10:00 click window counts ONLY the two on-time rows — the late
    // 10:30 click did not resurrect or grow the finalized window.
    assert(got.contains(("2024-01-01 10:00:00.0", "click", 2L)), s"got $got")
    assert(!got.exists { case (w, t, n) => w == "2024-01-01 10:00:00.0" && t == "click" && n != 2L })
  }

  test("cdc apply: last-writer-wins mirror honors tombstones, out-of-order, and re-insert") {
    implicit val sqlCtx = spark.sqlContext
    import SparkSpecBase.spark.implicits._
    val url = s"jdbc:derby:${System.getProperty("java.io.tmpdir")}/graft_cdc_sink_${System.nanoTime()};create=true"
    val in = MemoryStream[CdcChange]
    val query = StreamOps.cdcApply(in.toDF(), url, "cdc_mirror")
      .option("checkpointLocation",
        s"${System.getProperty("java.io.tmpdir")}/graft_ckpt_${System.nanoTime()}")
      .start()
    def mirror(): Map[Long, (Long, Long)] = {
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val rs = conn.createStatement().executeQuery(
          "SELECT user_id, last_cents, last_ts_us FROM cdc_mirror")
        val b = scala.collection.mutable.Map[Long, (Long, Long)]()
        while (rs.next()) b += rs.getLong(1) -> (rs.getLong(2), rs.getLong(3))
        b.toMap
      } finally conn.close()
    }
    try {
      // batch 1: two upserts
      in.addData(
        CdcChange(1L, "purchase", 100L, 1000L, 1L),
        CdcChange(2L, "view", 200L, 1001L, 2L))
      query.processAllAvailable()
      assert(mirror() == Map(1L -> (100L, 1000L), 2L -> (200L, 1001L)))
      // batch 2: tombstone for user 1, and an OUT-OF-ORDER (older) change
      // for user 2 that must NOT override the newer state
      in.addData(
        CdcChange(1L, "error", 0L, 2000L, 3L),
        CdcChange(2L, "click", 999L, 500L, 0L))
      query.processAllAvailable()
      assert(mirror() == Map(2L -> (200L, 1001L)), s"got ${mirror()}")
      // batch 3: user 1 re-inserts after the delete — newer upsert wins
      in.addData(CdcChange(1L, "purchase", 300L, 3000L, 4L))
      query.processAllAvailable()
      assert(mirror() == Map(1L -> (300L, 3000L), 2L -> (200L, 1001L)))
    } finally query.stop()
  }
}
