package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamOps

/** Checkpoint recovery: a streaming query stopped and restarted from its
  * checkpoint must recover BOTH source offsets (no reprocessing) and
  * StateStore contents (dedup keys seen before the restart stay seen) —
  * the exactly-once property a production pipeline restarts rely on. */
class StreamRecoverySpec extends GraftSpec {

  private val schema = StructType(Seq(
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  test("dedup state and source offsets survive a checkpointed restart") {
    import SparkSpecBase.spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_recovery").toFile
    root.deleteOnExit()
    val in = s"$root/in"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    def ts(s: String) = Timestamp.valueOf(s)
    def writeBatch(name: String, rows: Seq[(Timestamp, Long, String, Double)]): Unit =
      rows.toDF("ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(in)

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(in)
      val q = StreamOps.dedupFirst(stream).writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()
      try q.processAllAvailable() finally q.stop()
    }

    // run 1: two distinct keys
    writeBatch("b1", Seq(
      (ts("2024-01-01 10:00:00"), 1L, "click", 1.0),
      (ts("2024-01-01 10:01:00"), 2L, "view", 2.0)))
    runOnce()
    assert(spark.read.parquet(out).count() == 2)

    // run 2 (fresh query object, same checkpoint): a duplicate of a
    // pre-restart key plus one new key. If StateStore recovery works the
    // duplicate is dropped; if offset recovery works batch 1 is not
    // reprocessed.
    writeBatch("b2", Seq(
      (ts("2024-01-01 10:05:00"), 1L, "click", 99.0), // dup across restart
      (ts("2024-01-01 10:06:00"), 3L, "purchase", 3.0)))
    runOnce()

    val rows = spark.read.parquet(out)
      .select("user_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(rows == Set((1L, "click", 1.0), (2L, "view", 2.0), (3L, "purchase", 3.0)),
      s"got $rows")
  }

  test("interval-join state survives a checkpointed restart (pre-restart click matches post-restart purchase)") {
    import SparkSpecBase.spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_rec_ij").toFile
    root.deleteOnExit()
    val (cin, pin, out, ckpt) = (s"$root/clicks", s"$root/purch", s"$root/out", s"$root/ckpt")
    def ts(s: String) = Timestamp.valueOf(s)
    def write(dir: String, rows: Seq[(Timestamp, Long, String, Double)]): Unit =
      rows.toDF("ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(dir)

    def runOnce(): Unit = {
      val clicks = spark.readStream.schema(schema).parquet(cin)
      val purchases = spark.readStream.schema(schema).parquet(pin)
      val q = StreamOps.intervalJoin(clicks, purchases).writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()
      try q.processAllAvailable() finally q.stop()
    }

    // run 1: one click and one in-window purchase → one match; the
    // click stays in join state (watermark hasn't passed click_ts+1h)
    write(cin, Seq((ts("2024-01-01 10:00:00"), 1L, "click", 0.0)))
    write(pin, Seq((ts("2024-01-01 10:20:00"), 1L, "purchase", 5.0)))
    runOnce()
    assert(spark.read.parquet(out).count() == 1)

    // run 2 (fresh query, same checkpoint): a SECOND purchase for the
    // pre-restart click (state recovery must produce the match) plus a
    // fresh click+purchase pair (plain progress). Offset recovery must
    // not re-emit run 1's match.
    write(pin, Seq((ts("2024-01-01 10:40:00"), 1L, "purchase", 7.0)))
    write(cin, Seq((ts("2024-01-01 10:30:00"), 2L, "click", 0.0)))
    write(pin, Seq((ts("2024-01-01 10:50:00"), 2L, "purchase", 9.0)))
    runOnce()

    val rows = spark.read.parquet(out)
      .select("user_id", "click_ts", "p_ts", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getTimestamp(2).toString, r.getDouble(3)))
      .toSet
    assert(rows == Set(
      (1L, "2024-01-01 10:00:00.0", "2024-01-01 10:20:00.0", 5.0),
      (1L, "2024-01-01 10:00:00.0", "2024-01-01 10:40:00.0", 7.0),
      (2L, "2024-01-01 10:30:00.0", "2024-01-01 10:50:00.0", 9.0)), s"got $rows")
  }

  test("bounded-dedup state survives a checkpointed restart (same-hour dup dropped, next-hour admitted)") {
    import SparkSpecBase.spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_rec_dd").toFile
    root.deleteOnExit()
    val (in, out, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    def ts(s: String) = Timestamp.valueOf(s)
    def write(rows: Seq[(Timestamp, Long, String, Double)]): Unit =
      rows.toDF("ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(in)

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(in)
      val q = StreamOps.dedupBounded(stream).writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()
      try q.processAllAvailable() finally q.stop()
    }

    // run 1: first occurrence of (u1, click, hour 10)
    write(Seq((ts("2024-01-01 10:00:00"), 1L, "click", 1.0)))
    runOnce()
    assert(spark.read.parquet(out).count() == 1)

    // run 2: a same-hour duplicate (must be dropped by RESTORED state —
    // the watermark after run 1 is 08:00, so the key wasn't evicted)
    // and a next-hour recurrence (a new row by the bounded contract)
    write(Seq(
      (ts("2024-01-01 10:10:00"), 1L, "click", 99.0),
      (ts("2024-01-01 11:05:00"), 1L, "click", 2.0)))
    runOnce()

    val rows = spark.read.parquet(out)
      .select("user_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(rows == Set((1L, "click", 1.0), (1L, "click", 2.0)), s"got $rows")
  }

  test("left-outer interval-join state survives a checkpointed restart (restored click matches late purchase; unmatched click null-emits post-restart)") {
    import SparkSpecBase.spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_rec_loj").toFile
    root.deleteOnExit()
    val (cin, pin, out, ckpt) = (s"$root/clicks", s"$root/purch", s"$root/out", s"$root/ckpt")
    def ts(s: String) = Timestamp.valueOf(s)
    def write(dir: String, rows: Seq[(Timestamp, Long, String, Double)]): Unit =
      rows.toDF("ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(dir)

    def runOnce(): Unit = {
      val clicks = spark.readStream.schema(schema).parquet(cin)
      val purchases = spark.readStream.schema(schema).parquet(pin)
      val q = StreamOps.leftOuterIntervalJoin(clicks, purchases).writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()
      try q.processAllAvailable() finally q.stop()
    }

    // run 1: u2 click+purchase (inner match emits immediately); u1 click
    // with no purchase yet — it must stay in join state across the
    // restart (its null row is not emittable: watermark is 10:00, well
    // short of click_ts + 30min)
    write(cin, Seq(
      (ts("2024-01-01 10:00:00"), 1L, "click", 0.0),
      (ts("2024-01-01 10:00:00"), 2L, "click", 0.0)))
    write(pin, Seq((ts("2024-01-01 10:10:00"), 2L, "purchase", 5.0)))
    runOnce()
    assert(spark.read.parquet(out).count() == 1)

    // run 2 (fresh query, same checkpoint): a late purchase for the
    // pre-restart u1 click (state recovery must produce the match), a
    // u4 click that will never match, and a u3 pair far enough ahead to
    // push the global watermark (min over both inputs) past
    // u4.click_ts + 30min so u4's null row becomes emittable
    write(pin, Seq((ts("2024-01-01 10:25:00"), 1L, "purchase", 7.0)))
    write(cin, Seq((ts("2024-01-01 10:40:00"), 4L, "click", 0.0)))
    write(cin, Seq((ts("2024-01-01 11:30:00"), 3L, "click", 0.0)))
    write(pin, Seq((ts("2024-01-01 11:40:00"), 3L, "purchase", 9.0)))
    runOnce()
    // run 3 (second restart): one more watermark nudge on BOTH inputs
    // (distinct users — no new matches) in case u4's null emission
    // needed a data batch after the watermark commit; exactly-once
    // means nothing already written may re-emit
    write(cin, Seq((ts("2024-01-01 12:30:00"), 6L, "click", 0.0)))
    write(pin, Seq((ts("2024-01-01 12:30:00"), 5L, "purchase", 1.0)))
    runOnce()

    val rows = spark.read.parquet(out)
      .select("user_id", "click_ts", "p_ts", "value").collect()
      .map(r => (r.getLong(0),
        Option(r.getTimestamp(1)).map(_.toString).orNull,
        Option(r.getTimestamp(2)).map(_.toString).orNull,
        if (r.isNullAt(3)) null else r.getDouble(3).toString))
      .toSet
    assert(rows == Set(
      (2L, "2024-01-01 10:00:00.0", "2024-01-01 10:10:00.0", "5.0"),
      (1L, "2024-01-01 10:00:00.0", "2024-01-01 10:25:00.0", "7.0"),
      (3L, "2024-01-01 11:30:00.0", "2024-01-01 11:40:00.0", "9.0"),
      (4L, "2024-01-01 10:40:00.0", null, null)), s"got $rows")
  }

  test("incremental EWMA state survives a checkpointed restart (post-restart value folds into restored state)") {
    import SparkSpecBase.spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_rec_ew").toFile
    root.deleteOnExit()
    val (in, ckpt) = (s"$root/in", s"$root/ckpt")
    def ts(s: String) = Timestamp.valueOf(s)
    def write(rows: Seq[(Timestamp, Long, String, Double)]): Unit =
      rows.toDF("ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(in)

    // memory sink refuses checkpoint recovery, so each run collects its
    // update-mode batches through a foreachBatch sink (which supports
    // restart) into a driver-side buffer
    def runOnce(): Set[(Long, Long, Long)] = {
      val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      val stream = spark.readStream.schema(schema).parquet(in)
        .as[graft.streaming.UserEvent]
      // typed function value sidesteps the Scala/Java foreachBatch
      // overload ambiguity
      val fn: (org.apache.spark.sql.Dataset[graft.streaming.Stateful.UserEwma], Long) => Unit =
        (ds, _) => got ++= ds.collect().map(u => (u.user_id, u.ew_cents, u.n_obs))
      val q = graft.streaming.Stateful.runningEwma(stream).writeStream
        .foreachBatch(fn)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update()).start()
      try q.processAllAvailable() finally q.stop()
      got.toSet
    }

    // run 1: u1 value 100.00 → ew = 10000 cents, n = 1
    write(Seq((ts("2024-01-01 10:00:00"), 1L, "purchase", 100.0)))
    assert(runOnce() == Set((1L, 10000L, 1L)))

    // run 2 (fresh query, same checkpoint): u1 value 200.00.
    // Restored state: ew = (20000 + 3*10000)/4 = 12500, n = 2.
    // Lost state would yield (20000, 1).
    write(Seq((ts("2024-01-01 10:30:00"), 1L, "purchase", 200.0)))
    assert(runOnce() == Set((1L, 12500L, 2L)))
  }

  test("transformWithState TTL eviction is honored ACROSS a checkpointed restart " +
      "(expired key folds fresh, not into stale restored state)") {
    // TwsSpec pins that live state carries across a restart (TimeMode
    // .None and a generous 1h TTL). The inverse contract is just as
    // load-bearing at 100 TB/day and only testable through a restart:
    // the TTL expiration deadline is PERSISTED with the value, so a key
    // whose TTL lapsed while the query was DOWN must read as absent
    // after restore — a restart must not resurrect expired state. Lost
    // contract here = unbounded key spaces silently stop being bounded
    // at exactly the moment ops restarts the job.
    import SparkSpecBase.spark.implicits._
    import graft.streaming.Tws
    import graft.streaming.Tws.{CentEvent, UserTotals}
    val spark = SparkSpecBase.spark
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val root = java.nio.file.Files.createTempDirectory("graft_tws_evict").toFile
      root.deleteOnExit()
      val (in, ckpt) = (s"$root/in", s"$root/ckpt")
      val inSchema = StructType(Seq(
        StructField("user_id", LongType), StructField("us", LongType),
        StructField("cents", LongType)))
      def write(rows: Seq[CentEvent]): Unit =
        rows.toDF().coalesce(1).write.mode("append").parquet(in)
      val ttl = java.time.Duration.ofSeconds(3)
      // ProcessingTime mode never quiesces (timer micro-batches), so
      // poll the sink for the target emission then stop — the TwsSpec
      // TTL-run convention
      def runOnce(until: Set[(Long, Long, Long, Long)] => Boolean)
          : Set[(Long, Long, Long, Long)] = {
        val got = java.util.concurrent.ConcurrentHashMap
          .newKeySet[(Long, Long, Long, Long)]()
        val stream = spark.readStream.schema(inSchema).parquet(in).as[CentEvent]
        val fn: (org.apache.spark.sql.Dataset[UserTotals], Long) => Unit =
          (ds, _) => ds.collect().foreach(u =>
            got.add((u.user_id, u.n_events, u.total_cents, u.last_us)))
        val q = Tws.userTotalsStream(stream, Some(ttl))
          .writeStream.foreachBatch(fn)
          .option("checkpointLocation", ckpt)
          .outputMode(OutputMode.Update()).start()
        import scala.jdk.CollectionConverters._
        try {
          val deadline = System.currentTimeMillis() + 120000
          while (!until(got.asScala.toSet) && System.currentTimeMillis() < deadline)
            Thread.sleep(200)
        } finally q.stop()
        got.asScala.toSet
      }

      // run 1: u1 and u2 each get state with a 3 s TTL deadline
      write(Seq(CentEvent(1L, 1000L, 250L), CentEvent(2L, 2000L, 999L)))
      val first = Set((1L, 1L, 250L, 1000L), (2L, 1L, 999L, 2000L))
      assert(runOnce(g => first.subsetOf(g)) == first)

      // let the TTL lapse WHILE THE QUERY IS DOWN — the deadline must
      // come from the checkpoint, not from in-memory session state
      Thread.sleep(ttl.toMillis + 3000)

      // run 2 (fresh query, same checkpoint): u1 recurs. A fresh fold
      // (n=1, 150) proves the restored value was read as expired; the
      // stale signature (n=2, 400) proves resurrection of expired state.
      write(Seq(CentEvent(1L, 5000L, 150L)))
      val after = runOnce(_.contains((1L, 1L, 150L, 5000L)))
      assert(after.contains((1L, 1L, 150L, 5000L)),
        s"expired key did not fold fresh after restart: $after")
      assert(!after.exists(r => r._1 == 1L && r._3 == 400L),
        s"restart resurrected TTL-expired state: $after")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("foreachBatch crash AFTER the sink write, BEFORE the commit: restart replays the " +
      "SAME batchId and batchId-keyed idempotent writes stay exactly-once") {
    // the production foreachBatch exactly-once recipe: the sink write is
    // keyed (and overwritten) by batchId, so the one failure window the
    // checkpoint protocol leaves open — crash between the sink's
    // side-effect and the offset-log commit — resolves by REPLAYING the
    // identical batch into an overwrite of the same key. This test
    // injects exactly that crash and asserts both halves: the replay
    // reuses the batchId (same id, same rows), and the final output
    // holds every input row exactly once.
    import SparkSpecBase.spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_rec_fb").toFile
    root.deleteOnExit()
    val (in, out, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    def ts(s: String) = Timestamp.valueOf(s)
    def write(rows: Seq[(Timestamp, Long, String, Double)]): Unit =
      rows.toDF("ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(in)

    val crashArmed = new java.util.concurrent.atomic.AtomicBoolean(true)
    val invocations = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Long, Set[Long])]())
    val fn: (org.apache.spark.sql.DataFrame, Long) => Unit = (df, batchId) => {
      val rows = df.select("user_id").collect().map(_.getLong(0)).toSet
      // batchId-keyed OVERWRITE: a replayed batch lands on the same key
      df.write.mode("overwrite").parquet(s"$out/batch=$batchId")
      invocations.add((batchId, rows))
      if (crashArmed.getAndSet(false))
        throw new RuntimeException("injected crash: sink wrote, commit never happened")
    }
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(in)
      val q = stream.select("ts", "user_id", "event_type", "value").writeStream
        .foreachBatch(fn)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()
      try q.processAllAvailable()
      catch { case _: Exception => () } // the injected crash surfaces here
      finally q.stop()
    }

    write(Seq(
      (ts("2024-01-01 10:00:00"), 1L, "click", 1.0),
      (ts("2024-01-01 10:01:00"), 2L, "view", 2.0)))
    runOnce() // crashes after writing batch 0
    runOnce() // restart: must REPLAY batch 0 (commit log has no entry)
    write(Seq((ts("2024-01-01 10:05:00"), 3L, "purchase", 3.0)))
    runOnce() // plain progress on a new batch

    import scala.jdk.CollectionConverters._
    val invs = invocations.asScala.toList
    val batch0 = invs.filter(_._1 == 0L)
    assert(batch0.length == 2,
      s"batch 0 must run twice (crashed run + replay), saw ${invs.map(_._1)}")
    assert(batch0.map(_._2).distinct.length == 1,
      s"the replay must carry the SAME rows: ${batch0.map(_._2)}")
    assert(invs.map(_._1).distinct.sorted == invs.map(_._1).distinct,
      "batch ids must be monotone")
    // exactly-once effects: every input row exactly once despite the replay
    val got = spark.read.parquet(s"$out/batch=*")
      .select("user_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L, 3L), s"batchId-keyed writes diverged: $got")
  }

  test("cdcApply crash AFTER the JDBC merge commit, BEFORE the offset commit: the " +
      "replayed batch re-merges into the mirror idempotently") {
    // stream_cdc_apply's exactly-once story, crash-tested the same way
    // as the batchId-keyed foreachBatch above: the JDBC merge is keyed
    // DELETE-then-INSERT per user, so the one window the checkpoint
    // protocol leaves open — mirror transaction committed, offset log
    // not — resolves by REPLAYING the batch into an identical keyed
    // merge. Assert all three: the crashed run really committed its
    // merge, the replay leaves the mirror unchanged (no duplicate-key
    // failure, no double effect), and a subsequent tombstone batch
    // still applies on top.
    import SparkSpecBase.spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_rec_cdc").toFile
    root.deleteOnExit()
    val (in, ckpt) = (s"$root/in", s"$root/ckpt")
    val url = s"jdbc:derby:$root/mirror;create=true"
    val cdcSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("cents", LongType), StructField("us", LongType),
      StructField("event_id", LongType)))
    def write(rows: Seq[(Long, String, Long, Long, Long)]): Unit =
      rows.toDF("user_id", "event_type", "cents", "us", "event_id")
        .coalesce(1).write.mode("append").parquet(in)
    def mirror(): Map[Long, (Long, Long)] = {
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val rs = conn.createStatement().executeQuery(
          "SELECT user_id, last_cents, last_ts_us FROM cdc_rec_mirror")
        val b = scala.collection.mutable.Map[Long, (Long, Long)]()
        while (rs.next()) b += rs.getLong(1) -> ((rs.getLong(2), rs.getLong(3)))
        b.toMap
      } finally conn.close()
    }
    val crashArmed = new java.util.concurrent.atomic.AtomicBoolean(true)
    val applied = java.util.Collections.synchronizedList(new java.util.ArrayList[Long]())
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(cdcSchema)
        .option("maxFilesPerTrigger", "1").parquet(in)
      val q = graft.streaming.StreamOps.cdcApply(stream, url, "cdc_rec_mirror", { bid =>
          applied.add(bid)
          if (crashArmed.getAndSet(false))
            throw new RuntimeException("injected crash: mirror merged, offset commit never happened")
        })
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable()
      catch { case _: Exception => () } // the injected crash surfaces here
      finally q.stop()
    }

    write(Seq((1L, "purchase", 100L, 10L, 1L), (2L, "view", 200L, 20L, 2L)))
    runOnce() // merges batch 0 into the mirror, THEN crashes
    assert(mirror() == Map(1L -> ((100L, 10L)), 2L -> ((200L, 20L))),
      "the crashed run must have committed its JDBC merge — that is the window under test")
    runOnce() // restart: replays batch 0; keyed merge must absorb it
    assert(mirror() == Map(1L -> ((100L, 10L)), 2L -> ((200L, 20L))),
      "replaying the committed batch changed the mirror — merge is not idempotent")
    write(Seq((1L, "error", 0L, 30L, 3L), (3L, "click", 300L, 5L, 4L)))
    runOnce() // plain progress: tombstone key 1, insert key 3
    assert(mirror() == Map(2L -> ((200L, 20L)), 3L -> ((300L, 5L))),
      "post-replay batch must still apply (tombstone + insert)")
    import scala.jdk.CollectionConverters._
    val invs = applied.asScala.toList
    assert(invs.count(_ == 0L) == 2, s"batch 0 must merge twice (crash + replay): $invs")
    assert(invs.count(_ == 1L) == 1, s"batch 1 must merge once: $invs")
  }

  test("Trigger.AvailableNow drains a file-source backfill and stops; equals the batch plan") {
    // the replay-history-through-the-streaming-pipeline pattern: a
    // bounded directory read as a STREAM processes everything available,
    // then terminates on its own — same code path as live ingestion
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_backfill_${System.nanoTime()}"
    val src = graft.tables.Tables.t(spark, sfDir, "events")
      .select("ts", "user_id", "event_type", "value")
    src.write.mode("overwrite")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").json(dir)
    val stream = spark.readStream.schema(schema)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .option("maxFilesPerTrigger", "4") // several micro-batches, not one gulp
      .json(dir)
    val sinkName = s"backfill_${System.nanoTime()}"
    val q = StreamOps.tumblingCounts(stream).writeStream
      .format("memory").queryName(sinkName)
      .outputMode(OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "AvailableNow query did not self-terminate")
    val got = spark.table(sinkName).collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).sorted
    val batch = StreamOps.tumblingCounts(src)
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).sorted
    assert(got.length == batch.length && got.sameElements(batch),
      s"backfill ${got.length} rows vs batch ${batch.length}")
  }
}
