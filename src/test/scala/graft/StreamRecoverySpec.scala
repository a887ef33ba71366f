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
