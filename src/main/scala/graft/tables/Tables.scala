package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Parquet table access for the driver testdata (TESTDATA.md).
  *
  * One parquet file per table; scans are plain `spark.read.parquet` so
  * Catalyst's column pruning and filter pushdown reach the vectorized
  * parquet reader untouched. At 100 TB these would be directory-backed
  * (partitioned) datasets instead of single files — the call site is the
  * single place to swap that in.
  *
  * IMMUTABILITY ASSUMPTION: callers above this layer (the GraphQueries
  * edge-family memo, LlmExtra's `trainedMerges`) cache values keyed by
  * (session, dir) on the premise that a testdata dir's parquet files
  * never change under a live session. Rewriting `dir` in place while a
  * session that has already read it stays open serves STALE cached
  * derivations — restart the session (or call `releaseCaches()` /
  * `releaseMerges()`) after any in-place rewrite.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts has shipped in two physical forms across testdata
      // generations: INT64 TIMESTAMP(NANOS) (which Spark's reader only
      // accepts as raw longs under the nanosAsLong legacy conf) and plain
      // timestamp[us] (read as TIMESTAMP_NTZ when the footer lacks the
      // UTC-adjusted flag). Branch on the loaded type so every downstream
      // query sees one stable contract: `ts` as session-UTC TimestampType
      // at microsecond precision, regardless of generation.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case LongType =>
          // Raw nanos-as-long: integer DIV keeps full microsecond
          // precision where a double division would round 2024 epochs.
          df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampType => df
        case _ => // TIMESTAMP_NTZ (or other): align to TimestampType.
          df.withColumn("ts", col("ts").cast(TimestampType))
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Widen a NARROW scan to cluster parallelism before explode-amplified
    * work. Token/gram generation multiplies every input row ~|text|
    * times, and the expensive downstream compute (md5/simhash/tokenize)
    * inherits the SCAN's width — a corpus packed into a few big parquet
    * files runs its whole hash pass on a few cores no matter how many
    * exist (measured on the sf1 bench input, which reads as 2
    * partitions: one 13M-gram md5 pass = 23 s narrow vs 1.9 s spread).
    * The round-robin exchange moves only the raw pre-explode rows —
    * a small fraction of the gram stream it unlocks — and at production
    * scale the scan is already wide, making this a no-op branch.
    * Project the needed columns BEFORE spreading so the shuffle carries
    * no dead weight. */
  def spread(spark: SparkSession, df: DataFrame): DataFrame = {
    val width = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < width) df.repartition(width) else df
  }
}
