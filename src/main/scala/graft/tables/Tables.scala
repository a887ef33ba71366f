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
}
