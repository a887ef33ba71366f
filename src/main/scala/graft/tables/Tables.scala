package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

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
      // events.ts is INT64 TIMESTAMP(NANOS) in the parquet footer, which
      // Spark's reader rejects outright (PARQUET_TYPE_ILLEGAL). Read the
      // raw nanos as long (legacy conf) and truncate to Spark's native
      // microsecond timestamps here, so every downstream query sees a
      // plain TimestampType column. Integer DIV keeps full precision —
      // a double division would round the microsecond for 2024 epochs.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}
