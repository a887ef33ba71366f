package graft.operators

import org.apache.spark.sql.DataFrame

/** Bucketed storage for co-located joins (SURVEY §6 / the 100 TB
  * posture: "co-locate joins via bucketing").
  *
  * A fact table that is repeatedly joined on the same key (orders ⋈
  * customer on custkey, lineitem ⋈ orders on orderkey) pays one shuffle
  * per query forever. Bucketing pays that shuffle ONCE at write time:
  * `bucketBy(n, key)` hash-partitions rows into n files per partition
  * and records the bucket spec in the catalog, so every later join or
  * aggregation on the key reads both sides already co-partitioned —
  * Catalyst plans a SortMergeJoin with NO Exchange on either side
  * (asserted by BucketingSpec).
  *
  * At 100 TB: bucket count should be sized so each bucket file lands in
  * the 128 MB–1 GB range (e.g. ~1024 buckets for a 1 TB table), and both
  * sides of the recurring join must use the same count — Spark only
  * elides the shuffle when bucket counts match (or divide evenly with
  * `spark.sql.bucketing.coalesceBucketsInJoin.enabled`).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted catalog table. `saveAsTable` is
    * required: the bucket spec lives in catalog metadata, not in the
    * parquet files (a plain `.parquet(path)` write silently drops it).
    * Drops both the catalog entry AND any orphaned warehouse directory
    * first — `mode("overwrite")` only replaces tables the CURRENT
    * session's catalog knows about, and errors on a stale location left
    * by an earlier session ([LOCATION_ALREADY_EXISTS]). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = java.net.URI.create(s.conf.get("spark.sql.warehouse.dir")).getPath
    val loc = new java.io.File(wh, table)
    if (loc.exists())
      org.apache.spark.network.util.JavaUtils.deleteRecursively(loc)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }
}
