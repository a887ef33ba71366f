package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.classic.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** `Dataset.ofRows` is `private[sql]`; this one-method bridge lives in an
  * `org.apache.spark.sql` subpackage solely to lift a custom LogicalPlan
  * into the public DataFrame API (the standard technique for Spark-native
  * libraries that add whole operators — nothing else from the private
  * surface is touched). */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(spark, plan)

  /** Stats-resetting view over an (already-checkpointed) frame -- the
    * k^r lineage lesson's SEQUEL: `Dataset.localCheckpoint` truncates
    * the logical PLAN but copies the source plan's computed STATISTICS
    * onto the LogicalRDD (`LogicalRDD.fromDataset` originStats). A loop
    * whose round joins its checkpointed predecessor j times then
    * compounds the sizeInBytes VALUE round over round (~ s^(j^r)): by
    * round ~10 the BigInt carries millions of digits and the stats
    * visitor's multiplications dominate planning (measured: 32-round
    * BPE never finished round 12; with this reset, flat). Re-wrapping
    * the checkpointed RDD in a fresh LogicalRDD WITHOUT originStats
    * restarts every round from default leaf stats. The caller keeps
    * the checkpointed source frame for unpersist -- this view reads its
    * blocks but cannot release them. */
  def freshStatsView(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cdf = df.asInstanceOf[DataFrame]
    val qe = cdf.queryExecution
    val plan = org.apache.spark.sql.execution.LogicalRDD(
      qe.analyzed.output, qe.toRdd)(cdf.sparkSession)
    org.apache.spark.sql.classic.Dataset.ofRows(cdf.sparkSession, plan)
  }

  /** Test-only introspection of a SparkSessionExtensions instance (the
    * build* methods are private[sql]): lets ExtensionsSpec assert what
    * `spark.sql.extensions=graft.udx.GraftExtensions` would register
    * without needing a fresh JVM-first session. */
  def plannerStrategies(ext: org.apache.spark.sql.SparkSessionExtensions,
      spark: SparkSession): Seq[org.apache.spark.sql.execution.SparkStrategy] =
    ext.buildPlannerStrategies(spark)
  def optimizerRules(ext: org.apache.spark.sql.SparkSessionExtensions,
      spark: SparkSession): Seq[org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]] =
    ext.buildOptimizerRules(spark)
}
