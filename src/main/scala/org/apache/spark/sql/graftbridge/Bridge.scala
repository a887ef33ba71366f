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
