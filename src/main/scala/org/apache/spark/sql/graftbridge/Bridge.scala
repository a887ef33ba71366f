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
}
