package graft

import org.apache.spark.sql.functions._

/** AQE runtime skew-join splitting (SURVEY §6: "skewed keys → salting or
  * AQE skew-join"). The manual salted join (operators.SkewJoin) handles
  * known-ahead skew; this pins the runtime path: AQE detects the skewed
  * shuffle partition from actual map output sizes and splits it without
  * any query change. */
class AqeSkewSpec extends GraftSpec {

  test("AQE splits a skewed join partition at runtime") {
    import SparkSpecBase.spark.implicits._
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // shrink thresholds so the test-sized skew (one hot key with ~90%
      // of rows) is detected: a partition is "skewed" at 5x median and
      // ≥ 32KB, and gets split into ~16KB target chunks
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // left: 50k rows, 90% on hot key 7 with a fat payload; the other
      // 10% (ids divisible by 10) spread over keys 0..6 via % 7 (coprime
      // with 10, so the spread really hits multiple keys); right: 5k rows
      // uniform over keys 0..9
      val left = spark.range(50000)
        .select(when(col("id") % 10 === 0, col("id") % 7).otherwise(7L).as("k"),
          concat(lit("x" * 200), col("id").cast("string")).as("payload"))
      val right = spark.range(5000)
        .select((col("id") % 10).as("k"), col("id").as("rid"))
      val joined = left.join(right, "k")
      // run THIS queryExecution (a separate .count() would plan its own
      // query and leave this one's AQE plan unfinalized)
      val qe = joined.queryExecution
      val n = qe.executedPlan.execute().count()
      // every right key 0..9 has exactly 500 rows, so each left row —
      // hot or not — matches 500 right rows
      val expected = 50000L * 500
      assert(n == expected, s"row count $n != $expected")
      val plan = qe.executedPlan.toString
      assert(plan.toLowerCase.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${plan.take(3000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
