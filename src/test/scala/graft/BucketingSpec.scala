package graft

import org.apache.spark.sql.functions._
import graft.operators.Bucketing

/** The co-located-join story (SURVEY §6): bucketed tables join with no
  * Exchange on either side — the write-time shuffle replaces every
  * query-time shuffle. */
class BucketingSpec extends GraftSpec {

  test("bucketed tables join shuffle-free and aggregate shuffle-free on the bucket key") {
    val orders = graft.tables.Tables.t(spark, sfDir, "orders")
    val customer = graft.tables.Tables.t(spark, sfDir, "customer")
    Bucketing.writeBucketed(orders, "b_orders", "o_custkey", 8)
    Bucketing.writeBucketed(customer.withColumnRenamed("c_custkey", "o_custkey"),
      "b_customer", "o_custkey", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the SMJ path
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")

      // row-parity with the plain (shuffling) join
      val plain = orders.join(
        customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
      assert(joined.count() == plain.count())

      // group-by on the bucket key also rides the bucketing: single-phase
      // aggregation, no exchange before the final aggregate
      val agg = spark.table("b_orders").groupBy("o_custkey")
        .agg(count(lit(1)).as("n"))
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"), s"bucketed group-by still shuffles:\n$aggPlan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("custom as-of join over bucketed inputs plans ZERO exchanges") {
    // the declared-distribution payoff: AsOfJoinExec asks for
    // ClusteredDistribution(key) + (key, time) ordering; bucketed tables
    // already provide the distribution, so Catalyst inserts no Exchange —
    // only the in-partition sorts (bucket sort columns don't carry
    // through table reads as a guarantee for this plan shape)
    val ev = graft.tables.Tables.t(spark, sfDir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
    graft.operators.Bucketing.writeBucketed(purchases, "b_purch", "user_id", 8)
    graft.operators.Bucketing.writeBucketed(clicks.withColumnRenamed("c_user", "user_id")
      .withColumnRenamed("click_ts", "ts2"), "b_clicks", "user_id", 8)
    try {
      val df = graft.plans.AsOf.join(
        spark.table("b_purch"), spark.table("b_clicks"),
        "user_id", "ts", "user_id", "ts2")
      df.collect()
      val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      assert(p.contains("AsOfJoin"), p)
      assert(!p.contains("Exchange"), s"as-of over bucketed inputs still shuffles:\n$p")
      // row parity with the unbucketed path
      val plain = graft.plans.AsOf.join(purchases,
        clicks.withColumnRenamed("c_user", "user_id").withColumnRenamed("click_ts", "ts2"),
        "user_id", "ts", "user_id", "ts2")
      assert(df.count() == plain.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_purch")
      spark.sql("DROP TABLE IF EXISTS b_clicks")
    }
  }
}
