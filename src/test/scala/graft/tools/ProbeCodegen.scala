package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: confirm WholeStageCodegen fuses the custom join execs. */
object ProbeCodegen {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[4]")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    import spark.implicits._
    val l = Seq((1L, 1L, 100L), (1L, 1L, 200L)).toDF("id", "k", "t")
    val r = Seq((9L, 1L, 150L)).toDF("rid", "rk", "rt")
    val a = graft.plans.AsOf.join(l, r, "k", "t", "rk", "rt")
      .groupBy("k").count()
    a.collect()
    println("PLAN_A_START\n" + a.queryExecution.executedPlan + "PLAN_A_END")
    val i = graft.plans.IntervalJoinApi.join(l, r, "k", "t", "rk", "rt", 1000L)
      .groupBy("k").count()
    i.collect()
    println("PLAN_I_START\n" + i.queryExecution.executedPlan + "PLAN_I_END")
    spark.stop()
  }
}
