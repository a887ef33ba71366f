package graft
import org.apache.spark.sql.SparkSession

/** Scratch: report queries whose UNEXECUTED physical plan contains a
  * cartesian or nested-loop join. */
object ProbeLint {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, dir).queryExecution.sparkPlan.toString
        val flags = Seq(
          if (p.contains("CartesianProduct")) Some("CARTESIAN") else None,
          if (p.contains("BroadcastNestedLoopJoin")) Some("BNLJ") else None).flatten
        if (flags.nonEmpty) println(s"LINT $name ${flags.mkString(",")}")
      } catch { case e: Throwable => println(s"LINT $name ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
    println("LINT_DONE")
  }
}
