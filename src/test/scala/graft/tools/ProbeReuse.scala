package graft
import org.apache.spark.sql.SparkSession

/** Scratch: execute one query and print the FINAL (AQE) plan, where
  * ReusedExchange/stage reuse is visible. */
object ProbeReuse {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.01")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    println("REUSED_EXCHANGE_COUNT=" + "ReusedExchange".r.findAllIn(p).size)
    println("TABLE_CACHE=" + "InMemory".r.findAllIn(p).size)
    println(p.linesIterator.filter(l => l.contains("Reused") || l.contains("Scan parquet")).mkString("\n").take(1500))
    spark.stop()
  }
}
