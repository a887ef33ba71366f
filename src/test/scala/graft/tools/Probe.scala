package graft
import org.apache.spark.sql.SparkSession

/** Scratch probe main for ad-hoc single-query checks during development. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val df = SparkEntry.queries(args(0))(spark, dir)
    df.show(10, false)
    df.printSchema()
    println("rows=" + df.count())
    spark.stop()
  }
}
