package graft
import org.apache.spark.sql.SparkSession
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    SparkEntry.queries("scan_parquet_project")(spark, dir).count() // warm-up
    for (name <- args.drop(1)) {
      var best = Double.MaxValue
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"$name%-28s $best%.3f s")
    }
    spark.stop()
  }
}
