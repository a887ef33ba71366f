package graft
import org.apache.spark.sql.SparkSession
object TimeR3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    try SparkEntry.queries("scan_parquet_project")(spark, dir).count() catch { case _: Throwable => () }
    val qs = if (args.nonEmpty) args.toSeq else Seq("llm_dedup_components", "llm_lang_id")
    for (_ <- 1 to 2; q <- qs) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).count()
      println(f"TIME $q ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
