package graft
import org.apache.spark.sql.SparkSession

/** Scratch: graph_components with AQE on vs off — is the flat per-batch
  * cost the adaptive re-planning round-trips on the deep fold chains? */
object ProbeCC3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    SparkEntry.queries("scan_parquet_project")(spark, dir).count()
    for (p <- 1 to 2; aqe <- Seq("true", "false")) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries("graph_components")(spark, dir).count()
      println(f"pass$p aqe=$aqe%-5s graph_components ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$rows")
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
