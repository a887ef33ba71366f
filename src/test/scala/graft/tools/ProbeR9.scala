package graft
import org.apache.spark.sql.SparkSession

/** Scratch: isolated two-pass timings for the round-9 graph fixes
  * (k-core alive-set rewrite, components loop) — run per SF dir. */
object ProbeR9 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args(1).split(",").toSeq
      else Seq("graph_k_core", "graph_components")
    SparkEntry.queries("scan_parquet_project")(spark, dir).count() // warm-up
    for (p <- 1 to 2; n <- names) {
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(n)(spark, dir).count()
      println(f"pass$p $n%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$rows")
    }
    spark.stop()
  }
}
