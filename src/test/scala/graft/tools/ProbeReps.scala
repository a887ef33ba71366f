package graft
import org.apache.spark.sql.SparkSession

/** Scratch: per-repetition timings for graph queries — separates the
  * memoized-build rep from warm reps. */
object ProbeReps {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = args.drop(1).toSeq match {
      case Nil => Seq("graph_bfs_hops", "graph_components", "graph_modularity", "graph_k_core")
      case xs  => xs
    }
    SparkEntry.queries("scan_parquet_project")(spark, dir).count()
    for (name <- names; rep <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      println(f"$name%-26s rep$rep ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
