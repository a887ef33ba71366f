package graft
import org.apache.spark.sql.SparkSession

/** Round-16 A/B probe: same queries, alternating
  * spark.sql.adaptive.coalescePartitions.parallelismFirst between
  * passes INSIDE one JVM, so host weather hits both arms equally. */
object ProbeConf {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY",
      "fn_array,agg_stats").split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try SparkEntry.queries("scan_parquet_project")(spark, dir).count()
    catch { case _: Throwable => () }
    val totals = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(0.0)
    for (round <- 1 to 3; pf <- Seq("true", "false")) {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", pf)
      val t0 = System.nanoTime()
      names.foreach { n => SparkEntry.queries(n)(spark, dir).count() }
      val dt = (System.nanoTime() - t0) / 1e9
      totals(pf) += dt
      println(f"[probe] round=$round parallelismFirst=$pf total=$dt%.3f")
    }
    println(f"[probe] SUM true=${totals("true")}%.3f false=${totals("false")}%.3f")
    spark.stop()
  }
}
