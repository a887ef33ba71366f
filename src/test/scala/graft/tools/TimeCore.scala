package graft
import org.apache.spark.sql.SparkSession

/** Dev probe: graph_core_full / graph_pagerank_converged cost breakdown
  * at sf0.1 — is the 12-round lazy chain paying AQE re-planning? */
object TimeCore {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def tt[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm the family memo so the probe isolates the query's own cost
    tt("warm (components)")(
      graft.queries.GraphQueries.graphComponents(spark, dir).collect().length)
    tt("core_full pass 1")(
      graft.queries.GraphQueries.graphCoreFull(spark, dir).collect().length)
    tt("core_full pass 2")(
      graft.queries.GraphQueries.graphCoreFull(spark, dir).collect().length)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    tt("core_full AQE off")(
      graft.queries.GraphQueries.graphCoreFull(spark, dir).collect().length)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    tt("core_full AQE off, 8 parts")(
      graft.queries.GraphQueries.graphCoreFull(spark, dir).collect().length)
    spark.stop()
  }
}
