package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-16 scratch probe: wall time of hIndexEstimates variants over
  * the family graph — straight vs convergence-halved chain, raw cached
  * adjacency vs stats-fresh view (plan-size axis). Run each variant in
  * its own invocation arg to keep persists independent:
  *   Test/runMain graft.ProbeR16 <straight|halved> <raw|view>
  */
object ProbeR16 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val halved = args.headOption.contains("halved")
    val useView = args.length > 1 && args(1) == "view"
    val adjRaw = graft.queries.GraphQueries.symAdj(spark, dir)
    println(s"[probe] edges=${adjRaw.count()} halved=$halved view=$useView")
    val adj =
      if (useView) org.apache.spark.sql.graftbridge.Bridge.freshStatsView(adjRaw)
      else adjRaw
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val (prev, fin) = graft.queries.GraphQueries.hIndexEstimates(adj, 12, halved)
      val n = fin.count()
      println(f"[probe] run$i hIndex12 ${(System.nanoTime() - t0) / 1e9}%.3f s (rows=$n)")
      prev.unpersist(blocking = true); fin.unpersist(blocking = true)
    }
    spark.stop()
  }
}
