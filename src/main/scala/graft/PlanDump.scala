package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val names = Seq("join_star_flagship", "scan_pushdown_filter", "join_asof",
      "agg_hash_groupby", "llm_sim_cosine_topk", "llm_dedup_minhash", "topk_global",
      "stream_interval_join", "set_ops_all", "llm_lang_id")
    names.foreach { n =>
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, dir).queryExecution
        .explainString(ExplainMode.fromString("formatted")).take(4000))
    }
    spark.stop()
  }
}
