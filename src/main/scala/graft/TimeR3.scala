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
    val qs = Seq("llm_lang_id", "llm_dedup_embed_cosine", "llm_sim_cosine_topk", "llm_sim_lsh_topk", "llm_sim_ivf_topk",
      "llm_dedup_editdist", "llm_repetition_score", "llm_hash_split", "llm_stratified_sample",
      "window_gaps_islands", "fn_trig", "fn_regexp", "fn_interval_arith", "agg_bit_ops", "sql_lateral_join", "join_null_safe")
    for (_ <- 1 to 2; q <- qs) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).count()
      println(f"TIME $q ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
