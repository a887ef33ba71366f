package graft
import org.apache.spark.sql.SparkSession

/** Scratch: print a stable digest per oracle-exempt query at sf0.001 —
  * row count + hash of the sorted stringified rows. */
object ProbeGolden {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val exempt = Seq(
      "agg_approx_distinct", "agg_approx_percentile", "agg_count_min_sketch",
      "agg_hll_union", "stream_watermark_late", "llm_dedup_minhash",
      "llm_dedup_simhash", "llm_fingerprint", "llm_sim_lsh_topk",
      "llm_sim_ivf_topk", "llm_pack_sequences", "mm_decode_stub",
      "mm_frame_sample", "mm_token_budget", "ingest_census_csv")
    exempt.foreach { n =>
      val rows = SparkEntry.queries(n)(spark, dir).collect().map(_.toString).sorted
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(rows.mkString("\n").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      println(s"""GOLDEN "$n" -> ("${rows.length}", "$h"),""")
    }
    spark.stop()
  }
}
