package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: COLD cost of the 32-round deep BPE train at a given SF —
  * the bench's min-of-two-passes hides the one-time training behind the
  * (session, dir) memo, so the cold number needs its own fresh-session
  * measurement (the r10 VERDICT's "sf0.1 cost ≤ ~2× the train+encode
  * pair" budget is about THIS number). Run:
  *   sbt 'Test/runMain graft.tools.ProbeBpeDeep /root/testdata/sf0.1'
  */
object ProbeBpeDeep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the parquet reader/codegen so the probe times BPE, not startup
    spark.read.parquet(s"$dir/documents.parquet").count()
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def time(key: String, label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      out(key) = sec
      println(f"[probe] $label: $sec%.2f s (rows=$n)")
    }
    time("llm_bpe_vocab_apply_cold", "llm_bpe_vocab_apply COLD (32-round train + readout)") {
      graft.queries.LlmExtra.llmBpeVocabApply(spark, dir).count()
    }
    time("llm_bpe_vocab_apply_warm", "llm_bpe_vocab_apply WARM (memoized)") {
      graft.queries.LlmExtra.llmBpeVocabApply(spark, dir).count()
    }
    time("llm_bpe_train_cold", "llm_bpe_train COLD (6-round)") {
      graft.queries.LlmExtra.llmBpeTrain(spark, dir).count()
    }
    time("llm_bpe_encode_cold", "llm_bpe_encode (apply 6 merges over probe slice)") {
      graft.queries.LlmExtra.llmBpeEncode(spark, dir).count()
    }
    // committed artifact (BENCH_BPEDEEP.json) so BASELINE.md's cold-cost
    // citations stay check_baseline.py-verifiable
    val json = out.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_BPEDEEP.json"),
      s"""{"metric":"bpe_deep_cold","queries":$json,"sf":"$dir"}\n""")
    spark.stop()
  }
}
