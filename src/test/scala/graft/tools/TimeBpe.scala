package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: where do llm_bpe_train's seconds go at sf0.1? */
object TimeBpe {
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
    tt("llmBpeTrain pass 1")(
      graft.queries.LlmExtra.llmBpeTrain(spark, dir).collect().length)
    tt("llmBpeTrain pass 2")(
      graft.queries.LlmExtra.llmBpeTrain(spark, dir).collect().length)
    tt("llmBpeEncode pass 1")(
      graft.queries.LlmExtra.llmBpeEncode(spark, dir).collect().length)
    tt("llmBpeEncode pass 2")(
      graft.queries.LlmExtra.llmBpeEncode(spark, dir).collect().length)
    spark.stop()
  }
}
