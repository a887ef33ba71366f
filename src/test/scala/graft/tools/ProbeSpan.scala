package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch: stage timings for the round-9 two-pass llm_dup_span at a
  * given SF — where do the seconds actually go. */
object ProbeSpan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val K = 40
    def t(name: String) = spark.read.parquet(s"$dir/$name.parquet")
    var t0 = System.nanoTime()
    def lap(tag: String): Unit = {
      println(f"$tag%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      t0 = System.nanoTime()
    }
    def grams(withPos: Boolean) = {
      val base = t("documents")
        .select(col("doc_id"), col("text"))
        .withColumn("pos", explode(expr(
          s"IF(length(text) >= $K, sequence(1, length(text) - ${K - 1}), array_repeat(1, 0))")))
      val gh = coalesce(
        conv(substring(md5(expr(s"substr(text, pos, $K)")), 1, 15), 16, 10).cast("long"),
        lit(0L)).as("gh")
      if (withPos) base.select(col("doc_id"), col("pos"), gh)
      else base.select(col("doc_id"), gh)
    }
    val n = grams(withPos = false).count()
    lap(s"DERIVE1($n)")
    println(s"input partitions: ${t("documents").rdd.getNumPartitions}, " +
      s"gram partitions: ${grams(withPos = false).rdd.getNumPartitions}")
    lap("PARTCOUNT")
    // force every md5 without an aggregation shuffle: max of gh
    val s1 = grams(withPos = false).agg(max("gh")).head.getLong(0)
    lap(s"MD5ONLY($s1)")
    // repartition the DOCUMENTS (pre-explode) so md5 runs on all cores
    def gramsWide = {
      val base = t("documents")
        .select(col("doc_id"), col("text"))
        .repartition(32)
        .withColumn("pos", explode(expr(
          s"IF(length(text) >= $K, sequence(1, length(text) - ${K - 1}), array_repeat(1, 0))")))
      base.select(col("doc_id"),
        coalesce(conv(substring(md5(expr(s"substr(text, pos, $K)")), 1, 15), 16, 10)
          .cast("long"), lit(0L)).as("gh"))
    }
    val s2 = gramsWide.agg(max("gh")).head.getLong(0)
    lap(s"MD5WIDE($s2)")
    val dupg = grams(withPos = false).groupBy("gh")
      .agg(min("doc_id").as("d0"), max("doc_id").as("d1"))
      .filter(col("d0") =!= col("d1"))
      .select("gh")
    val nd = dupg.count()
    lap(s"CENSUS($nd)")
    val marked = grams(withPos = true).join(dupg, Seq("gh"), "left_semi")
    val nm = marked.count()
    lap(s"MARKBACK($nm)")
    val ord = Window.partitionBy("doc_id").orderBy("pos")
    val runs = marked
      .withColumn("isl", col("pos") - row_number().over(ord))
      .groupBy("doc_id", "isl").agg(count(lit(1)).as("run"))
    val nr = runs.count()
    lap(s"ISLANDS($nr)")
    println("== markback plan ==")
    println(marked.queryExecution.executedPlan.toString.take(2500))
    spark.stop()
  }
}
