package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: per-stage laps inside the k-core peel. */
object ProbeKC {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    SparkEntry.queries("scan_parquet_project")(spark, dir).count()
    val docs = graft.tables.Tables.t(spark, dir, "documents").filter(col("doc_id") < 1200)
    var t0 = System.nanoTime()
    def lap(tag: String): Unit = {
      println(f"$tag%-16s ${(System.nanoTime() - t0) / 1e9}%.3f s"); t0 = System.nanoTime()
    }
    val e = graft.queries.GraphQueries.simEdgesCapped(docs, graft.operators.HotKeys.DefaultCap).cache()
    var adj = e.union(e.select(col("v").as("u"), col("u").as("v"))).cache()
    println(s"edges=${adj.count()}"); lap("SYMADJ")
    for (r <- 1 to 3) {
      val alive = adj.groupBy("u").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= 3).select("u").persist()
      println(s"alive=${alive.count()}"); lap(s"ALIVE$r")
      adj = adj.join(broadcast(alive), Seq("u"), "left_semi")
        .join(broadcast(alive.withColumnRenamed("u", "v")), Seq("v"), "left_semi")
        .select("u", "v")
    }
    val res = adj.groupBy(col("u").as("node")).agg(count(lit(1)).as("core_deg"))
      .orderBy(desc("core_deg"), col("node")).limit(50)
    println(s"rows=${res.count()}"); lap("FINAL")
    println(s"rows=${res.count()}"); lap("FINAL2")
    spark.stop()
  }
}
