package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: stage/round instrumentation for graph_components' minLabel
  * loop on the graph family's own edge set (round-9 item 3 — the flat
  * ~7 s across every SF says per-round scheduling, not data, dominates;
  * this prints where it actually goes). */
object ProbeCC2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    // warm-up
    SparkEntry.queries("scan_parquet_project")(spark, dir).count()
    val docs = graft.tables.Tables.t(spark, dir, "documents")
      .filter(col("doc_id") < 1200)
    var t0 = System.nanoTime()
    def lap(tag: String): Unit = {
      println(f"$tag%-12s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      t0 = System.nanoTime()
    }
    val e = graft.queries.GraphQueries.simEdgesCapped(docs, graft.operators.HotKeys.DefaultCap)
    val edges0 = e.union(e.select(col("v").as("u"), col("u").as("v")))
      .select(col("u").as("src"), col("v").as("dst"))
    val cached0 = edges0.cache()
    val nEdges = cached0.count()
    lap(s"EDGES($nEdges)")
    val nodes = cached0.select(col("src").as("node")).distinct()
    val hot = cached0.groupBy(col("dst").as("node"))
      .agg(count(lit(1)).as("_d")).filter(col("_d") > 100000L).select("node").cache()
    val nHot = hot.count()
    lap(s"CENSUS(hot=$nHot)")
    val withLoops = cached0.union(nodes.select(col("node").as("src"), col("node").as("dst")))
    val edges = withLoops.repartition(32, col("dst")).cache()
    edges.count()
    lap("LOOPCACHE")
    var labels = nodes.repartition(32, col("node"))
      .withColumn("label", col("node")).cache()
    var sig = labels.agg(coalesce(sum("label"), lit(0L))).head.getLong(0)
    lap("INIT")
    var rounds = 0
    var converged = false
    while (!converged && rounds < 25) {
      val folded = edges.join(labels, edges("dst") === labels("node"))
        .select(edges("src").as("node"), col("label"))
        .repartition(32, col("node"))
        .groupBy("node").agg(min("label").as("label"))
      val next = if (rounds % 5 == 4) folded.localCheckpoint(true) else folded.cache()
      val nextSig = next.agg(coalesce(sum("label"), lit(0L))).head.getLong(0)
      labels.unpersist()
      labels = next
      converged = nextSig == sig
      sig = nextSig
      rounds += 1
      lap(f"ROUND $rounds sig=$sig")
    }
    spark.stop()
  }
}
