package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: stage/round instrumentation for graph_components' minLabel
  * loop — current batched logic with per-phase laps. */
object ProbeCC2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    SparkEntry.queries("scan_parquet_project")(spark, dir).count()
    // warm the family memo so laps measure the loop, not the edge build
    SparkEntry.queries("graph_degree_stats")(spark, dir).count()
    var t0 = System.nanoTime()
    def lap(tag: String): Unit = {
      println(f"$tag%-14s ${(System.nanoTime() - t0) / 1e9}%.3f s"); t0 = System.nanoTime()
    }
    val docs = graft.tables.Tables.t(spark, dir, "documents").filter(col("doc_id") < 1200)
    val e = graft.queries.GraphQueries.simEdgesCapped(docs, graft.operators.HotKeys.DefaultCap)
    val edges0 = e.union(e.select(col("v").as("u"), col("u").as("v")))
      .select(col("u").as("src"), col("v").as("dst"))
    lap("PLAN")
    val cached0 = edges0.cache()
    val degs = cached0.groupBy(col("dst").as("node"))
      .agg(count(lit(1)).as("_d")).cache()
    val stats = degs.agg(
      coalesce(sum("_d"), lit(0L)), coalesce(max("_d"), lit(0L)),
      coalesce(sum("node"), lit(0L))).head
    lap(s"CENSUS(${stats.getLong(0)})")
    val loopParts = 32
    val nodes = cached0.select(col("src").as("node")).distinct()
    val withLoops = cached0.union(nodes.select(col("node").as("src"), col("node").as("dst")))
    val edges = withLoops.repartition(loopParts, col("dst")).cache()
    var labels = nodes.repartition(loopParts, col("node"))
      .withColumn("label", col("node")).cache()
    var sig = stats.getLong(2)
    lap("SETUP-LAZY")
    def fold(lbl: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      edges.join(lbl, edges("dst") === lbl("node"))
        .select(edges("src").as("node"), col("label"))
        .groupBy("node").agg(min("label").as("label"))
    var folds = 0
    var converged = false
    while (!converged && folds < 24) {
      val folded = Iterator.iterate(labels)(fold).drop(4).next()
      folds += 4
      val next = if (folds % 5 < 4) folded.localCheckpoint(true) else folded.cache()
      lap(s"BATCH$folds-mat")
      val nextSig = next.agg(coalesce(sum("label"), lit(0L))).head.getLong(0)
      labels.unpersist()
      labels = next
      converged = nextSig == sig
      sig = nextSig
      lap(s"BATCH$folds-sig($sig)")
    }
    val res = labels.groupBy("label")
      .agg(count(lit(1)).as("n_nodes"), max("node").as("max_node"))
    println(s"rows=${res.count()}"); lap("FINAL")
    spark.stop()
  }
}
