package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (round-12, judge-requested): the graph family's loops are
  * constant-size at toy SF by construction (the shared similarity graph
  * caps at doc_id < 1200), so the ladder never exercises their
  * per-round cost on a BIG graph. This probe builds the same
  * two-blocking graph WITHOUT the 1200-doc cap over a scaled documents
  * table (default /tmp/graft_sf100, doc_id < maxDoc) and times the
  * three loop engines — components min-label fixpoint, the 12-round
  * h-index core chain, and 12 integer pagerank rounds — at ~10⁶ edges.
  * Run:
  *   sbt 'Test/runMain graft.tools.ProbeGraphScale /tmp/graft_sf100 <maxDoc>'
  * Artifact: SCALE_GRAPH.json (cited by docs/SCALE.md).
  */
object ProbeGraphScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf100")
    val maxDoc = if (args.length > 1) args(1).toLong else 40000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < maxDoc)
      .select("doc_id", "source", "lang", "n_chars")
    // same construction as the query-facing graph, same 4096 block cap
    val e = graft.queries.GraphQueries.simEdgesCapped(docs, 4096).cache()
    val nEdges = e.count()
    val adj = e.union(e.select(col("v").as("u"), col("u").as("v"))).cache()
    val nDirected = adj.count()
    val nNodes = adj.select("u").distinct().count()
    println(f"[probe] graph at maxDoc=$maxDoc: $nNodes%d nodes, $nEdges%d undirected edges")
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def time(key: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      out(key) = sec
      println(f"[probe] $key: $sec%.2f s (rows=$n)")
    }
    time("components_fixpoint") {
      graft.operators.Components.minLabel(
          adj.select(col("u").as("src"), col("v").as("dst")))
        .groupBy("label").agg(count(lit(1))).count()
    }
    time("core_full_12_rounds") {
      graft.queries.GraphQueries.coreFullOn(adj, 12).count()
    }
    // 12 integer pagerank rounds, the graph_pagerank convention: ranks
    // in 1e-6 units, floor-div contributions, damping 150000 + 850·Σ/1000
    time("pagerank_12_rounds") {
      val outDeg = adj.groupBy("u").agg(count(lit(1)).as("od")).cache()
      outDeg.count()
      var rank = adj.select(col("u").as("node")).distinct()
        .select(col("node"), lit(1000000L).as("r"))
      for (i <- 1 to 12) {
        val contrib = adj
          .join(rank.select(col("node").as("u"), col("r")), "u")
          .join(outDeg, "u")
          .select(col("v").as("node"), call_function("div", col("r"), col("od")).as("c"))
          .groupBy("node").agg(sum("c").as("sc"))
        rank = rank.select(col("node"))
          .join(contrib, Seq("node"), "left")
          .select(col("node"),
            (lit(150000L) + call_function("div", lit(850L) * coalesce(col("sc"), lit(0L)), lit(1000L))).as("r"))
          .localCheckpoint(true)
      }
      rank.agg(sum("r")).collect()
      rank.count()
    }
    val json = out.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get("SCALE_GRAPH.json"),
      s"""{"metric":"graph_scale_probe","n_nodes":$nNodes,"n_edges":$nEdges,"n_directed":$nDirected,"max_doc":$maxDoc,"queries":$json,"sf":"$dir"}\n""")
    spark.stop()
  }
}
