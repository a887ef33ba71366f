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
    // ---- round-13 additions: the COMMUNITY-keyed family (LPA labels,
    // Louvain sweep, modularity censuses). The node-keyed loops above
    // shuffle on node ids (near-uniform); these shuffle on COMMUNITY
    // labels, whose size distribution is power-law after LPA — the one
    // hot-key axis the rungs above never exercise.
    import org.apache.spark.sql.expressions.Window
    val sadj = graft.operators.SaltedAdj(adj.select(col("u"), col("v")))
    var lab: DataFrame = null
    time("lpa_3_rounds") {
      var l = adj.select(col("u").as("node")).distinct()
        .select(col("node"), col("node").as("label"))
      for (_ <- 1 to 3) {
        val nb = sadj.propagate(l)
        val cnt = nb.groupBy("node", "label").agg(count(lit(1)).as("c"))
        val w = Window.partitionBy("node").orderBy(col("c").desc, col("label"))
        l = cnt.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).select("node", "label")
      }
      lab = l.cache()
      lab.count()
    }
    // community-size skew readout: the hottest community's degree mass
    // is the biggest single-reducer key the censuses below see
    val degN = adj.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg")).cache()
    val topC = lab.join(degN, "node").groupBy("label")
      .agg(count(lit(1)).as("n_nodes"), sum("deg").as("deg_mass"))
      .orderBy(desc("deg_mass")).limit(3).collect()
    topC.foreach(r => println(
      s"[probe] community ${r.getLong(0)}: ${r.getLong(1)} nodes, deg_mass ${r.getLong(2)}"))
    val hotMass = if (topC.nonEmpty) topC.head.getLong(2) else 0L
    var moves: DataFrame = null
    time("louvain_sweep_moves") {
      moves = graft.queries.GraphQueries.louvainMovesOn(adj, lab, degN)
        .select(col("node"), col("c").as("to_c"))
        .localCheckpoint(true)
      moves.count()
    }
    time("louvain_q_censuses") {
      // the converged query's per-sweep readout: post-move labels + the
      // exact Q numerator census on BOTH partitions
      val newLab = lab.join(moves, Seq("node"), "left")
        .select(col("node"), coalesce(col("to_c"), col("label")).as("label"))
        .localCheckpoint(true)
      def q(labels: DataFrame): DataFrame = adj
        .join(labels.select(col("node").as("u"), col("label").as("lu")), "u")
        .join(labels.select(col("node").as("v"), col("label").as("lv")), "v")
        .groupBy("lu")
        .agg(count(lit(1)).as("deg_sum"), count_if(col("lu") === col("lv")).as("in_edges"))
        .agg(sum("deg_sum").as("twom"), sum("in_edges").as("in_tot"),
          sum(col("deg_sum") * col("deg_sum")).as("sq"))
        .select((col("twom") * col("in_tot") - col("sq")).as("q"))
      q(lab).union(q(newLab)).collect()
      2L
    }
    // ---- round-14 addition: the CONTRACTION shuffle
    // (graph_louvain_two_level). Contraction is a community×community
    // aggregation over the full adjacency — the modularity census's
    // shuffle shape but with a (cu, cv) composite key whose hottest
    // bucket is hot-community × hot-community; then one weighted sweep
    // on the contracted graph, which must be orders of magnitude
    // cheaper than any full-graph rung (Louvain's whole scaling story).
    var cadj: DataFrame = null
    time("louvain_contraction") {
      cadj = adj.withColumn("w", lit(1L))
        .join(lab.select(col("node").as("u"), col("label").as("cu")), "u")
        .join(lab.select(col("node").as("v"), col("label").as("cv")), "v")
        .groupBy(col("cu").as("u"), col("cv").as("v"))
        .agg(sum("w").as("w"))
        .localCheckpoint(true)
      cadj.count()
    }
    time("louvain_level2_sweep") {
      val cdeg = cadj.groupBy(col("u").as("node")).agg(sum("w").as("deg"))
      val cl0 = cdeg.select(col("node"), col("node").as("label"))
      graft.queries.GraphQueries.louvainMovesWeightedOn(cadj, cl0, cdeg).count()
    }
    // ---- round-15 addition (graph_louvain_dendrogram): the LEVEL-3
    // rung — apply one weighted sweep on the level-2 graph, contract
    // AGAIN on the swept labels, and sweep the level-3 graph. Each
    // contraction must shrink the frame by the community count, so this
    // whole rung should cost a fraction of louvain_contraction; if it
    // doesn't, the dendrogram's "levels get cheaper" premise is broken
    // at scale.
    time("louvain_level3_contract_sweep") {
      val cdeg = cadj.groupBy(col("u").as("node")).agg(sum("w").as("deg"))
        .localCheckpoint(true)
      val cl0 = cdeg.select(col("node"), col("node").as("label"))
      val mv = graft.queries.GraphQueries.louvainMovesWeightedOn(cadj, cl0, cdeg)
        .select(col("node"), col("c").as("to_c"))
        .localCheckpoint(true)
      val l2 = cl0.join(mv, Seq("node"), "left")
        .select(col("node"), coalesce(col("to_c"), col("label")).as("label"))
        .localCheckpoint(true)
      val cadj3 = cadj
        .join(l2.select(col("node").as("u"), col("label").as("cu")), "u")
        .join(l2.select(col("node").as("v"), col("label").as("cv")), "v")
        .groupBy(col("cu").as("u"), col("cv").as("v"))
        .agg(sum("w").as("w"))
        .localCheckpoint(true)
      val c3deg = cadj3.groupBy(col("u").as("node")).agg(sum("w").as("deg"))
      val c30 = c3deg.select(col("node"), col("node").as("label"))
      graft.queries.GraphQueries.louvainMovesWeightedOn(cadj3, c30, c3deg).count()
    }
    // ---- round-13 addition: the WEDGE-quadratic family. Adamic–Adar's
    // candidate step is deg² per center — the one family whose cost is
    // degree-distribution-, not edge-count-, shaped. The probe times the
    // production capped form at cap 64 (probe graph degrees run to 4096,
    // so the cap is LOAD-BEARING here, unlike at graded SF): candidate
    // self-join, ln-floor scoring, anti-join, top-25.
    time("adamic_adar_cap64") {
      graft.queries.GraphQueries.adamicAdarOn(
        e, adj, degN.select(col("node").as("u"), col("deg")), 64).count()
    }
    out("hot_community_deg_mass") = hotMass.toDouble
    val json = out.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get("SCALE_GRAPH.json"),
      s"""{"metric":"graph_scale_probe","n_nodes":$nNodes,"n_edges":$nEdges,"n_directed":$nDirected,"max_doc":$maxDoc,"queries":$json,"sf":"$dir"}\n""")
    spark.stop()
  }
}
