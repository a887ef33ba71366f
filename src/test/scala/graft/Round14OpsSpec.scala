package graft

import org.apache.spark.sql.functions._

/** Round-14 additions: two-level Louvain (community contraction +
  * weighted sweep). */
class Round14OpsSpec extends GraftSpec {

  test("graph_louvain_two_level: contraction preserves Q exactly; trace is well-formed") {
    val rows = graft.queries.GraphQueries.graphLouvainTwoLevel(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    val l1 = rows.filter(_._1 == 1L).sortBy(_._2)
    val l2 = rows.filter(_._1 == 2L).sortBy(_._2)
    assert(l1.nonEmpty && l2.nonEmpty, "both levels must emit trace rows")
    assert(l1.head._2 == 0L && l2.head._2 == 0L, "each level starts at sweep 0")
    assert(rows.map(_._4).distinct.length == 1,
      "2m is invariant under contraction — every row must carry the same twom")
    // THE cross-level invariant: the contracted graph's singleton
    // partition scores exactly the original graph's terminal level-1
    // partition (contraction preserves the modularity numerator)
    assert(l2.head._5 == l1.last._5,
      s"contraction must preserve Q: level-1 terminal ${l1.last._5} vs level-2 sweep-0 ${l2.head._5}")
    // sweep numbering is dense from 0 and the trace stops after a
    // zero-move sweep (nothing after the first n_moved == 0)
    Seq(l1, l2).foreach { (lvl: Array[(Long, Long, Long, Long, Long, Boolean)]) =>
      assert(lvl.map(_._2).toSeq == lvl.indices.map(_.toLong))
      val zero = lvl.indexWhere(t => t._2 > 0 && t._3 == 0L)
      if (zero >= 0) assert(zero == lvl.length - 1, "no sweeps after the zero-move terminal")
      val converged = zero >= 0
      assert(lvl.forall(_._6 == converged), "per-level converged flag must match the trace")
    }
  }

  test("llm_sim_hnsw_topk: recall@10 >= IVF's at equal-or-lower candidate budget") {
    import graft.llm.Ivf
    val hnsw = graft.queries.LlmExtra.llmSimHnswTopk(spark, sfDir).collect()
    val hRecall = hnsw.map(r => r.getAs[Double]("recall_at_10")).sum / hnsw.length
    val hBudget = hnsw.map(r => r.getAs[Long]("n_visited")).sum.toDouble / hnsw.length
    val ivf = graft.queries.LlmExtra.llmSimRecallAtK(spark, sfDir).collect()
    val iRecall = ivf.map(r => r.getAs[Double]("recall_at_10")).sum / ivf.length
    // IVF's candidate budget: corpus vectors assigned to the probe's
    // NProbe nearest cells (replicated from simIvfTopkK's candIds)
    val emb = graft.tables.Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").as("v"))
    val cents = emb.filter(col("vec_id") < Ivf.NCells)
      .select(col("vec_id").cast("long").as("cell"), col("v").as("cv"))
    val scored = emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cell"), graft.llm.Vectors.fdot(col("v"), col("cv")).as("d"))
    val assigned = scored.groupBy("vec_id")
      .agg(graft.udx.TopKAggregator.topk(1)(col("d"), col("cell")).as("tk"))
      .select(col("vec_id"), col("tk.items")(0).getField("_2").as("cell"))
    val probeCells = scored.filter(col("vec_id") < 10).groupBy("vec_id")
      .agg(graft.udx.TopKAggregator.topk(Ivf.NProbe)(col("d"), col("cell")).as("tk"))
      .select(col("vec_id").as("pid"), explode(col("tk.items")).as("it"))
      .select(col("pid"), col("it._2").as("cell"))
    val iBudget = assigned.join(probeCells, "cell")
      .filter(col("vec_id") =!= col("pid"))
      .groupBy("pid").agg(countDistinct("vec_id").as("n"))
      .agg(avg("n")).collect()(0).getDouble(0)
    assert(hBudget <= iBudget,
      f"beam budget $hBudget%.1f exceeds IVF's $iBudget%.1f — not an equal-budget win")
    assert(hRecall >= iRecall,
      f"beam recall@10 $hRecall%.3f below IVF's $iRecall%.3f at budget $hBudget%.1f vs $iBudget%.1f")
  }

  test("louvainMovesWeightedOn: hand-computed gains on a self-loop weighted graph") {
    import SparkSpecBase.spark.implicits._
    // three super-nodes: X heavy into Y, Z lightly into Y; no self-loop
    // mass. deg(X)=10, deg(Y)=12, deg(Z)=2, 2m=24.
    //   gain(X→Y) = 24·(10−0) − 10·(12−10+10) = 120 > 0  → X moves
    //   gain(Z→Y) = 24·(2−0)  −  2·(12−2+2)   =  24 > 0  → Z moves
    //   gain(Y→X) = 24·10 − 12·(10−12+12) = 120 > 0; gain(Y→Z) =
    //   24·2 − 12·(2−12+12) = 24 — argmax picks X (gain DESC, c ASC)
    val cadj = Seq(
      (1L, 2L, 10L), (2L, 1L, 10L), // X=1, Y=2
      (2L, 3L, 2L), (3L, 2L, 2L)    // Z=3
    ).toDF("u", "v", "w")
    val cdeg = cadj.groupBy(col("u").as("node")).agg(sum("w").as("deg"))
    val cl0 = cdeg.select(col("node"), col("node").as("label"))
    val moves = graft.queries.GraphQueries.louvainMovesWeightedOn(cadj, cl0, cdeg)
      .select("node", "c", "gain_scaled").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(moves.toSeq == Seq((1L, 2L, 120L), (2L, 1L, 120L), (3L, 2L, 24L)),
      s"weighted gains diverge from hand computation: ${moves.toSeq}")
    // two communities tied by ONE edge must NOT merge: triangle pair,
    // contracted — gain(A→B) = 14·(1−0) − 7·(7−7+7) = −35 < 0. The
    // self-loops (w=6) must stay OUT of k_ic or the gain flips sign.
    val tri = Seq((10L, 10L, 6L), (20L, 20L, 6L), (10L, 20L, 1L), (20L, 10L, 1L))
      .toDF("u", "v", "w")
    val tdeg = tri.groupBy(col("u").as("node")).agg(sum("w").as("deg"))
    val tl0 = tdeg.select(col("node"), col("node").as("label"))
    val tmoves = graft.queries.GraphQueries.louvainMovesWeightedOn(tri, tl0, tdeg).count()
    assert(tmoves == 0L, "one bridging edge must not merge two dense super-nodes")
  }
}
