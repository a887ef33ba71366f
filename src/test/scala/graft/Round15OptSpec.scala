package graft

import org.apache.spark.sql.functions._

/** Round-15 OPTIMIZATION internals — the rewrites must be invisible in
  * results (the oracle pins every graded output at three SFs; these
  * specs pin the *internal* equivalences the rewrites rest on, so a
  * future edit that breaks one fails here before it reaches parity).
  */
class Round15OptSpec extends GraftSpec {

  test("config-tagged HNSW search ≡ per-config standalone searches") {
    // the tune sweep's interleaved hop loop must reproduce, per config,
    // exactly the rows the standalone single-config search produces —
    // including the frozen-visited-set state of a config whose hop
    // budget ends before the loop does
    val m = graft.llm.Hnsw.M
    def rows(b: Int, r: Int): Seq[String] =
      graft.queries.LlmExtra.simHnswTopkImpl(spark, sfDir, m, b, r)
        .collect().map(_.mkString("|")).toSeq
    val tune = graft.queries.LlmExtra.llmSimHnswTune(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // the sweep aggregates must be consistent with the standalone
    // searches: probe counts equal, and the graded (4,2) config's
    // per-probe rows equal the standalone (4,2) search's rows
    assert(tune.map(_._1) == Seq(2L, 4L, 8L), "sweep rows out of order")
    val topk = graft.queries.LlmExtra.llmSimHnswTopk(spark, sfDir)
      .collect().map(_.mkString("|")).toSeq
    assert(topk == rows(4, 2),
      "shared-readout (4,2) slice diverged from the standalone search")
  }

  test("llm_sim_ivf_topk is the rnk<=5 prefix of the shared top-10") {
    val top5 = graft.queries.LlmExtra.llmSimIvfTopk(spark, sfDir)
      .collect().map(_.mkString("|")).toSeq
    val direct = graft.queries.LlmExtra.simIvfTopkK(spark, sfDir, 5)
      .collect().map(_.mkString("|")).toSeq
    assert(top5 == direct,
      "prefix of the shared IVF top-10 diverged from the direct k=5 search")
  }

  test("SessionMemo entries rebuild transparently after releaseCaches") {
    val before = graft.queries.LlmExtra.llmSimHnswTopk(spark, sfDir)
      .collect().map(_.mkString("|")).toSeq
    SparkEntry.releaseCaches()
    val after = graft.queries.LlmExtra.llmSimHnswTopk(spark, sfDir)
      .collect().map(_.mkString("|")).toSeq
    assert(after == before, "memo rebuild diverged after release")
  }

  test("louvain trace prefix/slice readouts stay mutually consistent") {
    // two_level = level<=2 prefix of the dendrogram; converged = the
    // level-1 rows; apply = level-1 sweeps 0/1 — all from one trace
    val dendro = graft.queries.GraphQueries.graphLouvainDendrogram(spark, sfDir)
      .collect().map(_.mkString("|")).toSeq
    val two = graft.queries.GraphQueries.graphLouvainTwoLevel(spark, sfDir)
      .collect().map(_.mkString("|")).toSeq
    assert(two == dendro.filter(r => r.split("\\|")(0).toLong <= 2L),
      "two_level is not the level<=2 prefix of the dendrogram")
    val conv = graft.queries.GraphQueries.graphLouvainConverged(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val level1 = graft.queries.GraphQueries.graphLouvainDendrogram(spark, sfDir)
      .filter(col("level") === 1)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(conv == level1, "converged rows diverged from the trace's level-1 rows")
    val app = graft.queries.GraphQueries.graphLouvainApply(spark, sfDir).collect().head
    val s0 = level1.find(_._1 == 0L).get
    val s1 = level1.find(_._1 == 1L).get
    assert(app.getLong(0) == s1._2, "apply n_moved != sweep-1 move count")
    assert(app.getLong(2) == s0._4 && app.getLong(3) == s1._4,
      "apply q_before/q_after != sweep-0/1 q_num")
  }
}
