package graft

import org.apache.spark.sql.functions._

/** Round-16 OPTIMIZATION internals — like Round15OptSpec, these pin the
  * internal equivalences the rewrites rest on (the oracle pins every
  * graded output; a future edit breaking one of these fails here before
  * it reaches parity). */
class Round16OptSpec extends GraftSpec {

  test("hIndexEstimates: convergence-halved chain ≡ straight chain, both exit paths") {
    import SparkSpecBase.spark.implicits._
    def est(adj: org.apache.spark.sql.DataFrame, halved: Boolean): (Seq[(Long, Long)], Seq[(Long, Long)]) = {
      val (prev, fin) = graft.queries.GraphQueries.hIndexEstimates(adj, 12, halved)
      val p = prev.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      val f = fin.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      prev.unpersist(blocking = false); fin.unpersist(blocking = false)
      (p, f)
    }
    // cycle: degree-regular ⇒ immediate fixpoint ⇒ the halved chain
    // takes the EARLY-EXIT path (round h−1 == round h) and must return
    // the same (round 11, round 12) frames the straight chain returns
    val cyc = (1 to 12).map(i => (i.toLong, (i % 12).toLong + 1))
    val cycAdj = (cyc ++ cyc.map(_.swap)).toDF("u", "v")
    assert(est(cycAdj, halved = true) == est(cycAdj, halved = false),
      "halved chain diverged on the early-exit path")
    // 30-node path: the coreness-1 front needs ~14 rounds from each
    // endpoint, so round 5 != round 6 ⇒ the halved chain takes the
    // EXTENSION path — outputs must still be the straight chain's
    val pe = (1 until 30).map(i => (i.toLong, i.toLong + 1))
    val pathAdj = (pe ++ pe.map(_.swap)).toDF("u", "v")
    assert(est(pathAdj, halved = true) == est(pathAdj, halved = false),
      "halved chain diverged on the extension path")
  }

  test("louvain dendrogram: cross-level Q invariant survives the fused level censuses") {
    // contraction preserves Q, so each level's sweep-0 q_num equals the
    // previous level's terminal q_num — the invariant that catches a
    // broken fused census (wrong adjacency, wrong sweep tag) even
    // before oracle parity runs
    val rows = graft.queries.GraphQueries.graphLouvainDendrogram(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSeq
    val levels = rows.map(_._1).distinct.sorted
    assert(levels.nonEmpty && levels.head == 1L)
    levels.sliding(2).foreach {
      case Seq(a, b) =>
        val termA = rows.filter(_._1 == a).maxBy(_._2)._3
        val zeroB = rows.filter(r => r._1 == b && r._2 == 0L).head._3
        assert(zeroB == termA,
          s"level $b sweep-0 q_num $zeroB != level $a terminal q_num $termA")
      case _ => ()
    }
  }
}
