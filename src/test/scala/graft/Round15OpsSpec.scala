package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
import org.apache.spark.sql.catalyst.expressions.{Alias, WindowExpression, RowNumber}

/** Round-15 additions and scale fixes. The headline: `ringPairs`' (the
  * HNSW-build candidate generator's) two-level banded rank — the
  * round-14 verdict's named scale flaw was the single
  * row_number-per-bucket window, a corpus-proportional one-reducer
  * sort once fixed bucket counts meet a growing corpus. The spec pins
  * BOTH halves of the fix: the pair set is bit-identical to the
  * single-window form (plain-Scala replay), and the plan's ranking
  * window partitions by (bucket, band), never the bucket alone. */
class Round15OpsSpec extends GraftSpec {

  /** Plain-Scala replay of the WRAPPING ring over a bucket: member i
    * (in vec_id order) pairs with members (i+d) mod sz for d in
    * 1..ringW, d < sz — the single-window semantics the banded rank
    * must reproduce bit-for-bit. */
  private def naiveRing(members: Map[Long, Seq[Long]], ringW: Int): Set[(Long, Long)] =
    members.values.flatMap { vs =>
      val sorted = vs.sorted.toIndexedSeq
      val sz = sorted.length
      for {
        i <- sorted.indices
        d <- 1 to ringW
        if d < sz
      } yield (sorted(i), sorted((i + d) % sz))
    }.toSet

  test("ringPairs: banded rank reproduces the single-window pair set exactly (multi-band, hot + tiny buckets)") {
    import SparkSpecBase.spark.implicits._
    // vec_ids span ~5 RankBandW=8192 bands so the band split is real;
    // 3 hot buckets of 300 members (≫ ring width) + 1 tiny bucket of 3
    // (< ring width — exercises the d < sz wrap guard)
    val hot = (0 until 900).map(i => (i * 41L, i % 3L))
    val tiny = Seq((40001L, 9L), (40003L, 9L), (40009L, 9L))
    val rows = hot ++ tiny
    val m = rows.toSeq.toDF("vec_id", "bkt")
    val ringW = 8
    val got = graft.queries.LlmExtra.ringPairs(m, "bkt", ringW)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = naiveRing(rows.groupBy(_._2).map { case (k, vs) => k -> vs.map(_._1).toSeq }, ringW)
    assert(got == want, s"pair sets diverge: got ${got.size}, want ${want.size}")
    // every hot-bucket member has exactly min(ringW, sz-1) outgoing pairs
    val outDeg = got.toSeq.groupBy(_._1).view.mapValues(_.size)
    hot.foreach { case (v, _) => assert(outDeg(v) == ringW) }
    tiny.foreach { case (v, _) => assert(outDeg(v) == 2) } // sz=3 → d∈{1,2}
  }

  test("graph_louvain_dendrogram: cross-level Q invariants, stopping rule and per-level converged flags") {
    val rows = graft.queries.GraphQueries.graphLouvainDendrogram(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    val byLevel = rows.groupBy(_._1).toSeq.sortBy(_._1)
    val levels = byLevel.map(_._1)
    // levels are contiguous from 1, capped at 4
    assert(levels == (1L to levels.max).toSeq && levels.max <= 4L)
    // one 2m for the whole dendrogram: contraction preserves total mass
    assert(rows.map(_._4).distinct.length == 1)
    byLevel.foreach { case (lvl, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.head._2 == 0L && sorted.head._3 == 0L, s"level $lvl must open with sweep 0")
      // converged flag = the level's trace ends with a zero-move sweep
      val conv = sorted.last._2 > 0 && sorted.last._3 == 0L
      assert(rs.forall(_._6 == conv), s"level $lvl converged flag mismatch")
      // each level's sweep-0 Q equals the previous level's terminal Q EXACTLY
      if (lvl > 1) {
        val prevTerminal = byLevel(lvl.toInt - 2)._2.maxBy(_._2)._5
        assert(sorted.head._5 == prevTerminal,
          s"level $lvl sweep-0 q ${sorted.head._5} != level ${lvl - 1} terminal $prevTerminal — contraction must preserve Q")
      }
    }
    // the stopping rule: a contracted level that moved nothing is terminal
    byLevel.filter(_._1 >= 2L).dropRight(1).foreach { case (lvl, rs) =>
      assert(rs.map(_._3).sum > 0L, s"level $lvl moved nothing but a deeper level ran")
    }
  }

  test("llm_sim_hnsw_tune: recall@10 non-decreasing in budget; default row consistent with llm_sim_hnsw_topk") {
    val rows = graft.queries.LlmExtra.llmSimHnswTune(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7)))
    assert(rows.length == 3 && rows.map(r => (r._1, r._2)).toSeq == Seq((2L, 1L), (4L, 2L), (8L, 3L)))
    // the property the curve exists to show: more budget, no less recall
    assert(rows.map(_._4).toSeq == rows.map(_._4).toSeq.sorted, "visited budget must grow with (B, R)")
    assert(rows.map(_._8).toSeq == rows.map(_._8).toSeq.sorted,
      s"recall@10 must be non-decreasing in budget: ${rows.map(_._8).mkString(", ")}")
    // the (4,2) sweep row must aggregate EXACTLY what the graded
    // default query reports per probe — same build, same search
    val perProbe = graft.queries.LlmExtra.llmSimHnswTopk(spark, sfDir).collect()
    val mid = rows(1)
    assert(mid._3 == perProbe.length)
    assert(mid._4 == perProbe.map(_.getLong(1)).sum, "visited sum mismatch vs topk")
    assert(mid._5 == perProbe.map(_.getLong(2)).sum, "hit@5 sum mismatch vs topk")
    assert(mid._6 == perProbe.map(_.getLong(3)).sum, "hit@10 sum mismatch vs topk")
  }

  test("ringPairs: the ranking window partitions by (bucket, band), never the bucket alone — the bounded-partition property") {
    import SparkSpecBase.spark.implicits._
    val m = (0 until 100).map(i => (i * 977L, i % 2L)).toSeq.toDF("vec_id", "bkt")
    val plan = graft.queries.LlmExtra.ringPairs(m, "bkt", 4)
      .queryExecution.analyzed
    val rankWindows = plan.collect {
      case w: LWindow if w.windowExpressions.exists {
        case Alias(WindowExpression(_: RowNumber, _), _) => true
        case _                                           => false
      } => w
    }
    assert(rankWindows.nonEmpty, "expected a row_number ranking window in the build")
    rankWindows.foreach { w =>
      assert(w.partitionSpec.size >= 2,
        s"ranking window partitioned by ${w.partitionSpec.mkString(",")} — " +
          "a single-column (bucket-only) partition is a corpus-proportional sort at scale")
    }
  }
}
