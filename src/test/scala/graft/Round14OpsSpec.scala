package graft

import org.apache.spark.sql.functions._

/** Round-14 additions: two-level Louvain (community contraction +
  * weighted sweep), navigable-graph ANN, census analytics
  * (dissimilarity/Gini/LQ), seasonal Holt–Winters, landmark
  * betweenness. Each non-trivial algorithm is replayed in plain Scala
  * from collected state — independent of both the Spark plan and the
  * DuckDB oracle. */
class Round14OpsSpec extends GraftSpec {

  test("census_dissimilarity: replays from the collected census; indices inside [0, 1]") {
    val row = graft.queries.CensusQueries.censusDissimilarity(spark, sfDir).collect()(0)
    val (nU, ta, tb, dNum, d, iso) = (row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3), row.getDouble(4), row.getLong(5))
    assert(d >= 0.0 && d <= 1.0 && iso >= 0L && iso <= 1000000L)
    // independent census replay
    val cens = graft.tables.Tables.t(spark, sfDir, "customer")
      .join(graft.tables.Tables.t(spark, sfDir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count_if(col("c_mktsegment") === "BUILDING").as("a"),
        count_if(col("c_mktsegment") =!= "BUILDING").as("b"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val (sa, sb) = (cens.map(_._1).sum, cens.map(_._2).sum)
    assert((nU, ta, tb) == ((cens.length.toLong, sa, sb)))
    assert(dNum == cens.map { case (a, b) => math.abs(a * sb - b * sa) }.sum)
    assert(iso == cens.map { case (a, b) => a * a * 1000000L / (sa * (a + b)) }.sum)
  }

  test("census_gini: replays from a sorted in-memory fold; 0 <= G < 1") {
    val got = graft.queries.CensusQueries.censusGini(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.nonEmpty)
    got.foreach { case (n, _, _, gNum, g) =>
      assert(gNum >= 0L && g >= 0.0 && g < 1.0, s"$n gini out of range: $g")
    }
    val rows = graft.tables.Tables.t(spark, sfDir, "customer")
      .join(graft.tables.Tables.t(spark, sfDir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .filter(col("c_acctbal") > 0)
      .select(col("n_name"), col("c_custkey"),
        round(col("c_acctbal") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = rows.groupBy(_._1).map { case (nat, xs) =>
      val sorted = xs.sortBy(t => (t._3, t._2)).map(_._3)
      val n = sorted.length.toLong
      val sum = sorted.sum
      val rw = sorted.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      nat -> (n, sum, 2 * rw - (n + 1) * sum)
    }
    got.foreach { case (nat, n, sum, gNum, _) =>
      assert(expect(nat) == ((n, sum, gNum)), s"$nat diverges from replay")
    }
  }

  test("census_location_quotient: cells replay exactly; concentration exists in both directions") {
    val got = graft.queries.CensusQueries.censusLocationQuotient(spark, sfDir).collect()
      .map(r => ((r.getString(1), r.getString(0)), (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap // key: (segment via col order: n_name first, segment second) — see below
    assert(got.nonEmpty)
    val cens = graft.tables.Tables.t(spark, sfDir, "customer")
      .join(graft.tables.Tables.t(spark, sfDir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name", "c_mktsegment").agg(count(lit(1)).as("e"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val eI = cens.groupBy(_._1._1).map { case (k, m) => k -> m.values.sum }
    val eJ = cens.groupBy(_._1._2).map { case (k, m) => k -> m.values.sum }
    val eT = cens.values.sum
    got.foreach { case ((seg, nat), (eij, ei, ej, lq)) =>
      assert(cens((nat, seg)) == eij && eI(nat) == ei && eJ(seg) == ej)
      val exact = (2L * eij * eT * 1000000L + ei * ej) / (2L * ei * ej)
      assert(math.abs(lq - exact.toDouble / 1000000.0) < 1e-12, s"($nat,$seg) lq")
    }
    assert(got.values.exists(_._4 > 1.0) && got.values.exists(_._4 < 1.0),
      "LQ must spread around 1 on real data")
  }

  test("ts_holt_winters: trajectory replays from an in-memory integer fold") {
    val got = graft.queries.TimeSeries.tsHoltWinters(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(got.nonEmpty)
    val daily = graft.tables.Tables.t(spark, sfDir, "events")
      .filter(col("user_id") < 12 && col("event_type") === "purchase")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum((graft.queries.Num.money(col("value")) * 100).cast("long")).as("cents"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2)))
    val expect = daily.groupBy(_._1).toSeq.flatMap { case (uid, xs) =>
      val days = xs.sortBy(_._2)
      var l = 0L; var b = 0L; val sea = Array.fill(7)(0L)
      days.zipWithIndex.map { case ((_, d, c), i) =>
        val w = i % 7
        if (i == 0) { l = c; b = 0L; (uid, d, c, 0L, l, b, sea(w)) }
        else {
          val innov = c - (l + b + sea(w)); val lp = l
          l = ((c - sea(w)) + l + b) / 2
          b = (b + (l - lp)) / 2
          sea(w) = (sea(w) + (c - l)) / 2
          (uid, d, c, innov, l, b, sea(w))
        }
      }
    }.map(t => (t._1, t._2, t._3, t._4 / 100.0, t._5 / 100.0, t._6 / 100.0, t._7 / 100.0))
      .toSeq.sortBy(t => (t._1, t._2))
    assert(got.toSeq == expect, "Holt-Winters trajectory diverges from the replay fold")
  }

  test("graph_betweenness_landmark: replays from an in-memory bounded Brandes") {
    val got = graft.queries.GraphQueries.graphBetweennessLandmark(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    val docs = graft.tables.Tables.t(spark, sfDir, "documents").filter(col("doc_id") < 1200)
    val e0 = graft.queries.GraphQueries
      .simEdgesCapped(docs, graft.operators.HotKeys.DefaultCap)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (e0 ++ e0.map(_.swap)).groupBy(_._1).map { case (u, es) => u -> es.map(_._2).toSet }
    val nodes = adj.keySet
    val lms = nodes.filter(_ % 151 == 0)
    val acc = scala.collection.mutable.Map.empty[Long, (Long, Long)].withDefaultValue((0L, 0L))
    for (lm <- lms) {
      // forward: layers with sigma, 4 hops
      val dist = scala.collection.mutable.Map(lm -> 0)
      val sigma = scala.collection.mutable.Map(lm -> 1L)
      var frontier = Set(lm)
      for (d <- 1 to 4) {
        val nxt = scala.collection.mutable.Map.empty[Long, Long]
        for (u <- frontier; v <- adj(u) if !dist.contains(v))
          nxt(v) = nxt.getOrElse(v, 0L) + sigma(u)
        // two-phase: only nodes NOT reached in earlier layers
        val fresh = nxt.keySet.filterNot(dist.contains)
        fresh.foreach { v => dist(v) = d; sigma(v) = nxt(v) }
        frontier = fresh.toSet
      }
      val delta = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for (d <- 3 to 1 by -1; v <- dist.collect { case (n, dd) if dd == d => n }) {
        var t = 0L
        for (w <- adj(v) if dist.get(w).contains(d + 1))
          t += sigma(v) * (1000000L + delta(w)) / sigma(w)
        delta(v) = t
      }
      for ((v, dd) <- dist if dd >= 1) {
        val (c, s) = acc(v); acc(v) = (c + 1, s + delta(v))
      }
    }
    val expect = acc.toSeq.map { case (n, (c, s)) => (n, c, s) }
      .sortBy(t => (-t._3, t._1)).take(25)
    assert(got.toSeq == expect, s"betweenness diverges:\ngot    ${got.take(5).toSeq}\nexpect ${expect.take(5)}")
  }

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

  test("event_attribution_ushape: every conversion's credits sum to exactly 10000 bp") {
    val byChannel = graft.queries.Quality.eventAttributionUshape(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(byChannel.nonEmpty)
    // conservation: total credited bp = 10000 x number of attributed
    // conversions (recount conversions independently)
    val ev = graft.tables.Tables.t(spark, sfDir, "events").filter(col("user_id") < 100)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_id"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("c_ts"))
    val nConv = p.join(c, p("user_id") === col("cu") &&
        col("c_ts") <= col("p_ts") && col("c_ts") > col("p_ts") - expr("INTERVAL 7 DAYS"))
      .select("p_id").distinct().count()
    assert(byChannel.map(_._4).sum == 10000L * nConv,
      s"credit not conserved: ${byChannel.map(_._4).sum} vs ${10000L * nConv}")
  }

  test("census_suppression: the one-round guarantee — no margin can recover a lone PRIMARY by subtraction") {
    val rows = graft.queries.CensusQueries.censusSuppression(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getString(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, n, flag) =>
      assert((flag == "OK") == n.isDefined, "published_n must be NULL iff flagged")
    }
    // the ONE-ROUND policy's data-independent guarantee (see the
    // engine docstring): every margin with >= 2 cells and exactly one
    // PRIMARY ends the round with >= 2 suppressions. Full closed-loop
    // margin safety (a complementary never standing alone either) is
    // the fixpoint iterate, deliberately outside the one-round
    // contract — asserting it here would couple the spec to whether
    // THIS corpus happens to trigger the chase (round-15 ADVICE find).
    Seq(rows.groupBy(_._1), rows.groupBy(_._2)).foreach { grouped =>
      grouped.foreach { case (key, cells) =>
        val nPrim = cells.count(_._4 == "P")
        val nSupp = cells.count(_._4 != "OK")
        if (cells.length >= 2 && nPrim == 1)
          assert(nSupp >= 2, s"margin $key leaves its lone primary recoverable")
      }
    }
  }

  test("agg_hll_intersect: sketch estimates genuinely inside the stated tolerances") {
    val r = graft.queries.Relational.aggHllIntersect(spark, sfDir).collect()(0)
    assert(r.getBoolean(4) && r.getBoolean(5) && r.getBoolean(6) && r.getBoolean(7),
      s"verdicts: $r")
    // and the exact algebra holds: |A| + |B| - |A∪B| = |A∩B|
    assert(r.getLong(0) + r.getLong(1) - r.getLong(2) == r.getLong(3))
  }

  test("mm_audio_vad_plan: segments partition the speech frames; longest bounded") {
    val rows = graft.queries.MultimodalQueries.mmAudioVadPlan(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (doc, nf, nSpeech, nSeg, longest) =>
      assert(nSpeech <= nf && longest <= nSpeech, s"doc $doc bounds")
      assert((nSeg == 0) == (nSpeech == 0), s"doc $doc segment/speech consistency")
      if (nSeg > 0) {
        assert(longest >= (nSpeech + nSeg - 1) / nSeg,
          s"doc $doc longest segment below the pigeonhole floor")
        assert(nSeg <= nSpeech, s"doc $doc more segments than speech frames")
      }
    }
    assert(rows.exists(_._3 > 0) && rows.exists(t => t._3 < t._2),
      "threshold must split frames both ways on real text")
  }

  test("event_cohort_ltv: cumulative sums conserve the stream; denominator frozen at week 0") {
    val rows = graft.queries.Quality.eventCohortLtv(spark, sfDir).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (ck, curve) =>
      val sorted = curve.sortBy(_._2)
      assert(sorted.map(_._3).sum == sorted.last._4,
        s"$ck cumulative must equal the sum of week cents")
      assert(sorted.map(_._5).distinct.length == 1,
        s"$ck cohort size must be FROZEN across ages")
      sorted.toSeq.sliding(2).foreach { pair =>
        if (pair.length == 2)
          assert(pair(1)._4 == pair(0)._4 + pair(1)._3, s"$ck running sum broken")
      }
    }
    // total conservation against the raw stream
    val total = graft.tables.Tables.t(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .agg(sum((graft.queries.Num.money(col("value")) * 100).cast("long")))
      .collect()(0).getLong(0)
    assert(rows.map(_._3).sum == total, "curve must conserve the purchase stream")
  }

  test("agg_sample_bottomk: the sample is exactly the k smallest hashes") {
    val r = graft.queries.Relational.aggSampleBottomk(spark, sfDir).collect()(0)
    assert(r.getLong(0) == 100L)
    val expected = graft.tables.Tables.t(spark, sfDir, "orders")
      .select(col("o_orderkey"), md5(col("o_orderkey").cast("string")).as("hk"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .collect().map(x => (x.getString(1), x.getLong(0), x.getLong(2)))
      .sortBy(t => (t._1, t._2)).take(100)
    assert(r.getLong(1) == expected.map(_._2).sum, "sampled key set diverges")
    assert(r.getLong(2) == expected.map(_._3).sum, "sampled cents diverge")
  }

  test("llm_dup_graph_degree: degree mass equals 2x the pair count") {
    val rows = graft.queries.LlmExtra.llmDupGraphDegree(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val nPairs = rows.head._3
    assert(rows.forall(_._3 == nPairs))
    // buckets < 20 carry exact degrees: their mass plus the clamped
    // bucket's (unknown exact) mass must bound 2*pairs correctly
    val exactMass = rows.filter(_._1 < 20).map(t => t._1 * t._2).sum
    val clampedNodes = rows.filter(_._1 == 20).map(_._2).sum
    assert(exactMass + 20 * clampedNodes <= 2 * nPairs)
    assert(rows.map(_._2).sum >= 1 && exactMass <= 2 * nPairs)
  }

  test("llm_dataset_card: card fields replay from independent aggregates") {
    val cards = graft.queries.LlmExtra.llmDatasetCard(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6), r.getDouble(7), r.getDouble(8)))
    assert(cards.nonEmpty)
    val docs = graft.tables.Tables.t(spark, sfDir, "documents")
      .select(col("source"), col("lang"), col("n_chars"), md5(col("text")).as("h"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
    cards.foreach { case (src, n, tot, mean, med, nLangs, topLang, dup, short) =>
      val ds = docs.filter(_._1 == src)
      assert(n == ds.length && tot == ds.map(_._3).sum)
      assert(mean == tot / n)
      assert(nLangs == ds.map(_._2).distinct.length)
      assert(topLang == ds.groupBy(_._2).toSeq
        .map { case (l, xs) => (l, xs.length) }.minBy(t => (-t._2, t._1))._1)
      val lens = ds.map(_._3).sorted
      assert(med == lens((lens.length - 1) / 2), s"$src median")
      val nUniq = ds.map(_._4).distinct.length
      assert(math.abs(dup - (n - nUniq).toDouble / n) < 1e-3, s"$src dup rate")
      assert(short >= 0.0 && short <= 1.0)
    }
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
