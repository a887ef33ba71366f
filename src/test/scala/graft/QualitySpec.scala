package graft

import org.apache.spark.sql.functions._
import graft.queries.{GraphQueries, LlmExtra, Quality, Relational}

/** Invariant coverage for the round-4 data-quality / analytics / graph
  * operators (each is also fully DuckDB-oracle-checked; these assert
  * the semantic properties the hash compare can't express). */
class QualitySpec extends GraftSpec {

  test("dq_schema_profile: one row per profiled column, stats bounded by row count") {
    val rows = Quality.dqSchemaProfile(spark, sfDir).collect()
    assert(rows.length == 6)
    val nRows = graft.tables.Tables.t(spark, sfDir, "orders").count()
    rows.foreach { r =>
      val (nulls, distinct) = (r.getLong(1), r.getLong(2))
      assert(nulls >= 0 && nulls <= nRows)
      assert(distinct >= 1 && distinct + nulls <= nRows + 1)
      assert(r.getString(3) <= r.getString(4) || r.getString(0) == "o_totalprice" ||
        r.getString(0) == "o_orderkey" || r.getString(0) == "o_custkey",
        s"${r.getString(0)}: min/max string order")
    }
    // orderstatus is a tiny enum; orderkey is unique
    val byName = rows.map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(byName("o_orderstatus") <= 3)
    assert(byName("o_orderkey") == nRows)
  }

  test("dq_anomaly_zscore: flags agree with z, z-scores centre on zero") {
    val rows = Quality.dqAnomalyZscore(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3) == (math.abs(r.getDouble(2)) >= 1.5))
    }
    val meanZ = rows.map(_.getDouble(2)).sum / rows.length
    assert(math.abs(meanZ) < 0.1, s"z mean $meanZ should be ~0")
  }

  test("event_cohort_retention: week-0 cell is the cohort maximum (triangular decay bound)") {
    val rows = Quality.eventCohortRetention(spark, sfDir).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (wk, cells) =>
      val byAge = cells.map(c => c._2 -> c._3).toMap
      assert(byAge.contains(0L), s"cohort $wk missing week-0 cell")
      assert(cells.forall(_._3 <= byAge(0L)),
        s"cohort $wk: a later week exceeds the week-0 user count")
    }
  }

  test("graph_pagerank: ranks bounded, isolated nodes at the 0.15 floor, mass conserved-ish") {
    val rows = GraphQueries.graphPagerank(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 25)
    rows.foreach { case (_, deg, rank) =>
      assert(rank >= 150000L, s"rank below damping floor")
      if (deg == 0) assert(rank == 150000L, "isolated node must sit exactly at the floor")
    }
    // sorted output contract
    assert(rows.map(_._3).toSeq == rows.map(_._3).sortBy(-_).toSeq)
  }

  test("llm_dup_ngram_coverage: shared never exceeds total, fraction in [0,1]") {
    val rows = LlmExtra.llmDupNgramCoverage(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (total, shared, frac) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(shared <= total)
      assert(frac >= 0.0 && frac <= 1.0)
    }
  }

  test("sql_create_function: SQL UDF result matches the DataFrame-side exact-decimal net") {
    import graft.tables.Tables.t
    val got = Relational.sqlCreateFunction(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exp = t(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum(
        (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long")
          - round(col("l_extendedprice").cast("decimal(12,2)") * col("l_discount").cast("decimal(3,2)") * 100, 0).cast("long")
          + round(col("l_extendedprice").cast("decimal(12,2)") * col("l_tax").cast("decimal(3,2)") * 100, 0).cast("long")
      ).as("net_cents"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == exp)
  }

  test("event_sessionize: equals a naive per-user fold under the same 8h gap rule") {
    val got = Quality.eventSessionize(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    val gapUs = 8L * 3600L * 1000000L
    val raw = graft.tables.Tables.t(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val exp = raw.groupBy(_._1).map { case (uid, evs) =>
      val ts = evs.sortBy(e => (e._3, e._2)).map(_._3)
      // fold into session (count, start, end) triples
      val sessions = ts.foldLeft(List.empty[(Long, Long, Long)]) {
        case (Nil, t0) => List((1L, t0, t0))
        case ((n, s0, e0) :: rest, t0) =>
          if (t0 - e0 > gapUs) (1L, t0, t0) :: (n, s0, e0) :: rest
          else (n + 1, s0, t0) :: rest
      }
      val nS = sessions.size.toLong
      val nE = sessions.map(_._1).sum
      val avg = ((nE * 100 * 2 + nS) / (nS * 2)).toDouble / 100 // half-up, matches Num.ratio
      val maxSpan = sessions.map(s => (s._3 - s._2) / 60000000L).max
      uid -> ((nS, nE, avg, maxSpan))
    }
    assert(got.keySet == exp.keySet)
    exp.foreach { case (uid, e) => assert(got(uid) == e, s"user $uid: got ${got(uid)}, expected $e") }
    assert(got.values.map(_._2).sum == raw.length, "session events must cover every event")
  }

  test("event_rfm: balanced quintiles, monotone bucket boundaries, rule-consistent segments") {
    val rows = Quality.eventRfm(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getInt(4), r.getInt(5), r.getInt(6), r.getString(7)))
    assert(rows.nonEmpty)
    // quintile sizes differ by at most one in every dimension
    Seq[((Long, Long, Long, Double, Int, Int, Int, String)) => Int](_._5, _._6, _._7).foreach { qOf =>
      val sizes = rows.groupBy(qOf).view.mapValues(_.length).values.toSeq
      assert(sizes.max - sizes.min <= 1, s"unbalanced quintiles: $sizes")
    }
    // bucket value ranges are monotone: higher f_q never holds a smaller
    // frequency than a lower bucket's maximum (ties may straddle)
    val byFq = rows.groupBy(_._6).view.mapValues(g => (g.map(_._3).min, g.map(_._3).max)).toMap
    byFq.keys.toSeq.sorted.sliding(2).foreach {
      case Seq(lo, hi) => assert(byFq(lo)._2 <= byFq(hi)._1 ||
        byFq(lo)._2 == byFq(hi)._1, s"f quintile order $lo->$hi")
      case _ =>
    }
    // recency quintile 5 is the most recent cohort
    val byRq = rows.groupBy(_._5).view.mapValues(g => g.map(_._2).max).toMap
    assert(byRq(5) <= byRq(1), "r_q=5 must hold the most recent users")
    // segment rules replay exactly
    rows.foreach { case (uid, _, _, _, rq, fq, mq, seg) =>
      val expect =
        if (rq >= 4 && fq >= 4 && mq >= 4) "champion"
        else if (fq >= 4 && mq >= 3) "loyal"
        else if (rq <= 2 && fq >= 4) "at_risk"
        else if (rq >= 4 && fq <= 2) "new"
        else "regular"
      assert(seg == expect, s"user $uid segment")
    }
  }

  test("event_markov_chain: row-stochastic matrix, transition total = events minus users") {
    val rows = Quality.eventMarkovChain(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val ev = graft.tables.Tables.t(spark, sfDir, "events")
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    assert(rows.map(_._3).sum == nEvents - nUsers,
      "every user contributes (events - 1) transitions")
    rows.groupBy(_._1).foreach { case (from, grp) =>
      assert(grp.map(_._3).sum == grp.head._4, s"$from: counts must sum to n_from")
      val pSum = grp.map(_._5).sum
      // half-up per-cell rounding drifts the row sum by < 1e-4 per cell
      assert(math.abs(pSum - 1.0) <= 1e-4 * grp.length, s"$from: row sum $pSum")
    }
  }

  test("dq_distribution_drift: cohorts partition the stream, shares sum to ~1, gap is |a-b|") {
    val rows = Quality.dqDistributionDrift(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val nEvents = graft.tables.Tables.t(spark, sfDir, "events").count()
    assert(rows.map(r => r._2 + r._3).sum == nEvents, "cohort cells must partition the stream")
    // half-up per-cell rounding drifts each share column's sum by < 1e-6/cell
    assert(math.abs(rows.map(_._4).sum - 1.0) <= 1e-6 * rows.length, "share_a sums to 1")
    assert(math.abs(rows.map(_._5).sum - 1.0) <= 1e-6 * rows.length, "share_b sums to 1")
    rows.foreach { case (t, _, _, a, b, gap) =>
      assert(math.abs(gap - math.abs(a - b)) < 1e-12, s"$t gap replay")
    }
  }

  test("event_active_users: wau >= dau, wau bounded by trailing-7-day replay") {
    val rows = Quality.eventActiveUsers(spark, sfDir).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val dauByDay = rows.map(r => r._1 -> r._2).toMap
    rows.foreach { case (day, dau, wau, stick) =>
      assert(wau >= dau, s"$day: wau < dau")
      assert(stick <= 1.0 + 1e-9 && stick >= 0, s"$day stickiness range")
      // wau can't exceed the sum of the 7 contributing DAUs
      val bound = (0L to 6L).map(i => dauByDay.getOrElse(day.minusDays(i), 0L)).sum
      assert(wau <= bound, s"$day: wau $wau over union bound $bound")
    }
    // replay one mid-stream day exactly
    val ud = graft.tables.Tables.t(spark, sfDir, "events")
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val mid = rows(rows.length / 2)._1
    val exact = ud.filter(col("day").between(
        java.sql.Date.valueOf(mid.minusDays(6)), java.sql.Date.valueOf(mid)))
      .select("user_id").distinct().count()
    assert(rows(rows.length / 2)._3 == exact, s"$mid wau replay")
  }

  test("event_interarrival: percentile ordering, gap conservation vs markov transitions") {
    val rows = Quality.eventInterarrival(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (t, n, mn, p50, p90, mx, mean) =>
      assert(n > 0, s"$t empty")
      assert(mn <= p50 && p50 <= p90 && p90 <= mx, s"$t percentile ordering")
      assert(mean >= mn && mean <= mx, s"$t mean outside range")
    }
    // one gap per consecutive pair = events - users, same conservation
    // law the markov transition matrix obeys
    val ev = graft.tables.Tables.t(spark, sfDir, "events")
    assert(rows.map(_._2).sum == ev.count() - ev.select("user_id").distinct().count())
  }

  test("join_scd2_asof: every fact resolves EXACTLY one dimension version") {
    val rows = Quality.joinScd2Asof(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val facts = graft.tables.Tables.t(spark, sfDir, "orders")
      .filter(col("o_custkey") < 300)
    // exactly-one coverage: matched fact count equals the fact count —
    // a gap (zero matches) or an overlap (double match) both break it
    assert(rows.map(_._2).sum == facts.count(),
      "half-open version chain must cover each fact exactly once")
    val cents = facts
      .agg(sum((col("o_totalprice").cast("decimal(12,2)") * 100).cast("long"))).head.getLong(0)
    assert(rows.map(_._4).sum == cents, "resolved cents must conserve the fact mass")
  }

  test("event_concentration: deciles partition users, shares sum to 1, Lorenz monotone") {
    val rows = Quality.eventConcentration(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val ev = graft.tables.Tables.t(spark, sfDir, "events")
    assert(rows.map(_._2).sum == ev.select("user_id").distinct().count())
    assert(rows.map(_._3).sum == ev.count())
    assert(math.abs(rows.map(_._4).sum - 1.0) <= 1e-4 * rows.length, "shares sum to 1")
    // deciles ranked by activity: per-user average mass never increases
    val perUser = rows.map(r => (r._1, r._3.toDouble / r._2)).sortBy(_._1)
    assert(perUser.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1) + -1e-9),
      "later deciles must not out-average earlier ones")
  }

  test("event_lifecycle: states partition the users, events conserve") {
    val rows = Quality.eventLifecycle(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val ev = graft.tables.Tables.t(spark, sfDir, "events")
    assert(rows.map(_._2).sum == ev.select("user_id").distinct().count(),
      "states must partition the user base")
    assert(rows.map(_._3).sum == ev.count(), "event totals must conserve")
    assert(rows.map(_._1).toSet.subsetOf(Set("active", "lapsing", "churned")))
    rows.foreach { case (st, nu, nev, span) =>
      assert(nev >= nu, s"$st fewer events than users")
      assert(span >= 0, s"$st negative span")
    }
  }

  test("dq_sequence_gaps: gap algebra conserves (missing = range - keys)") {
    val r = Quality.dqSequenceGaps(spark, sfDir).collect()
    assert(r.length == 1)
    val (nKeys, kMin, kMax, nGaps, missing, maxGap) =
      (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2),
        r(0).getLong(3), r(0).getLong(4), r(0).getLong(5))
    // the two-level decomposition must reproduce the closed-form total
    assert(missing == (kMax - kMin + 1) - nKeys, "missing != range - keys")
    assert(maxGap <= missing, "max gap exceeds missing total")
    assert((nGaps == 0) == (missing == 0), "gap count and missing total disagree on zero")
    if (nGaps > 0) assert(maxGap >= 1 && missing >= nGaps, "gap bounds")
  }

  test("dq_outlier_iqr: fences ordered, outliers bounded, totals conserve") {
    val rows = Quality.dqOutlierIqr(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.nonEmpty)
    val nEvents = graft.tables.Tables.t(spark, sfDir, "events").count()
    assert(rows.map(_._8).sum == nEvents, "types must partition the stream")
    rows.foreach { case (t, q1, q3, lo, hi, nb, na, n) =>
      assert(q1 <= q3, s"$t quartile order")
      assert(lo <= q1 && hi >= q3, s"$t fences inside quartiles")
      // by construction <=25% of points sit below Q1, so below-fence is bounded
      assert(nb * 4 <= n && na * 4 <= n, s"$t fence counts exceed quartile mass")
    }
  }

  test("dim_snapshot_compare: classes partition orders, append-only law holds") {
    val rows = Quality.dimSnapshotCompare(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    assert(rows.map(_._3).sum == graft.tables.Tables.t(spark, sfDir, "orders").count(),
      "status x class cells must partition the order set")
    assert(rows.map(_._2).toSet.subsetOf(Set("absent", "added", "changed", "unchanged")),
      "unexpected change class (a 'removed' here would mean value regressed)")
    rows.foreach { case (st, cls, _, delta, maxDelta) =>
      // shipping is append-only, so snapshot value never decreases
      assert(delta >= 0 && maxDelta >= 0, s"$st/$cls negative delta in append-only diff")
      if (cls == "unchanged" || cls == "absent")
        assert(delta == 0, s"$st/$cls nonzero delta")
      if (cls == "added" || cls == "changed")
        assert(delta > 0, s"$st/$cls zero total delta")
    }
  }

  test("event_top_paths: path shares bounded, counts cover at most all users") {
    val rows = Quality.eventTopPaths(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getDouble(3)))
    assert(rows.nonEmpty && rows.length <= 20)
    val nUsers = graft.tables.Tables.t(spark, sfDir, "events")
      .select("user_id").distinct().count()
    assert(rows.map(_._2).sum <= nUsers, "top-20 path counts exceed the user population")
    rows.foreach { case (path, n, hasP, share) =>
      assert(n >= 1 && share > 0 && share <= 1.0)
      assert(path.split(">").length <= 5, s"path '$path' over the 5-event truncation")
      assert(hasP == path.contains("purchase"), s"purchase flag mismatch for '$path'")
    }
    // counts are descending under the declared order
    assert(rows.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("dq_reconcile_totals: status partition covers all orders, bounds are consistent") {
    val rows = Quality.dqReconcileTotals(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val orders = graft.tables.Tables.t(spark, sfDir, "orders")
    assert(rows.map(_._2).sum == orders.count(), "statuses must partition the order set")
    assert(rows.map(_._1).toSet ==
      orders.select("o_orderstatus").distinct().collect().map(_.getString(0)).toSet)
    rows.foreach { case (st, nOrders, nLines, nExact, maxAbs, meanAbs) =>
      assert(nExact <= nLines && nLines <= nOrders, s"$st count ordering")
      assert(meanAbs <= maxAbs, s"$st mean > max")
      assert(maxAbs >= 0 && meanAbs >= 0, s"$st negative magnitudes")
    }
  }
}
