package graft

import org.apache.spark.sql.functions._

/** Round-15 third wave: in-memory replays and invariant pins for the
  * five operators added after the r15 ladder close (event_diff_in_diff,
  * event_cumulative_ab, ts_pacf, ts_granger_lag1, llm_dsir_select).
  * Each test checks a property the oracle hash CANNOT see — a
  * mathematical bound, a cross-query consistency, or an independent
  * plain-Scala recomputation.
  */
class Round15cOpsSpec extends GraftSpec {

  test("event_diff_in_diff: DiD scalar replays from its own cell means; 2 arms") {
    val rows = graft.queries.Quality.eventDiffInDiff(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSet == Set(0L, 1L))
    val byArm = rows.map(r => r.getLong(0) ->
      (r.getDouble(4), r.getDouble(5))).toMap // arm -> (pre_mean, post_mean)
    val expectDid = BigDecimal(
      (byArm(1)._2 - byArm(1)._1) - (byArm(0)._2 - byArm(0)._1))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expectGap = BigDecimal(byArm(1)._1 - byArm(0)._1)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { r =>
      assert(math.abs(r.getDouble(6) - expectDid) < 1e-9, "did_cents")
      assert(math.abs(r.getDouble(7) - expectGap) < 1e-9, "pre_gap_cents")
    }
    // cell means are consistent with the exact cents they summarize
    rows.foreach { r =>
      val mean = BigDecimal(r.getLong(2)).toDouble / r.getLong(1)
      assert(math.abs(r.getDouble(4) - mean) <= 5e-5 + 1e-12, "half-up pre_mean")
    }
  }

  test("event_cumulative_ab: monotone cells, one first crossing, final day == event_ab_test") {
    val trace = graft.queries.Quality.eventCumulativeAb(spark, sfDir).collect()
    assert(trace.nonEmpty)
    // cumulative counts never decrease, conversions never exceed entries
    val cols = Seq(1, 2, 3, 4)
    trace.sliding(2).foreach {
      case Array(a, b) =>
        cols.foreach(i => assert(b.getLong(i) >= a.getLong(i), s"col $i decreased"))
      case _ =>
    }
    trace.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "c_a <= n_a")
      assert(r.getLong(4) <= r.getLong(3), "c_b <= n_b")
    }
    // at most one first_crossing, and only on a naive-significant day
    val crossings = trace.filter(_.getBoolean(6))
    assert(crossings.length <= 1)
    crossings.foreach(r => assert(r.getBoolean(5)))
    // the final day's cumulative cells ARE the fixed-horizon census:
    // cross-query consistency with event_ab_test's four counts
    val fin = trace.last
    val ab = graft.queries.Quality.eventAbTest(spark, sfDir).collect().head
    assert(fin.getLong(1) == ab.getLong(0) && fin.getLong(2) == ab.getLong(1) &&
      fin.getLong(3) == ab.getLong(2) && fin.getLong(4) == ab.getLong(3),
      s"final trace row $fin vs ab_test $ab")
  }

  test("ts_pacf: pacf(1) == acf(1); Durbin-Levinson replays from the acf row") {
    val rows = graft.queries.TimeSeries.tsPacf(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val r = rows.map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val p = rows.map(x => x.getLong(0) -> x.getDouble(2)).toMap
    rows.foreach(x => assert(math.abs(x.getDouble(1)) <= 1.0 + 1e-6, "|acf| <= 1"))
    assert(math.abs(p(1L) - BigDecimal(r(1L)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    val phi22 = (r(2L) - r(1L) * r(1L)) / (1.0 - r(1L) * r(1L))
    assert(math.abs(p(2L) - BigDecimal(phi22).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    val a21 = r(1L) * (1.0 - phi22)
    val phi33 = (r(3L) - a21 * r(2L) - phi22 * r(1L)) /
      (1.0 - a21 * r(1L) - phi22 * r(2L))
    assert(math.abs(p(3L) - BigDecimal(phi33).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
  }

  test("ts_granger_lag1: R2 bounds; adding a regressor never lowers R2; lift is the difference") {
    val row = graft.queries.TimeSeries.tsGrangerLag1(spark, sfDir).collect().head
    val r2r = row.getDouble(1); val r2f = row.getDouble(2); val lift = row.getDouble(3)
    assert(r2r >= -1e-9 && r2r <= 1.0 + 1e-9, s"r2_ar1 $r2r")
    assert(r2f >= -1e-9 && r2f <= 1.0 + 1e-9, s"r2_full $r2f")
    // OLS monotonicity: the full model nests the restricted one
    assert(r2f >= r2r - 1e-6, s"r2_full $r2f < r2_ar1 $r2r")
    assert(math.abs(lift - BigDecimal(r2f - r2r).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 2e-6)
    assert(row.getBoolean(4) == (lift > 0.05))
  }

  test("llm_dsir_select: full weight table replays from a plain-Scala fold; top-25 order exact") {
    val got = graft.queries.LlmExtra.llmDsirSelect(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(got.length == 25)
    // independent replay: JDK md5, Scala math.log, BigDecimal half-up
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def bucket(w: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 64
    }
    val toks = docs.flatMap { case (id, lang, text) =>
      text.split(" ", -1).map(w => (id, lang, bucket(w))) }
    val corpus = toks.groupBy(_._3).map { case (b, g) => b -> g.length.toLong }
    val target = toks.filter(_._2 == "en").groupBy(_._3)
      .map { case (b, g) => b -> g.length.toLong }
    val tCorpus = corpus.values.sum; val tTarget = target.values.sum
    val lr = corpus.map { case (b, c) =>
      val t = target.getOrElse(b, 0L)
      b -> BigDecimal((math.log((t + 1).toDouble) - math.log((tTarget + 64).toDouble)
        - math.log((c + 1).toDouble) + math.log((tCorpus + 64).toDouble)) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val weights = toks.groupBy(_._1).map { case (id, g) =>
      id -> g.map(t => lr(t._3)).sum }
    val expect = weights.toSeq.sortBy { case (id, w) => (-w, id) }.take(25)
    assert(got.toSeq == expect, s"engine ${got.take(3).toSeq} vs replay ${expect.take(3)}")
  }

  test("dq_control_chart: limits replay from a plain-Scala fold; flags match the limits") {
    val rows = graft.queries.Quality.dqControlChart(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ns = rows.map(_.getLong(1))
    def halfUp(num: Long, den: Long): Double =
      (BigDecimal(num) / BigDecimal(den))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val xBar = halfUp(ns.sum, ns.length)
    val mrs = ns.sliding(2).map { case Array(a, b) => math.abs(b - a) }.toSeq
    val mrBar = halfUp(mrs.sum, mrs.length)
    val ucl = BigDecimal(xBar + 2.66 * mrBar).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lcl = BigDecimal(xBar - 2.66 * mrBar).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { r =>
      assert(math.abs(r.getDouble(3) - xBar) < 1e-9, "x_bar")
      assert(math.abs(r.getDouble(4) - mrBar) < 1e-9, "mr_bar")
      assert(math.abs(r.getDouble(5) - ucl) < 1e-9, "ucl")
      assert(math.abs(r.getDouble(6) - lcl) < 1e-9, "lcl")
      assert(r.getBoolean(7) == (r.getLong(1).toDouble > r.getDouble(5) ||
        r.getLong(1).toDouble < r.getDouble(6)), "flag matches limits")
    }
  }

  test("ts_hampel: median/MAD replay from a sliding-window fold; repair only where flagged") {
    val rows = graft.queries.TimeSeries.tsHampel(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // rebuild the daily series from the output itself is circular for
    // edge days; recompute from parquet instead
    val daily = graft.tables.Tables.t(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum((col("value").cast("decimal(12,2)") * 100).cast("long")).as("cents"))
      .orderBy("day").collect().map(r => (r.getDate(0).toString, r.getLong(1)))
    val byDay = daily.sliding(7).map { w =>
      val med = w.map(_._2).sorted.apply(3)
      val mad = w.map(v => math.abs(v._2 - med)).sorted.apply(3)
      (w(3)._1, med, mad)
    }.map(t => t._1 -> (t._2, t._3)).toMap
    rows.foreach { r =>
      val (med, mad) = byDay(r.getDate(0).toString)
      assert(r.getLong(2) == med, s"median on ${r.getDate(0)}")
      assert(r.getLong(3) == mad, s"mad on ${r.getDate(0)}")
      val flagged = math.abs(r.getLong(1) - med) * 10000L > mad * 44478L
      assert(r.getBoolean(4) == flagged)
      assert(r.getLong(5) == (if (flagged) med else r.getLong(1)))
    }
  }

  test("census_grouped_median: bracket contains n/2; estimate within its bracket and near the exact median") {
    val rows = graft.queries.CensusQueries.censusGroupedMedian(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1); val lo = r.getLong(2); val f = r.getLong(3); val cb = r.getLong(4)
      assert(cb * 2 < n && (cb + f) * 2 >= n, "containing bracket")
      val gm = r.getDouble(5)
      assert(gm >= lo && gm <= lo + 100000, s"median $gm outside bracket [$lo, ${lo + 100000}]")
    }
    // the interpolated estimate sits within one bracket width of the
    // exact per-nation median
    val exact = spark.read.parquet(s"$sfDir/customer.parquet")
      .join(spark.read.parquet(s"$sfDir/nation.parquet"),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(expr("percentile_approx(round(c_acctbal * 100), 0.5, 100000)").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      assert(math.abs(r.getDouble(5) - exact(r.getString(0))) <= 100000.0,
        s"${r.getString(0)}: grouped ${r.getDouble(5)} vs exact ${exact(r.getString(0))}")
    }
  }

  test("llm_mix_temperature: rates normalize; boost anti-monotone in share (sqrt flattening)") {
    val rows = graft.queries.LlmExtra.llmMixTemperature(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val rateSum = rows.map(_.getLong(5)).sum
    assert(math.abs(rateSum - 1000000L) <= rows.length, s"rates sum to $rateSum")
    // boost ∝ 1/sqrt(share): bigger share can never have a bigger boost
    // (allow 1-milli quantization slop)
    val byShare = rows.map(r => (r.getLong(3), r.getLong(6))).sortBy(_._1)
    byShare.sliding(2).foreach {
      case Array((s1, b1), (s2, b2)) if s2 > s1 =>
        assert(b2 <= b1 + 1, s"share $s2 boost $b2 > share $s1 boost $b1")
      case _ =>
    }
  }
}
