package graft

import org.apache.spark.sql.functions._
import graft.queries.{GraphQueries, Quality, Relational, TimeSeries}
import graft.tables.Tables.t

/** Invariant coverage for the time-series / graph / audit operators
  * (each is also DuckDB-oracle-checked; these assert the semantic
  * properties a hash compare can't express). */
class TimeSeriesGraphSpec extends GraftSpec {

  test("ts_gap_fill_interpolate: contiguous daily calendar, interpolations inside neighbor bounds") {
    val rows = TimeSeries.tsGapFillInterpolate(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getBoolean(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (u, series) =>
      val byDay = series.sortBy(_._2.toEpochDay)
      // no calendar gaps inside [min, max], endpoints observed
      byDay.zip(byDay.drop(1)).foreach { case (a, b) =>
        assert(b._2.toEpochDay == a._2.toEpochDay + 1, s"user $u: gap ${a._2} -> ${b._2}")
      }
      assert(!byDay.head._3 && !byDay.last._3, s"user $u: endpoints must be observed")
      // each interpolated value sits within [min, max] of its two
      // observed neighbors (linearity bound)
      var prev = byDay.head._4
      byDay.zipWithIndex.foreach { case (cur, i) =>
        if (!cur._3) prev = cur._4
        else {
          val next = byDay.drop(i + 1).find(!_._3).get._4
          assert(cur._4 >= math.min(prev, next) - 1e-9 && cur._4 <= math.max(prev, next) + 1e-9,
            s"user $u day ${cur._2}: ${cur._4} outside [$prev, $next]")
        }
      }
    }
  }

  test("ts_resample_ohlc: low <= open/close <= high, volumes positive") {
    val rows = TimeSeries.tsResampleOhlc(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, o, h, l, c) = (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(n > 0)
      assert(l <= o && o <= h, s"open $o outside [$l, $h]")
      assert(l <= c && c <= h, s"close $c outside [$l, $h]")
      if (n == 1) assert(o == c && o == h && o == l)
    }
  }

  test("graph_triangle_count: positive counts, sorted output") {
    val rows = GraphQueries.graphTriangleCount(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 > 0))
    assert(rows.map(_._2).toSeq == rows.map(_._2).sortBy(-_).toSeq)
  }

  test("graph_bfs_hops: hop histogram covers all nodes, seeds at hop 0, rings within bound") {
    val rows = GraphQueries.graphBfsHops(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows.keySet.forall(h => h == -1L || (h >= 0L && h <= 3L)))
    assert(rows.getOrElse(0L, 0L) >= 1L, "at least one seed node")
    // histogram covers exactly the node set
    val docs = graft.tables.Tables.t(spark, sfDir, "documents")
      .filter(col("doc_id") < 1200).count()
    assert(rows.values.sum == docs, s"histogram mass ${rows.values.sum} != node count $docs")
  }

  test("dq_fk_orphans: four checks, orphans bounded by child rows, star schema is referentially intact") {
    val rows = Quality.dqFkOrphans(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 4)
    rows.foreach { case (name, children, orphans, keys) =>
      assert(children > 0, s"$name: empty child side")
      assert(orphans >= 0 && orphans <= children)
      assert(keys <= orphans)
      assert(orphans == 0, s"$name: synthetic star schema should be intact, found $orphans orphans")
    }
  }

  test("dq_value_rules: rates consistent with counts, both firing and silent rules present") {
    val rows = Quality.dqValueRules(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 5)
    val n = graft.tables.Tables.t(spark, sfDir, "orders").count()
    rows.foreach { case (_, v, rate) =>
      assert(v >= 0 && v <= n)
      assert(math.abs(rate - v.toDouble / n) < 1e-3)
    }
    assert(rows.exists(_._2 > 0), "at least one rule must fire on this data")
    assert(rows.exists(_._2 == 0), "at least one rule must be silent on this data")
  }

  test("agg_weighted_median: half-weight property holds against raw data") {
    import graft.tables.Tables.t
    val med = Relational.aggWeightedMedian(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val li = t(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity").cast("long").as("q"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    med.foreach { case (flag, (m, tw)) =>
      val grp = li.filter(_._1 == flag)
      assert(grp.map(_._3).sum == tw)
      val below = grp.filter(_._2 < m).map(_._3).sum   // strictly below median
      val through = grp.filter(_._2 <= m).map(_._3).sum // including ties at median
      assert(below * 2 < tw, s"$flag: too much weight strictly below $m")
      assert(through * 2 >= tw, s"$flag: weight through $m does not reach half")
    }
  }

  test("ts_holt_linear: seed row is (level=y, trend=0), forecast=level+trend, recursion replays exactly") {
    val rows = TimeSeries.tsHoltLinear(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (uid, series) =>
      val s = series.sortBy(_._2)
      // seed
      assert(s.head._4 == s.head._3.toDouble / 100, s"user $uid seed level")
      assert(s.head._5 == 0.0, s"user $uid seed trend")
      // replay the integer recurrence against the emitted doubles
      var l = 0L; var b = 0L
      s.zipWithIndex.foreach { case ((_, _, c, lev, tr, fc), i) =>
        if (i == 0) { l = c; b = 0L }
        else { val lp = l; l = (c + l + b) / 2; b = (l - lp + b) / 2 }
        assert(lev == l.toDouble / 100, s"user $uid step $i level")
        assert(tr == b.toDouble / 100, s"user $uid step $i trend")
        assert(math.abs(fc - (lev + tr)) < 1e-9, s"user $uid step $i forecast != level+trend")
      }
    }
  }

  test("ts_alpha_beta_filter: seed is (innov=0, level=y, trend=0) and the integer recurrence replays") {
    val rows = TimeSeries.tsAlphaBetaFilter(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (uid, series) =>
      val s = series.sortBy(_._2)
      assert(s.head._4 == 0.0, s"user $uid seed innovation")
      assert(s.head._5 == s.head._3.toDouble / 100, s"user $uid seed level")
      assert(s.head._6 == 0.0, s"user $uid seed trend")
      var l = 0L; var b = 0L
      s.zipWithIndex.foreach { case ((_, _, c, innov, lev, tr), i) =>
        if (i == 0) { l = c; b = 0L; assert(innov == 0.0) }
        else {
          val pred = l + b
          val r = c - pred
          l = pred + r / 2
          b = b + r / 4
          assert(innov == r.toDouble / 100, s"user $uid step $i innovation")
        }
        assert(lev == l.toDouble / 100, s"user $uid step $i level")
        assert(tr == b.toDouble / 100, s"user $uid step $i trend")
      }
    }
  }

  test("geo_tile_rollup: pyramid is consistent — children sum to parents, zoom-0 is the point total") {
    val rows = graft.queries.GeoQueries.geoTileRollup(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byZoom = rows.groupBy(_._1)
    assert(byZoom.keySet == Set(0, 1, 2, 3))
    val total = byZoom(0).head._3
    // every quadkey has exactly `zoom` digits, all in 0..3
    rows.foreach { case (z, qk, _, _) =>
      assert(qk.length == z && qk.forall(c => c >= '0' && c <= '3'), s"quadkey $qk at zoom $z")
    }
    // each level partitions the full point set
    (1 to 3).foreach { z =>
      assert(byZoom(z).map(_._3).sum == total, s"zoom $z count sum")
      assert(byZoom(z).map(_._4).sum == byZoom(0).head._4, s"zoom $z id sum")
    }
    // each child rolls up into its prefix parent
    (1 to 3).foreach { z =>
      val parents = byZoom(z - 1).map(r => r._2 -> (r._3, r._4)).toMap
      byZoom(z).groupBy(_._2.dropRight(1)).foreach { case (pfx, kids) =>
        assert(parents(pfx) == ((kids.map(_._3).sum, kids.map(_._4).sum)),
          s"children of $pfx do not sum to parent")
      }
    }
  }

  test("llm_dup_span: spans bounded by doc size, planted 60-char verbatim copy localized") {
    import SparkSpecBase.spark.implicits._
    val rows = graft.queries.LlmExtra.llmDupSpan(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty, "fixture corpus must contain cross-doc 40-char dup spans")
    rows.foreach { case (id, nGrams, nDup, nRuns, maxSpan, frac) =>
      assert(nDup >= 1 && nDup <= nGrams, s"doc $id dup count bounds")
      assert(nRuns >= 1 && nRuns <= nDup, s"doc $id run count bounds")
      assert(maxSpan >= 40 && maxSpan <= nGrams + 39, s"doc $id span bounds")
      assert(frac > 0.0 && frac <= 1.0, s"doc $id dup_frac range")
    }
    // planted fixture: two synthetic docs sharing one exact 60-char span,
    // the rest unique — the island must be exactly 21 grams = 60 chars
    val pad1 = ("u1" * 40).take(80)
    val pad2 = ("v2" * 40).take(80)
    val span = ("the quick brown fox jumps over the lazy dog again and again" + " " * 60).take(60)
    val tmp = java.nio.file.Files.createTempDirectory("dupspan").toString
    Seq((1L, pad1 + span, "en", "s", 0L), (2L, span + pad2, "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val planted = graft.queries.LlmExtra.llmDupSpan(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(4))).toMap
    assert(planted.keySet == Set(1L, 2L))
    assert(planted(1L) == 60 && planted(2L) == 60,
      s"planted 60-char span must be localized exactly, got $planted")
  }

  test("ts_seasonal_decompose: components re-add exactly, edges null, seasonal constant per weekday") {
    val rows = TimeSeries.tsSeasonalDecompose(spark, sfDir).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getInt(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))
    assert(rows.nonEmpty)
    val sorted = rows.sortBy(_._1.toEpochDay)
    // first/last 3 rows have no full centered window
    (sorted.take(3) ++ sorted.takeRight(3)).foreach { r =>
      assert(r._4.isEmpty && r._5.isEmpty && r._6.isEmpty, s"edge row ${r._1} must be null")
    }
    sorted.drop(3).dropRight(3).foreach { case (day, wd, cents, t, sSea, res) =>
      assert(t.isDefined && sSea.isDefined && res.isDefined, s"interior row $day")
      assert(t.get + sSea.get + res.get == cents, s"$day components must re-add to cents")
      assert(wd == ((day.getDayOfWeek.getValue + 6) % 7), s"$day weekday code")
    }
    // one seasonal value per weekday
    val perWd = rows.filter(_._5.isDefined).groupBy(_._2).view.mapValues(_.map(_._5.get).toSet)
    perWd.foreach { case (wd, vals) => assert(vals.size == 1, s"weekday $wd seasonal not constant") }
  }

  test("ts_autocorrelation: |acf| <= 1, pair counts correct, replays the exact integer co-moments") {
    val rows = TimeSeries.tsAutocorrelation(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == (1 to 7))
    val daily = t(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum((col("value").cast("decimal(12,2)") * 100).cast("long")).as("cents"))
      .orderBy("day").collect().map(_.getLong(1))
    val n = daily.length
    val total = daily.sum
    val d = daily.map(_ * n - total)
    val den = d.map(x => x * x).sum
    rows.foreach { case (k, nPairs, acf) =>
      assert(nPairs == n - k, s"lag $k pair count")
      assert(math.abs(acf) <= 1.0, s"lag $k acf out of range")
      val num = (k until n).map(t0 => d(t0) * d(t0 - k)).sum
      val expected = (if (num < 0) -1.0 else 1.0) *
        ((math.abs(num) * 10000 * 2 + den) / (den * 2)).toDouble / 10000
      assert(acf == expected, s"lag $k: got $acf expected $expected")
    }
  }

  test("graph_jaccard_neighbors: equals brute-force neighbor-set jaccard on the same edges") {
    val rows = graft.queries.GraphQueries.graphJaccardNeighbors(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
    assert(rows.nonEmpty)
    // rebuild the same edge set (identical blocking, cap inert at this SF)
    val docs = t(spark, sfDir, "documents").filter(col("doc_id") < 1200)
      .select("doc_id", "source", "lang", "n_chars")
    val edges = graft.queries.GraphQueries.simEdgesCapped(docs, graft.operators.HotKeys.DefaultCap)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    edges.foreach { case (u, v) => nbrs(u) += v; nbrs(v) += u }
    rows.foreach { case ((a, b), (da, db, nc, jac)) =>
      assert(da == nbrs(a).size && db == nbrs(b).size, s"($a,$b) degrees")
      val common = (nbrs(a) intersect nbrs(b)).size.toLong
      assert(nc == common, s"($a,$b) common-neighbor count")
      val den = da + db - nc
      val expJac = ((nc * 10000 * 2 + den) / (den * 2)).toDouble / 10000
      assert(jac == expJac, s"($a,$b) jaccard half-up")
    }
    // the returned 50 are the global top under (jaccard desc, a, b)
    val all = (for {
      a <- nbrs.keys; b <- nbrs.keys if a < b
      c = (nbrs(a) intersect nbrs(b)).size if c >= 2
    } yield {
      val den = nbrs(a).size + nbrs(b).size - c
      ((a, b), ((c * 10000L * 2 + den) / (den * 2)).toDouble / 10000)
    }).toSeq
    val top = all.sortBy { case ((a, b), j) => (-j, a, b) }.take(50).map(_._1).toSet
    assert(rows.map(_._1).toSet == top, "top-50 must match brute force")
  }

  test("geo grid distance join equals the naive O(n^2) reference on random points") {
    import SparkSpecBase.spark.implicits._
    val rnd = new scala.util.Random(23)
    val R = 25L
    // include coordinated clusters so near pairs certainly exist, plus
    // exact-boundary pairs (d == R) to pin the <= semantics
    val pts = (0 until 300).map(i => (i.toLong, rnd.nextInt(400).toLong, rnd.nextInt(400).toLong)) ++
      Seq((1000L, 50L, 50L), (1001L, 75L, 50L), (1002L, 50L, 75L)) // d = 25 exactly
    val df = pts.toDF("id", "x", "y")
    val a = df.select(col("id").as("id_a"), col("x").as("xa"), col("y").as("ya"),
      call_function("div", col("x"), lit(R)).as("cx"),
      call_function("div", col("y"), lit(R)).as("cy"))
    val nbr = array((-1 to 1).map(i => lit(i.toLong)): _*)
    val b = df.select(col("id").as("id_b"), col("x").as("xb"), col("y").as("yb"))
      .withColumn("dx", explode(nbr)).withColumn("dy", explode(nbr))
      .select(col("id_b"), col("xb"), col("yb"),
        (call_function("div", col("xb"), lit(R)) + col("dx")).as("cx"),
        (call_function("div", col("yb"), lit(R)) + col("dy")).as("cy"))
    val d2 = (col("xa") - col("xb")) * (col("xa") - col("xb")) +
      (col("ya") - col("yb")) * (col("ya") - col("yb"))
    val grid = a.join(b, Seq("cx", "cy"))
      .filter(col("id_a") < col("id_b") && d2 <= lit(R * R))
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = (for {
      (i, xi, yi) <- pts; (j, xj, yj) <- pts
      if i < j && (xi - xj) * (xi - xj) + (yi - yj) * (yi - yj) <= R * R
    } yield (i, j)).toSet
    assert(grid == naive, s"missing=${naive -- grid} extra=${grid -- naive}")
    assert(naive.contains((1000L, 1001L)) && naive.contains((1000L, 1002L)),
      "boundary pairs must be present in the reference")
  }

  test("geo bbox containment equals the naive reference on random points and rects") {
    import SparkSpecBase.spark.implicits._
    val rnd = new scala.util.Random(41)
    val pts = (0 until 400).map(i => (i.toLong, rnd.nextInt(500).toLong, rnd.nextInt(500).toLong))
    // rects deliberately include cell-boundary-aligned and out-of-plane edges
    val rects = (0 until 20).map { r =>
      val cx = rnd.nextInt(600) - 50L; val cy = rnd.nextInt(600) - 50L
      val hw = Seq(60L, 80L, 100L, 120L)(rnd.nextInt(4))
      (r.toLong, cx - hw, cx + hw, cy - hw, cy + hw)
    }
    val p = pts.toDF("id", "x", "y")
      .withColumn("cx", call_function("div", col("x"), lit(100L)))
      .withColumn("cy", call_function("div", col("y"), lit(100L)))
    val rcells = rects.toDF("rid", "x0", "x1", "y0", "y1")
      .withColumn("cx", explode(expr("sequence(x0 div 100, x1 div 100)")))
      .withColumn("cy", explode(expr("sequence(y0 div 100, y1 div 100)")))
    val grid = p.join(rcells, Seq("cx", "cy"))
      .filter(col("x").between(col("x0"), col("x1")) && col("y").between(col("y0"), col("y1")))
      .select("rid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = (for {
      (rid, x0, x1, y0, y1) <- rects; (i, x, y) <- pts
      if x >= x0 && x <= x1 && y >= y0 && y <= y1
    } yield (rid, i)).toSet
    assert(grid == naive, s"missing=${naive -- grid} extra=${grid -- naive}")
    assert(naive.nonEmpty)
  }

  test("ts_interval_merge: merged intervals are disjoint, ordered, and cover all input") {
    val got = graft.queries.TimeSeries.tsIntervalMerge(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (u, ivs) =>
      val sorted = ivs.sortBy(_._2.getTime)
      sorted.foreach { case (_, s0, e0, n) =>
        assert(!e0.before(s0), s"user $u: interval ends before start")
        assert(n >= 1)
      }
      sorted.sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) =>
          assert(e1.before(s2), s"user $u: merged intervals overlap/touch: $e1 !< $s2")
        case _ => ()
      }
    }
    // count conservation: merged interval counts sum to the input rows
    val nInput = t(spark, sfDir, "events")
      .filter(col("user_id") < 8 && col("event_type") === "click").count()
    assert(got.map(_._4).sum == nInput)
  }

  test("label propagation: labels are node ids from the same component, rounds deterministic") {
    val lab = graft.queries.GraphQueries.graphLabelPropagation(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(lab.nonEmpty)
    val nodes = lab.map(_._1).toSet
    assert(lab.forall { case (_, l) => nodes.contains(l) },
      "every label must be an existing node id")
    // determinism across two builds (same session — catches unordered
    // tie-breaks and partition-dependent majority resolution)
    val again = graft.queries.GraphQueries.graphLabelPropagation(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(lab.sameElements(again))
  }

  test("graph_components: partition of the node set, representative is the min member") {
    val comps = GraphQueries.graphComponents(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(comps.nonEmpty)
    // representative (min label) <= max member, sizes positive
    assert(comps.forall { case (c, n, mx) => c <= mx && n > 0 })
    // components partition the LPA graph's node set exactly (same
    // simEdges adjacency underneath)
    val nLpa = GraphQueries.graphLabelPropagation(spark, sfDir).count()
    assert(comps.map(_._2).sum == nLpa,
      s"component sizes sum ${comps.map(_._2).sum} != node count $nLpa")
    // components are coarser than (or equal to) 3-round LPA communities:
    // every LPA label pair in one component — spot-check determinism
    val again = GraphQueries.graphComponents(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(comps.sameElements(again))
  }

  test("dq_benford: digits 1-9, frequencies sum to ~1, expectation is the Benford curve") {
    val rows = Quality.dqBenford(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._1).toSeq == (1 to 9))
    val freqSum = rows.map(_._3).sum
    assert(math.abs(freqSum - 1.0) < 0.001, s"obs frequencies sum to $freqSum")
    // expectation column must be the computed Benford curve
    for ((d, _, _, exp, dev) <- rows) {
      assert(math.abs(exp - math.log10(1.0 + 1.0 / d)) < 0.0001)
      assert(dev >= 0.0 && dev <= 1.0)
    }
  }

  test("llm_split_overlap: full ordered matrix, ratios in [0,1], sizes consistent") {
    val rows = graft.queries.LlmExtra.llmSplitOverlap(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    // all 6 ordered pairs of {train, val, test} present (every split
    // shares at least one 8-gram with every other on this corpus)
    val splits = Set("train", "val", "test")
    assert(rows.keySet == (for (a <- splits; b <- splits if a != b) yield (a, b)))
    for (((_, _), (nb, nov, c)) <- rows) {
      assert(nov <= nb, "overlap cannot exceed the split's gram count")
      assert(c >= 0.0 && c <= 1.0)
    }
    // n_b_grams depends only on split_b
    for (b <- splits) {
      val sizes = rows.collect { case ((_, `b`), (nb, _, _)) => nb }.toSet
      assert(sizes.size == 1, s"inconsistent n_b_grams for $b: $sizes")
    }
  }

  test("llm_semdedup_adaptive: cell budget is max(16, ceil(sqrt(n))) and cells stay within it") {
    val emb = t(spark, sfDir, "embeddings")
    val n = emb.count()
    val k = math.max(16L, math.ceil(math.sqrt(n.toDouble)).toLong)
    val out = graft.queries.LlmExtra.llmSemdedupAdaptive(spark, sfDir).collect()
    assert(out.nonEmpty)
    // every populated cell id is a valid centroid index under the budget
    assert(out.forall(r => r.getLong(0) >= 0 && r.getLong(0) < k),
      s"cell id outside [0, $k)")
    // more cells than the fixed-16 form can address once n > 256
    if (n > 256) assert(out.map(_.getLong(0)).max >= 16,
      "adaptive budget did not widen past the fixed quantizer")
  }

  test("llm_dup_span: the scratch-budgeted bucketed path is bit-identical to the single-pass plan") {
    // the B>1 path normally only runs when the corpus outgrows
    // SPARK_GRAFT_SHUFFLE_BUDGET (sf100) — force it here and assert
    // exact equality with the default plan, row for row
    val single = graft.queries.LlmExtra.llmDupSpanImpl(spark, sfDir, Some(1))
      .collect().map(_.toSeq).toSeq
    val bucketed = graft.queries.LlmExtra.llmDupSpanImpl(spark, sfDir, Some(3))
      .collect().map(_.toSeq).toSeq
    assert(single.nonEmpty, "dup_span must find duplicated spans in the near-dup corpus")
    assert(bucketed == single,
      s"bucketed (B=3) diverges from single-pass: ${bucketed.length} vs ${single.length} rows")
  }

  test("graph_core_decomposition: histogram replays least(core, 4) from a peel-to-fixpoint") {
    // round-14 semantics: the k <= 4 TRUNCATION of the true core number
    // (shared hIndexEstimates engine with graph_core_full; the sibling
    // core_full spec asserts the 12-round iteration converges on this
    // graph, so the truncated estimates ARE least(coreness, 4))
    val rows = graft.queries.GraphQueries.graphCoreDecomposition(spark, sfDir).collect()
    // round 15: the query carries its own convergence verdict — the
    // peel replay below is only a valid comparison under this flag,
    // and the flag makes that precondition the query's own output
    // instead of a cross-query assumption
    assert(rows.forall(_.getBoolean(4)), "12-round h-index iteration did not converge")
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty && got.map(_._1).toSeq == got.map(_._1).toSeq.sorted)
    // independent replay: true core numbers via sequential peel-to-fixpoint
    val docs = graft.tables.Tables.t(spark, sfDir, "documents")
      .filter(col("doc_id") < 1200)
    val e0 = graft.queries.GraphQueries
      .simEdgesCapped(docs, graft.operators.HotKeys.DefaultCap)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var edges = (e0 ++ e0.map(p => (p._2, p._1))).toSet
    val core = scala.collection.mutable.Map.empty[Long, Long]
    var k = 1
    while (edges.nonEmpty && k <= 32) {
      var changed = true
      while (changed) {
        val deg = edges.groupBy(_._1).map { case (u, es) => u -> es.size }
        val alive = deg.filter(_._2 >= k).keySet
        val next = edges.filter(e => alive(e._1) && alive(e._2))
        changed = next.size != edges.size
        edges = next
      }
      edges.map(_._1).foreach(n => core(n) = k.toLong)
      k += 1
    }
    val expect = core.toSeq.map { case (n, c) => (n, math.min(c, 4L)) }
      .groupBy(_._2).map { case (c, ns) =>
        (c, ns.size.toLong, ns.map(_._1).min, ns.map(_._1).max)
      }.toSeq.sortBy(_._1)
    assert(got.toSeq == expect, s"histogram diverges:\ngot    ${got.toSeq}\nexpect $expect")
  }

  test("graph_core_full: histogram replays from an in-memory peel-to-fixpoint, converged") {
    val got = graft.queries.GraphQueries.graphCoreFull(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(got.nonEmpty && got.map(_._1).toSeq == got.map(_._1).toSeq.sorted)
    // on the sf-test graphs the h-index iteration reaches its coreness
    // fixpoint inside the 12-round cap — the replay equality below is
    // only meaningful under this flag
    got.foreach { case (k, _, _, _, conv) =>
      assert(conv, s"level $k reported a non-converged decomposition")
    }
    // independent replay: true core numbers via sequential peel-to-fixpoint
    val docs = graft.tables.Tables.t(spark, sfDir, "documents")
      .filter(col("doc_id") < 1200)
    val e0 = graft.queries.GraphQueries
      .simEdgesCapped(docs, graft.operators.HotKeys.DefaultCap)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var edges = (e0 ++ e0.map(p => (p._2, p._1))).toSet
    val core = scala.collection.mutable.Map.empty[Long, Long]
    var k = 1
    while (edges.nonEmpty && k <= 32) {
      var changed = true
      while (changed) {
        val deg = edges.groupBy(_._1).map { case (u, es) => u -> es.size }
        val alive = deg.filter(_._2 >= k).keySet
        val next = edges.filter(e => alive(e._1) && alive(e._2))
        changed = next.size != edges.size
        edges = next
      }
      edges.map(_._1).foreach(n => core(n) = k.toLong)
      k += 1
    }
    val expect = core.groupBy(_._2).map { case (c, ns) =>
      (c, ns.size.toLong, ns.keys.min, ns.keys.max)
    }.toSeq.sortBy(_._1)
    assert(got.map(t => (t._1, t._2, t._3, t._4)).toSeq == expect,
      s"histogram diverges:\ngot    ${got.toSeq}\nexpect $expect")
  }

  test("graph_core_full engine: path/cycle graphs pin convergence semantics of the round cap") {
    import SparkSpecBase.spark.implicits._
    def pathAdj(n: Int) = {
      val e = (1 until n).map(i => (i.toLong, i.toLong + 1))
      (e ++ e.map(_.swap)).toDF("u", "v")
    }
    // 20-node path: the h-index "coreness 1" front travels one node per
    // round from each endpoint (max distance 9), so 12 rounds converge —
    // every node reports its TRUE core number 1
    val short = graft.queries.GraphQueries.coreFullOn(pathAdj(20), 12).collect()
    assert(short.map(r => (r.getLong(0), r.getLong(1), r.getBoolean(4))).toSeq
      == Seq((1L, 20L, true)))
    // 60-node path: max distance 29 defeats the cap — the engine must
    // say so loudly (converged = false on every row) instead of passing
    // off the still-2 interior estimates as core numbers
    val long = graft.queries.GraphQueries.coreFullOn(pathAdj(60), 12).collect()
    assert(long.map(_.getLong(0)).toSeq == Seq(1L, 2L), "interior front unfinished")
    assert(long.forall(!_.getBoolean(4)), "uncapped flag must be false")
    // cycle: degree-regular graph is an immediate fixpoint (est stays 2)
    val cyc = (1 to 12).map(i => (i.toLong, (i % 12).toLong + 1))
    val cycAdj = (cyc ++ cyc.map(_.swap)).toDF("u", "v")
    val ring = graft.queries.GraphQueries.coreFullOn(cycAdj, 12).collect()
    assert(ring.map(r => (r.getLong(0), r.getLong(1), r.getBoolean(4))).toSeq
      == Seq((2L, 12L, true)))
  }

  test("graph_k_core: survivors have core_deg >= 3 and sit inside the degree-3 subgraph") {
    val rows = graft.queries.GraphQueries.graphKCore(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // every emitted node survived three peels, so its final degree is >= 3
    rows.foreach { case (n, d) => assert(d >= 3, s"node $n core_deg $d < k") }
    // monotonicity: the peel can only REMOVE nodes/edges, so each
    // survivor's core degree is bounded by its raw degree in the full graph
    import org.apache.spark.sql.functions._
    val docs = graft.tables.Tables.t(spark, sfDir, "documents")
      .filter(col("doc_id") < 1200)
    val blocks = docs.select(col("doc_id").as("u"),
        concat_ws("|", lit("s"), col("source"), expr("n_chars div 100")).as("bk"))
      .union(docs.select(col("doc_id").as("u"),
        concat_ws("|", lit("l"), col("lang"), expr("n_chars div 50")).as("bk")))
    val e = blocks.join(blocks.withColumnRenamed("u", "v"), "bk")
      .filter(col("u") < col("v")).select("u", "v").distinct()
    val rawDeg = e.union(e.select(col("v").as("u"), col("u").as("v")))
      .groupBy("u").agg(count(lit(1)).as("deg")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (n, d) =>
      assert(d <= rawDeg.getOrElse(n, 0L), s"node $n core_deg $d exceeds raw degree")
    }
  }

  test("llm_pmi_collocations: support floor holds, lift replays from the marginals") {
    val rows = graft.queries.LlmExtra.llmPmiCollocations(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach { case (w1, w2, n, l, rr, lift) =>
      assert(n >= 5, s"($w1,$w2) below support floor")
      assert(n <= l && n <= rr, s"($w1,$w2) pair count exceeds a marginal")
      assert(lift > 0, s"($w1,$w2) non-positive lift")
    }
    // ranking is lift-descending under the declared total order
    assert(rows.map(_._6).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
      "rows not sorted by lift desc")
  }

  test("ts_rolling_variance: nonnegative numerator, zero iff constant window, mean bounds") {
    val rows = graft.queries.TimeSeries.tsRollingVariance(spark, sfDir).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (day, _, mean, varNum) =>
      assert(varNum >= 0, s"$day negative variance numerator")
      assert(mean >= 0, s"$day negative mean")
    }
    // replay one window exactly from the daily series
    import org.apache.spark.sql.functions._
    val daily = graft.tables.Tables.t(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum((col("value").cast("decimal(12,2)") * 100).cast("long")).as("c"))
      .orderBy("day").collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val mid = rows(rows.length / 2)
    val win = daily.filter(d => !d._1.isAfter(mid._1)).takeRight(7).map(_._2)
    assert(win.length == 7)
    assert(mid._4 == 7L * win.map(x => x * x).sum - win.sum * win.sum,
      s"${mid._1} variance numerator replay")
    assert(mid._3 == win.sum / 7, s"${mid._1} mean replay")
  }

  test("ts_lttb_downsample: endpoints pinned, one point per bucket, extremes survive") {
    val rows = graft.queries.TimeSeries.tsLttbDownsample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDate(2).toLocalDate, r.getLong(3)))
    assert(rows.length >= 3)
    val daily = graft.tables.Tables.t(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum((col("value").cast("decimal(12,2)") * 100).cast("long")).as("v"))
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    // first and last points are always selected
    assert(rows.head._3 == daily.head._1 && rows.last._3 == daily.last._1,
      "endpoints must be pinned")
    // one selection per bucket, buckets strictly increasing, rank order preserved
    assert(rows.map(_._1).distinct.length == rows.length, "duplicate bucket selection")
    assert(rows.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
      "selections not in series order")
    // expected count: 2 endpoints + ceil((n-2)/3) interior buckets
    val n = daily.length
    assert(rows.length == 2 + (n - 2 + 2) / 3, s"selection count for n=$n")
  }

  test("ts_week_over_week: weeks conserve the stream, growth replays from deltas") {
    val rows = graft.queries.TimeSeries.tsWeekOverWeek(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    assert(rows.nonEmpty)
    val nP = graft.tables.Tables.t(spark, sfDir, "events")
      .filter(col("event_type") === "purchase").count()
    assert(rows.map(_._3).sum == nP, "weeks must partition the purchase stream")
    assert(rows.head._5.isEmpty && rows.head._6.isEmpty, "first week has no predecessor")
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._5.contains(b._4 - a._4), s"week ${b._2} delta replay")
        assert(b._6.isDefined && (b._6.get >= 0) == (b._4 >= a._4),
          s"week ${b._2} growth sign")
      case _ =>
    }
  }

  test("agg_skyline_2d: no frontier point dominates another; dominated points exist") {
    val rows = graft.queries.Relational.aggSkyline2d(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (st, pts) =>
      // pairwise non-dominance within each status frontier
      for (a <- pts; b <- pts if a._2 != b._2) {
        val dominates = a._3 >= b._3 && a._4 >= b._4 && (a._3 > b._3 || a._4 > b._4)
        assert(!dominates, s"$st: ${a._2} dominates frontier member ${b._2}")
      }
      // the frontier is a proper subset (orders were actually filtered)
      val n = graft.tables.Tables.t(spark, sfDir, "orders")
        .filter(col("o_orderstatus") === st).count()
      assert(pts.length < n, s"$st frontier not output-sensitive")
    }
  }

  test("ts_max_drawdown: drawdown replays from the brute-force running max") {
    val r = graft.queries.TimeSeries.tsMaxDrawdown(spark, sfDir).collect()
    assert(r.length == 1)
    val (nDays, maxDd, troughDay, peakAt) =
      (r(0).getLong(0), r(0).getLong(1), r(0).getDate(2).toLocalDate, r(0).getLong(3))
    import org.apache.spark.sql.functions._
    val daily = graft.tables.Tables.t(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum((col("value").cast("decimal(12,2)") * 100).cast("long")).as("c"))
      .orderBy("day").collect().map(x => (x.getDate(0).toLocalDate, x.getLong(1)))
    assert(nDays == daily.length)
    var peak = Long.MinValue; var best = 0L; var bestDay = daily.head._1; var bestPeak = 0L
    daily.foreach { case (day, c) =>
      peak = math.max(peak, c)
      val dd = peak - c
      if (dd > best) { best = dd; bestDay = day; bestPeak = peak }
    }
    assert(maxDd == best, "max drawdown replay")
    if (best > 0) {
      assert(troughDay == bestDay, "earliest-trough day replay")
      assert(peakAt == bestPeak, "peak at trough replay")
    }
  }

  test("llm_hard_negatives: labels always differ, scores descend, k bounded") {
    val rows = graft.queries.LlmExtra.llmHardNegatives(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (pid, pl, rnk, nid, nl, cos) =>
      assert(pl != nl, s"probe $pid: negative $nid shares the label")
      assert(nid != pid, s"probe $pid returned itself")
      assert(rnk >= 1 && rnk <= 5, s"probe $pid rank $rnk")
      assert(cos >= -1.0001 && cos <= 1.0001, s"probe $pid cosine $cos")
    }
    rows.groupBy(_._1).foreach { case (pid, g) =>
      val byRank = g.sortBy(_._3)
      assert(byRank.map(_._6).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
        s"probe $pid scores not descending")
    }
  }

  test("graph_modularity: contributions bounded, censuses conserve the adjacency") {
    val rows = graft.queries.GraphQueries.graphModularity(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val q = rows.map(_._5).sum
    assert(q > -1.0 - 1e-6 && q < 1.0 + 1e-6, s"total modularity $q outside (-1, 1)")
    // degree masses sum to 2m = total directed edges; in-edges never exceed degree mass
    val twoM = rows.map(_._4).sum
    rows.foreach { case (c, n, in, d, _) =>
      assert(in <= d, s"community $c in-edges exceed degree mass")
      assert(n >= 1, s"community $c empty")
    }
    assert(twoM % 2 == 0, "directed edge count must be even (symmetric adjacency)")
  }

  test("ts_seasonal_strength: ratio and strength are complements, both finite") {
    val r = graft.queries.TimeSeries.tsSeasonalStrength(spark, sfDir).collect()
    assert(r.length == 1)
    val (n, ratio, strength) = (r(0).getLong(0), r(0).getDouble(1), r(0).getDouble(2))
    assert(n > 0)
    assert(ratio >= 0, "variance ratio negative")
    assert(math.abs((1.0 - ratio) - strength) <= 2e-6, "ratio/strength not complements")
    // a pure-noise weekly profile cannot INCREASE residual variance beyond
    // a rounding hair over the detrended variance plus the removed seasonal
    assert(ratio < 2.0, s"residual variance ratio $ratio implausible")
  }

  test("graph_degree_mixing: symmetric moments, counts replay from the degree table") {
    val r = graft.queries.GraphQueries.graphDegreeMixing(spark, sfDir).collect()
    assert(r.length == 1)
    val (n, sx, sy, sxy, sx2, sy2) = (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2),
      r(0).getLong(3), r(0).getLong(4), r(0).getLong(5))
    // the adjacency is symmetric, so x- and y-marginals coincide
    assert(sx == sy && sx2 == sy2, "symmetric adjacency must have equal marginals")
    // Cauchy-Schwarz on the co-moment (scaled by n)
    assert(BigInt(sxy) * BigInt(sxy) <= BigInt(sx2) * BigInt(sy2), "Cauchy-Schwarz violated")
    assert(n > 0 && sx >= n, "degrees are >= 1 on every edge endpoint")
  }

  test("ts_theil_sen: pair count matches the calendar, median inside the slope range") {
    val r = graft.queries.TimeSeries.tsTheilSen(spark, sfDir).collect()
    assert(r.length == 1)
    val (nPairs, mn, med, mx) =
      (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2), r(0).getLong(3))
    val days = graft.tables.Tables.t(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .select(to_date(col("ts"))).distinct().count()
    assert(nPairs == days * (days - 1) / 2, "pair count must be C(days, 2)")
    assert(mn <= med && med <= mx, "median outside slope range")
  }

  test("agg_largest_remainder: seats conserve the budget exactly, quota law holds") {
    val rows = graft.queries.Relational.aggLargestRemainder(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    assert(rows.map(_._6).sum == 10000L, "apportionment must conserve the budget")
    val nTotal = rows.map(_._2).sum
    rows.foreach { case (nm, nc, quota, rem, extra, seats) =>
      assert(quota == 10000L * nc / nTotal, s"$nm quota law")
      assert(rem == 10000L * nc % nTotal, s"$nm remainder law")
      assert(extra == 0L || extra == 1L, s"$nm extra out of {0,1}")
      assert(seats == quota + extra, s"$nm seats law")
    }
    // every nation granted an extra unit has remainder >= every nation denied one
    val granted = rows.filter(_._5 == 1).map(_._4)
    val denied = rows.filter(_._5 == 0).map(_._4)
    if (granted.nonEmpty && denied.nonEmpty)
      assert(granted.min >= denied.max, "largest-remainder order violated")
  }

  test("agg_histogram: buckets partition the orders, shares sum to ~1, bounds nest") {
    val rows = graft.queries.Relational.aggHistogram(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val nOrders = graft.tables.Tables.t(spark, sfDir, "orders").count()
    assert(rows.map(_._3).sum == nOrders, "buckets must partition the table")
    assert(math.abs(rows.map(_._6).sum - 1.0) <= 1e-4 * rows.length, "shares sum to 1")
    rows.foreach { case (b, lo, _, mn, mx, _) =>
      assert(b >= 0 && b <= 10, s"bucket $b out of range")
      assert(mn <= mx, s"bucket $b min > max")
      assert(mn >= lo * 100, s"bucket $b min below lower edge")
      if (b < 10) assert(mx < (lo + 50000L) * 100, s"bucket $b max over upper edge")
    }
  }

  test("geo_grid_dbscan: clusters are disjoint dense cells, points and density check out") {
    // sf0.001 has no dense cells (the point cloud thins with the table);
    // drive the structural check at sf0.01, the driver's own t2 scale
    val dir01 = "/root/testdata/sf0.01"
    val rows = graft.queries.GeoQueries.geoGridDbscan(spark, dir01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty, "no clusters at sf0.01 — density threshold broken?")
    rows.foreach { case (c, nCells, nPts, cxMin, cxMax, cyMin, cyMax) =>
      assert(nPts >= 4L * nCells, s"cluster $c under density floor")
      assert(cxMin <= cxMax && cyMin <= cyMax, s"cluster $c bbox inverted")
      // a connected component of k cells fits inside a bbox of area >= k
      assert((cxMax - cxMin + 1) * (cyMax - cyMin + 1) >= nCells, s"cluster $c bbox too small")
    }
    // cluster labels are distinct min-cell-ids; cells are disjoint, so
    // summed cells equal the dense-cell census
    import org.apache.spark.sql.functions._
    val dense = graft.tables.Tables.t(spark, dir01, "customer")
      .filter(col("c_custkey") < 3000)
      .select(col("c_custkey").cast("string").as("k"))
      .select(
        (conv(substring(md5(concat(col("k"), lit("x"))), 1, 15), 16, 10).cast("long") % 500L)
          .as("x"),
        (conv(substring(md5(concat(col("k"), lit("y"))), 1, 15), 16, 10).cast("long") % 500L)
          .as("y"))
      .groupBy(expr("x div 20").as("cx"), expr("y div 20").as("cy"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 4)
    assert(rows.map(_._2).sum == dense.count(), "clusters must partition the dense cells")
    assert(rows.map(_._3).sum == dense.agg(sum("n")).head().getLong(0),
      "cluster points must sum to dense-cell occupancy")
  }

  test("ts_interval_sweep: deltas conserve, peak bounds month-end, replay one month") {
    val rows = graft.queries.TimeSeries.tsIntervalSweep(spark, sfDir).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (m, peak, endOpen, nDays) =>
      assert(peak >= endOpen, s"$m: peak < month-end")
      assert(nDays >= 1, s"$m: empty month emitted")
    }
    // the sweep must end with every interval closed: last month-end open = 0
    assert(rows.last._3 == 0, "sweep does not return to zero after the last end day")
    // replay: peak over the whole series equals max open orders computed directly
    import org.apache.spark.sql.functions._
    val ends = graft.tables.Tables.t(spark, sfDir, "lineitem")
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(max(to_date(col("l_shipdate"))).as("e"))
    val spans = graft.tables.Tables.t(spark, sfDir, "orders")
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("s"))
      .join(ends, "o_orderkey").select("s", "e").collect()
      .map { r =>
        val s0 = r.getDate(0).toLocalDate
        val e0 = r.getDate(1).toLocalDate
        (s0, if (e0.isBefore(s0)) s0 else e0) // same clamp as the operator
      }
    val days = spans.map(_._1).distinct
    val bruteMax = days.map(d => spans.count(p => !d.isBefore(p._1) && !d.isAfter(p._2))).max
    assert(rows.map(_._2).max == bruteMax, "global peak diverges from brute-force sweep")
  }

  test("graph_pagerank_converged: stops at the pinned round with a true converged flag") {
    val rows = graft.queries.GraphQueries.graphPagerankConverged(spark, sfDir).collect()
    assert(rows.length == 25)
    // sf0.001's two-blocking graph converges to eps = 200 µ/node at
    // round 7 — a change in damping, eps, the batch machinery, or the
    // edge set moves this; the DuckDB oracle must be retuned in lockstep
    assert(rows.forall(_.getLong(3) == 7L), "convergence round moved off 7")
    assert(rows.forall(_.getBoolean(4)), "did not converge within the 24-round cap")
    // ranks genuinely vary (clique-union degeneracy would flatline them)
    assert(rows.map(_.getLong(2)).distinct.length > 10, "ranks are degenerate")
    // top list is sorted desc with the node-asc tiebreak
    val pairs = rows.map(r => (r.getLong(2), r.getLong(0)))
    assert(pairs.sameElements(pairs.sortBy(p => (-p._1, p._2))), "ordering broken")
  }
}
