package graft

import org.apache.spark.sql.functions._
import graft.queries.{GraphQueries, Quality, Relational, TimeSeries}

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
}
