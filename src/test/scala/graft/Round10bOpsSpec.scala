package graft

import org.apache.spark.sql.functions._
import graft.queries.{GraphQueries, MultimodalQueries, Quality, TimeSeries}
import graft.tables.Tables.t

/** Semantic pins for the round-10 second-wave operators (each is also
  * fully DuckDB-oracle-checked; these recompute the answers brute-force
  * in driver Scala from the raw sf0.001 tables, so the distributed
  * plans are checked against an independent sequential implementation,
  * not just against another SQL engine). */
class Round10bOpsSpec extends GraftSpec {

  test("dq_chi_square: margins reconcile and the statistic is the exact term sum") {
    val rows = Quality.dqChiSquare(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 6)
    val n = t(spark, sfDir, "lineitem").count()
    assert(rows.map(_.getLong(2)).sum == n, "cell counts must partition the table")
    val chi2 = rows.head.getLong(8)
    assert(rows.forall(_.getLong(8) == chi2), "chi2 is a single attached total")
    assert(rows.map(_.getLong(7)).sum == chi2, "chi2 == sum of per-cell terms")
    rows.foreach { r =>
      val (obs, nr, nc, tot, e, term) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
      assert(e == nr * nc / tot, "expected count is the floor product")
      val dev = obs - e
      assert(term == dev * dev / math.max(e, 1L), "term is the floored chi-square cell")
      val df = r.getLong(9)
      val crit = if (df == 1) 4L else if (df == 2) 6L else 8L
      assert(r.getBoolean(10) == (chi2 >= crit), "verdict must follow the critical region")
    }
    // per-flag marginal: the n_row column really is the row total
    rows.groupBy(_.getString(0)).foreach { case (_, cells) =>
      assert(cells.map(_.getLong(2)).sum == cells.head.getLong(3))
    }
  }

  test("dq_ks_test: supremum matches a brute-force driver recomputation") {
    val r = Quality.dqKsTest(spark, sfDir).collect().head
    val (na, nb, dNum, vAt) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val a = t(spark, sfDir, "customer")
      .select((col("c_acctbal").cast("decimal(12,2)") * 100).cast("long")).collect().map(_.getLong(0))
    val b = t(spark, sfDir, "supplier")
      .select((col("s_acctbal").cast("decimal(12,2)") * 100).cast("long")).collect().map(_.getLong(0))
    assert(na == a.length && nb == b.length)
    // exact sequential KS: evaluate |Fa - Fb| (integer numerator) at
    // every distinct sample value
    val vs = (a ++ b).distinct.sorted
    var best = -1L
    var bestV = Long.MaxValue
    vs.foreach { v =>
      val d = math.abs(a.count(_ <= v).toLong * nb - b.count(_ <= v).toLong * na)
      if (d > best || (d == best && v < bestV)) { best = d; bestV = v }
    }
    assert(dNum == best, s"D numerator: got $dNum, brute force $best")
    assert(vAt == bestV, s"argmax value: got $vAt, brute force $bestV")
    val dStat = r.getDouble(4)
    assert(math.abs(dStat - dNum.toDouble / (na * nb)) < 1e-6)
    val thresh = 1.358 * math.sqrt((na + nb).toDouble / (na.toDouble * nb))
    assert(r.getBoolean(5) == (dNum.toDouble / (na * nb) > thresh))
  }

  test("event_conversion_lag: deciles partition the converted users, lags ordered") {
    val rows = Quality.eventConversionLag(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    // decile ids dense from 1, user counts differ by at most one (ntile)
    assert(rows.map(_.getInt(0)).toSeq == (1 to rows.length))
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0, "lag cannot be negative (purchase at-or-after click)")
      assert(r.getLong(2) <= r.getLong(3), "min <= max within a decile")
      assert(r.getDouble(4) >= r.getLong(2).toDouble - 0.01 &&
        r.getDouble(4) <= r.getLong(3).toDouble + 0.01, "avg inside the decile range")
    }
    // deciles are ordered: each decile's max <= next decile's min
    rows.sliding(2).foreach {
      case Array(lo, hi) => assert(lo.getLong(3) <= hi.getLong(2))
      case _ =>
    }
    val share = rows.head.getDouble(5)
    assert(rows.forall(_.getDouble(5) == share) && share > 0 && share <= 1)
  }

  test("ts_bollinger_breakout: flags replay the exact integer band test sequentially") {
    val daily = t(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum((col("value").cast("decimal(12,2)") * 100).cast("long")).as("cents"))
      .orderBy("day")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
    val got = TimeSeries.tsBollingerBreakout(spark, sfDir).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getBoolean(3), r.getBoolean(4)))
    assert(got.length == math.max(0, daily.length - 20), "one row per full-window day")
    val byDay = daily.map(_._1).zipWithIndex.toMap
    got.foreach { case (day, x, mean, hi, lo) =>
      val i = byDay(day)
      val win = daily.slice(i - 20, i).map(_._2)
      assert(win.length == 20)
      val s = win.sum
      assert(x == daily(i)._2 && mean == s / 20)
      val q = win.map(c => BigInt(c) * BigInt(c)).sum
      val nxs = BigInt(20) * BigInt(x) - BigInt(s)
      val varNum = BigInt(20) * q - BigInt(s) * BigInt(s)
      assert(hi == (nxs > 0 && nxs * nxs > varNum * 4), s"hi flag at $day")
      assert(lo == (nxs < 0 && nxs * nxs > varNum * 4), s"lo flag at $day")
    }
  }

  test("mm_shard_pack: manifest equals the sequential concat-then-cut packing") {
    val docs = t(spark, sfDir, "documents")
      .filter(col("doc_id") < 2000)
      .select(col("doc_id"), col("source"),
        octet_length(col("text").cast("binary")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expect = docs.groupBy(_._2).toSeq.flatMap { case (src, items) =>
      var cum = 0L
      items.sortBy(_._1).map { case (id, _, nb) =>
        val shard = cum / 65536L
        cum += nb
        (src, shard, id, nb)
      }.groupBy(_._2).map { case (shard, xs) =>
        (src, shard, xs.length.toLong, xs.map(_._4).sum, xs.map(_._3).min, xs.map(_._3).max)
      }
    }.sortBy(x => (x._1, x._2))
    val got = MultimodalQueries.mmShardPack(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == expect, s"shard manifest:\ngot    ${got.toSeq}\nexpect $expect")
  }

  test("ts_dtw_band: equals an independent memoized-recursion DP") {
    val series = t(spark, sfDir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count_if(col("event_type") === "view").as("x"),
        count_if(col("event_type") === "purchase").as("y"))
      .orderBy("day").collect().map(r => (r.getLong(1), r.getLong(2)))
    val n = series.length
    val INF = Long.MaxValue / 4
    val memo = scala.collection.mutable.Map.empty[(Int, Int), Long]
    def dd(i: Int, j: Int): Long =
      if (i == 0 && j == 0) 0L
      else if (i < 1 || j < 1 || math.abs(i - j) > 3) INF
      else memo.getOrElseUpdate((i, j),
        math.abs(series(i - 1)._1 - series(j - 1)._2) +
          Seq(dd(i - 1, j), dd(i, j - 1), dd(i - 1, j - 1)).min)
    val l1 = series.map(p => math.abs(p._1 - p._2)).sum
    val got = TimeSeries.tsDtwBand(spark, sfDir).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) == ((n.toLong, l1, dd(n, n))),
      s"dtw: got $got, brute force (${n}, $l1, ${dd(n, n)})")
    assert(dd(n, n) <= l1, "DTW under a band that includes the diagonal is <= same-day L1")
  }

  test("graph_random_walk: walks replay a brute-force MessageDigest argmin") {
    val docs = t(spark, sfDir, "documents").filter(col("doc_id") < 1200)
      .select("doc_id", "source", "lang", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val blocks: Seq[(String, Long)] =
      docs.toSeq.map { case (id, s, _, n) => (s"s|$s|${n / 100}", id) } ++
        docs.toSeq.map { case (id, _, l, n) => (s"l|$l|${n / 50}", id) }
    val edges: Set[(Long, Long)] = blocks.groupBy(_._1).values.flatMap { g =>
      val ids = g.map(_._2).distinct
      for (u <- ids; v <- ids if u < v) yield (u, v)
    }.toSet
    val adj = edges.toSeq.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
      .map { case (k, xs) => k -> xs.map(_._2) }
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val visits = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    nodes.toSeq.filter(_ % 17 == 0).foreach { w =>
      var cur = w
      visits += ((w, w))
      for (t <- 1 to 4) {
        cur = adj(cur).minBy(v => (md5hex(s"$w:$t:$v"), v))
        visits += ((w, cur))
      }
    }
    val expect = visits.groupBy(_._2)
      .map { case (n, xs) => (n, xs.size.toLong, xs.map(_._1).distinct.size.toLong) }
      .toSeq.sortBy { case (n, c, _) => (-c, n) }.take(25)
    val got = GraphQueries.graphRandomWalk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect, s"walk census:\ngot    $got\nexpect $expect")
  }

  test("dq_mann_whitney: doubled midranks replay a brute-force rank computation") {
    val r = Quality.dqMannWhitney(spark, sfDir).collect().head
    val (na, nb, r2a, u2a, u2b) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val a = t(spark, sfDir, "customer")
      .select((col("c_acctbal").cast("decimal(12,2)") * 100).cast("long")).collect().map(_.getLong(0))
    val b = t(spark, sfDir, "supplier")
      .select((col("s_acctbal").cast("decimal(12,2)") * 100).cast("long")).collect().map(_.getLong(0))
    assert(na == a.length && nb == b.length)
    // brute-force doubled midranks over the pooled sorted sample
    val all = (a ++ b).sorted
    def mr2(v: Long) = 2L * all.count(_ < v) + all.count(_ == v) + 1
    val r2aBrute = a.map(mr2).sum
    assert(r2a == r2aBrute, s"rank sum x2: got $r2a, brute force $r2aBrute")
    assert(u2a == r2a - na * (na + 1))
    assert(u2b == 2 * na * nb - u2a)
    // U1 + U2 = n1*n2 is the Mann-Whitney identity (x2 here)
    assert(u2a + u2b == 2 * na * nb)
    val diff = BigInt(u2a) - BigInt(na) * nb
    assert(r.getBoolean(5) ==
      (diff * diff * 3 * 10000 > BigInt(38416) * na * nb * (na + nb + 1)))
  }

  test("ts_lead_lag: numerators replay a brute-force shifted-pair computation") {
    val series = t(spark, sfDir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count_if(col("event_type") === "view").as("x"),
        count_if(col("event_type") === "purchase").as("y"))
      .orderBy("day").collect().map(r => (r.getLong(1), r.getLong(2)))
    val n = series.length
    // internal arithmetic is DECIMAL(38,0) (no silent wrap) but the
    // OUTPUT numerators are BIGINT since round 12 — ANSI raises if the
    // narrowing cast ever overflows, and the driver hash needs longs
    val got = TimeSeries.tsLeadLag(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), BigInt(r.getLong(2)).bigInteger,
        BigInt(r.getLong(3)).bigInteger, BigInt(r.getLong(4)).bigInteger))
    assert(got.length == 15)
    got.foreach { case (lag, np, sxy, sxx, syy) =>
      val pairs = (1 to n).flatMap { i =>
        val j = i + lag
        if (j >= 1 && j <= n) Some((BigInt(series(i - 1)._1), BigInt(series(j - 1)._2))) else None
      }
      val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      assert(np == pairs.length)
      assert(BigInt(sxy) == np * pairs.map(p => p._1 * p._2).sum - sx * sy, s"sxy at lag $lag")
      assert(BigInt(sxx) == np * pairs.map(p => p._1 * p._1).sum - sx * sx, s"sxx at lag $lag")
      assert(BigInt(syy) == np * pairs.map(p => p._2 * p._2).sum - sy * sy, s"syy at lag $lag")
      assert(BigInt(sxx) >= 0 && BigInt(syy) >= 0, "variance numerators are non-negative")
    }
  }

  test("event_ab_test: counts and verdict replay a brute-force z-square computation") {
    val r = Quality.eventAbTest(spark, sfDir).collect().head
    val (na, ca, nb, cb) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // brute-force the census from raw events
    val ev = t(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getTimestamp(2).getTime))
    val firstView = ev.filter(_._2 == "view").groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(_._3).min }
    val conv = firstView.keySet.filter(u =>
      ev.exists(e => e._1 == u && e._2 == "purchase" && e._3 >= firstView(u)))
    def cnt(variant: Long) = (
      firstView.keySet.count(_ % 2 == variant).toLong,
      conv.count(_ % 2 == variant).toLong)
    assert((na, ca) == cnt(0) && (nb, cb) == cnt(1),
      s"census: got ($na,$ca,$nb,$cb), brute force ${cnt(0)} ${cnt(1)}")
    assert(math.abs(r.getDouble(4) - ca.toDouble / na) < 2e-6)
    assert(math.abs(r.getDouble(5) - cb.toDouble / nb) < 2e-6)
    val (diff, c, n) = (BigInt(ca) * nb - BigInt(cb) * na, BigInt(ca + cb), BigInt(na + nb))
    assert(r.getBoolean(6) ==
      (diff * diff * n * 10000 > BigInt(38416) * na * nb * c * (n - c)))
  }

  test("graph_hits and graph_landmark_distance: match a sequential graph recomputation") {
    // brute-force the two-blocking similarity graph from raw documents
    val docs = t(spark, sfDir, "documents").filter(col("doc_id") < 1200)
      .select("doc_id", "source", "lang", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val blocks: Seq[(String, Long)] =
      docs.toSeq.map { case (id, s, _, n) => (s"s|$s|${n / 100}", id) } ++
        docs.toSeq.map { case (id, _, l, n) => (s"l|$l|${n / 50}", id) }
    val edges: Set[(Long, Long)] = blocks.groupBy(_._1).values.flatMap { g =>
      val ids = g.map(_._2).distinct
      for (u <- ids; v <- ids if u < v) yield (u, v)
    }.toSet
    // HITS: h0 = 1, four integer half-steps
    def stepTo(dst: (Long, Long) => Long, src: Map[Long, Long]): Map[Long, Long] =
      edges.toSeq.flatMap { case (u, v) =>
        val key = dst(u, v); val from = if (key == u) v else u
        src.get(from).map(key -> _)
      }.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    val a1 = edges.toSeq.groupBy(_._2).map { case (v, xs) => v -> xs.size.toLong }
    val h1 = stepTo((u, _) => u, a1)
    val a2 = stepTo((_, v) => v, h1)
    val h2 = stepTo((u, _) => u, a2)
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val expHits = nodes.toSeq
      .map(n => (n, a2.getOrElse(n, 0L), h2.getOrElse(n, 0L)))
      .sortBy { case (n, a, h) => (-a, -h, n) }.take(25)
    val gotHits = GraphQueries.graphHits(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(gotHits == expHits, s"hits:\ngot    $gotHits\nexpect $expHits")

    // landmark BFS out to 4 hops over the symmetric adjacency
    val adj = edges.toSeq.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
      .map { case (k, xs) => k -> xs.map(_._2) }
    val lms = nodes.filter(_ % 151 == 0)
    val dist = scala.collection.mutable.Map.empty[(Long, Long), Long]
    lms.foreach { lm =>
      var frontier = Set(lm)
      dist((lm, lm)) = 0L
      for (d <- 1L to 4L) {
        frontier = frontier.flatMap(adj.getOrElse(_, Nil))
          .filter(n => !dist.contains((n, lm)))
        frontier.foreach(n => dist((n, lm)) = d)
      }
    }
    val expLd = dist.toSeq.filter(_._2 > 0)
      .groupBy(_._1._1)
      .map { case (n, xs) => (n, xs.size.toLong, xs.map(x => 1000000L / x._2).sum) }
      .toSeq.sortBy { case (n, _, c) => (-c, n) }.take(25)
    val gotLd = GraphQueries.graphLandmarkDistance(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(gotLd == expLd, s"landmark closeness:\ngot    $gotLd\nexpect $expLd")
  }
}
