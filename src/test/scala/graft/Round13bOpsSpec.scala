package graft

import org.apache.spark.sql.functions._
import graft.queries.{GraphQueries, LlmExtra, MultimodalQueries, Quality, TimeSeries}
import graft.tables.Tables.t

/** Semantic pins for the round-13 operator wave (all nine are fully
  * DuckDB-oracle-checked; these replays assert what a hash compare
  * can't — that the distributed plans compute the REFERENCE algorithm,
  * node-at-a-time, in plain Scala). Every replay rebuilds its inputs
  * independently from the parquet, never from engine intermediates.
  */
class Round13bOpsSpec extends GraftSpec {

  // ---------------------------------------------------------------- graphs

  /** Two-blocking similarity graph (doc_id < 1200): canonical u<v edge
    * set + symmetric adjacency — independent rebuild, the suite
    * convention (each spec owns its replay). */
  private def simGraph(): (Set[(Long, Long)], Map[Long, Seq[Long]]) = {
    val docs = t(spark, sfDir, "documents").filter(col("doc_id") < 1200)
      .select("doc_id", "source", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val blocks = docs.flatMap { case (id, src, lang, nc) =>
      Seq((s"s|$src|${nc / 100}", id), (s"l|$lang|${nc / 50}", id))
    }
    val edges = blocks.groupBy(_._1).values.flatMap { members =>
      val ids = members.map(_._2).toSeq
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    (edges, adj)
  }

  test("graph_clustering_coeff replays node-at-a-time") {
    val (edges, adj) = simGraph()
    val rows = adj.toSeq.collect { case (n, nbrs) if nbrs.size >= 2 =>
      val d = nbrs.size.toLong
      val tri = (for (a <- nbrs; b <- nbrs if a < b && edges((a, b))) yield 1).size.toLong
      (n, d, tri, tri * 2000000L / (d * (d - 1)))
    }
    val expect = rows.sortBy { case (n, d, _, cc) => (-cc, -d, n) }.take(25)
    val got = GraphQueries.graphClusteringCoeff(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect)
  }

  test("graph_adamic_adar replays the centered-wedge sum") {
    val (edges, adj) = simGraph()
    val deg = adj.view.mapValues(_.size.toLong).toMap
    val acc = scala.collection.mutable.HashMap.empty[(Long, Long), (Long, Long)]
    for ((w, nbrs) <- adj; x <- nbrs; z <- nbrs if x < z && !edges((x, z))) {
      val term = math.floor(1000000.0 / math.log(deg(w).toDouble)).toLong
      val (c, s) = acc.getOrElse((x, z), (0L, 0L))
      acc((x, z)) = (c + 1, s + term)
    }
    val expect = acc.toSeq.map { case ((x, z), (c, s)) => (x, z, c, s) }
      .sortBy { case (x, z, _, s) => (-s, x, z) }.take(25)
    val got = GraphQueries.graphAdamicAdar(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect)
  }

  test("graph_ppr replays 3 integer rounds on the single-blocking graph") {
    val docs = t(spark, sfDir, "documents").filter(col("doc_id") < 1200)
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2) / 100))
    val nodes = docs.map(_._1).toSeq
    val edges = docs.groupBy(d => (d._2, d._3)).values.flatMap { blk =>
      val ids = blk.map(_._1).toSeq
      for (a <- ids; b <- ids if a != b) yield (a, b)
    }.toSeq
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    def seed(n: Long) = n % 101 == 0
    var r: Map[Long, Long] = nodes.map(n => n -> (if (seed(n)) 1000000L else 0L)).toMap
    for (_ <- 1 to 3) {
      val sc = scala.collection.mutable.HashMap.empty[Long, Long].withDefaultValue(0L)
      for ((u, v) <- edges) sc(v) += r(u) / deg(u)
      r = nodes.map(n => n -> ((if (seed(n)) 150000L else 0L) + 850L * sc(n) / 1000L)).toMap
    }
    val expect = nodes.filter(n => r(n) > 0)
      .map(n => (n, seed(n), deg.getOrElse(n, 0L), r(n)))
      .sortBy { case (n, _, _, rr) => (-rr, n) }.take(25)
    val got = GraphQueries.graphPersonalizedPagerank(spark, sfDir).collect()
      .map(x => (x.getLong(0), x.getBoolean(1), x.getLong(2), x.getLong(3))).toSeq
    assert(got == expect)
    // every positive-mass node sits within 3 hops of a seed by construction
    assert(expect.forall(_._4 > 0))
  }

  // ------------------------------------------------------------------- ANN

  test("llm_sim_pq_topk replays codebook training + ADC end to end") {
    val embs = t(spark, sfDir, "embeddings").select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val q: Map[Long, Array[Long]] =
      embs.view.mapValues(_.map(x => math.floor(x.toDouble * 10000).toLong)).toMap
    def sub(v: Array[Long], s: Int): Array[Long] = v.slice(s * 16, s * 16 + 16)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var cent: Map[(Int, Long), Array[Long]] =
      (for (s <- 0 until 4; c <- 0L until 8L if q.contains(c))
        yield (s, c) -> sub(q(c), s)).toMap
    def assign(ct: Map[(Int, Long), Array[Long]]): Map[(Long, Int), Long] =
      (for (id <- q.keys.toSeq; s <- 0 until 4) yield {
        val best = ct.collect { case ((ss, c), cv) if ss == s => (d2(sub(q(id), s), cv), c) }
          .toSeq.sorted.head._2
        (id, s) -> best
      }).toMap
    for (_ <- 1 to 2) {
      val a = assign(cent)
      cent = a.toSeq.groupBy { case ((_, s), c) => (s, c) }.map { case ((s, c), members) =>
        val vecs = members.map { case ((id, _), _) => sub(q(id), s) }
        val cq = Array.tabulate(16) { p =>
          math.floor(vecs.map(_(p)).sum.toDouble / vecs.size).toLong
        }
        (s, c) -> cq
      }
    }
    val codes = assign(cent)
    val probes = q.keys.filter(_ < 10).toSeq.sorted
    val expect = probes.flatMap { pid =>
      val dt = cent.map { case ((s, c), cv) => (s, c) -> d2(sub(q(pid), s), cv) }
      q.keys.filter(_ != pid).toSeq
        .map(nid => (nid, (0 until 4).map(s => dt((s, codes((nid, s))))).sum))
        .sortBy { case (nid, d) => (d, nid) }.take(5).zipWithIndex
        .map { case ((nid, d), i) => (pid, nid, d, (i + 1).toLong) }
    }
    val got = LlmExtra.llmSimPqTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect)
  }

  test("llm_minhash_band_tune: pigeonhole recall and candidate monotonicity") {
    val rows = LlmExtra.llmMinhashBandTune(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(6))) // (rows_per_band, n_candidates, n_hits, n_truth, band_recall)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L))
    // est-Jaccard ≥ 1/2 ⇒ ≥32/64 components agree ⇒ single-row bands
    // MUST catch the pair: recall at r=1 is exactly 1 when truth is
    // non-empty (and the ratio contract reports 0 on an empty truth set)
    val r1 = rows.find(_._1 == 1L).get
    assert(if (r1._4 > 0) r1._5 == 1.0 else r1._5 == 0.0)
    // wider rows can only shed candidates (a matching band needs every
    // component in it to match), and hits never exceed candidates
    assert(rows.sortBy(_._1).map(_._2).sliding(2).forall(p => p.head >= p.last))
    assert(rows.forall(r => r._3 <= r._2 && r._3 <= r._4))
  }

  // -------------------------------------------------------------- LLM text

  test("llm_bigram_lm replays the smoothed NLL sums per language") {
    val docs = t(spark, sfDir, "documents").filter(col("doc_id") % 10 <= 1)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def bigrams(text: String): Seq[(String, String)] = {
      val w = text.split(" ", -1)
      if (w.length < 2) Seq.empty else w.dropRight(1).zip(w.drop(1)).toSeq
    }
    val train = docs.filter(_._1 % 10 == 1).flatMap(d => bigrams(d._3))
    val c2 = train.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = train.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val vsz = (train.map(_._1) ++ train.map(_._2)).distinct.size.toLong
    val perLang = docs.filter(_._1 % 10 == 0).flatMap { case (id, lang, text) =>
      bigrams(text).map { bg =>
        val nll = math.floor(1000000.0 *
          (math.log((c1.getOrElse(bg._1, 0L) + vsz).toDouble) -
           math.log((c2.getOrElse(bg, 0L) + 1L).toDouble))).toLong
        (lang, id, nll)
      }
    }
    val expect = perLang.groupBy(_._1).toSeq.map { case (lang, xs) =>
      val sum = xs.map(_._3).sum
      (lang, xs.map(_._2).distinct.size.toLong, xs.size.toLong, sum, sum / xs.size)
    }.sortBy(_._1)
    val got = LlmExtra.llmBigramLm(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expect)
  }

  // ------------------------------------------------------------ multimodal

  test("mm_aspect_bucket replays assignment, fit and pad census") {
    val buckets = Seq((0L, 512L, 512L), (1L, 576L, 448L), (2L, 448L, 576L),
      (3L, 640L, 384L), (4L, 384L, 640L))
    val docs = t(spark, sfDir, "documents")
      .filter(col("doc_id") < 2000 && col("doc_id") % 3 === 0)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val per = docs.map { case (id, text) =>
      val m = graft.multimodal.Media.decodeStub(graft.multimodal.MediaRow(
        id, "image", text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      val (w, h) = (m.width.toLong, m.height.toLong)
      val (bi, bw, bh) = buckets.minBy { case (bi, bw, bh) =>
        (math.abs(w * bh * 1000000L / (h * bw) - 1000000L), bi)
      }
      val (ow, oh) =
        if (w * bh >= h * bw) (math.min(w, bw), h * math.min(w, bw) / w)
        else (w * math.min(h, bh) / h, math.min(h, bh))
      assert(ow <= bw && oh <= bh, s"fit must stay inside the canvas: $id")
      (bi, bw, bh, bw * bh - ow * oh)
    }
    val expect = per.groupBy(p => (p._1, p._2, p._3)).toSeq.map { case ((bi, bw, bh), xs) =>
      val pad = xs.map(_._4).sum
      (bi, bw, bh, xs.size.toLong, pad, pad / xs.size, (xs.size + 31L) / 32L)
    }.sortBy(_._1)
    val got = MultimodalQueries.mmAspectBucket(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expect)
    assert(got.map(_._4).sum == docs.length.toLong)
  }

  // ----------------------------------------------------------------- DQ/TS

  test("ts_robust_zscore replays median/MAD from the engine's cents") {
    val e = t(spark, sfDir, "events")
      .select(col("event_id"), col("event_type"),
        (graft.queries.Num.money(col("value")) * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def discMedian(xs: Seq[Long]): Long = {
      val s = xs.sorted; s((s.size - 1) / 2) // min x with 2·cumcount ≥ n
    }
    val med = e.groupBy(_._2).view.mapValues(xs => discMedian(xs.map(_._3).toSeq)).toMap
    val mad = e.groupBy(_._2).view.mapValues { xs =>
      discMedian(xs.map(x => math.abs(x._3 - med(x._2))).toSeq)
    }.toMap
    val expect = e.map { case (id, et, c) =>
      val dev = (c - med(et)) * 1000000L / math.max(mad(et), 1L)
      (id, et, c, med(et), mad(et), dev)
    }.sortBy { case (id, _, _, _, _, d) => (-math.abs(d), id) }.take(25).toSeq
    val got = TimeSeries.tsRobustZscore(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expect)
  }

  test("dq_entropy_profile replays the quantized entropy arithmetic") {
    def census(tbl: String, c: String): (String, Seq[Long]) =
      s"$tbl.$c" -> t(spark, sfDir, tbl).groupBy(col(c)).count()
        .collect().map(_.getLong(1)).toSeq
    val cens = Seq(census("events", "event_type"), census("documents", "lang"),
      census("documents", "source"), census("customer", "c_mktsegment"))
    val expect = cens.map { case (name, cs) =>
      val n = cs.sum
      val st = cs.map(c => math.floor(c.toDouble * math.log(c.toDouble) * 1000000.0).toLong).sum
      val ent = math.floor(math.log(n.toDouble) * 1000000.0).toLong - st / n
      val maxEnt = math.floor(math.log(cs.size.toDouble) * 1000000.0).toLong
      (name, n, cs.size.toLong, cs.max, ent, maxEnt)
    }.sortBy(_._1)
    val got = Quality.dqEntropyProfile(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(5), r.getLong(6))).toSeq
    assert(got == expect)
    // entropy is nonnegative and never exceeds its ln(k) ceiling
    assert(got.forall(r => r._5 >= 0 && r._5 <= r._6 + 1))
  }
}
