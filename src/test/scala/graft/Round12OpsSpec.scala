package graft

import org.apache.spark.sql.functions._
import graft.queries.{GraphQueries, LlmExtra}
import graft.tables.Tables.t

/** Semantic pins for the round-12 operators (both fully DuckDB-
  * oracle-checked; these assert what a hash compare can't): the Louvain
  * local-move gain argmax replayed SEQUENTIALLY against an independent
  * pure-Scala graph/LPA/gain computation, and corpus fertility replayed
  * from an independent sequential BPE trainer + encoder. */
class Round12OpsSpec extends GraftSpec {

  /** Pure-Scala rebuild of the similarity graph + 3 LPA rounds the graph
    * family shares (two-blocking construction over doc_id < 1200). */
  private def graphAndLabels(): (Map[Long, Seq[Long]], Map[Long, Long]) = {
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
    var lab: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      lab = adj.map { case (n, nbrs) =>
        val counts = nbrs.groupBy(lab).view.mapValues(_.size.toLong).toSeq
        // majority label, count desc then label asc — the engine's window
        n -> counts.minBy { case (l, c) => (-c, l) }._1
      }
    }
    (adj, lab)
  }

  test("graph_louvain_one_level: gain argmax replayed sequentially per node") {
    val (adj, lab) = graphAndLabels()
    val deg = adj.view.mapValues(_.size.toLong).toMap
    val twom = deg.values.sum
    val tot = lab.toSeq.groupBy(_._2).view
      .mapValues(_.map { case (n, _) => deg(n) }.sum).toMap
    // sequential replay: walk every node in order, compute each
    // neighboring community's scaled gain one at a time, track the
    // argmax by hand with the (gain desc, community asc) tie-break
    val expected = adj.keys.toSeq.sorted.flatMap { n =>
      val cur = lab(n)
      val kic = adj(n).groupBy(lab).view.mapValues(_.size.toLong).toMap
      val kicur = kic.getOrElse(cur, 0L)
      var best: Option[(Long, Long, Long)] = None // (c, k_ic, gain)
      for (c <- kic.keys.toSeq.sorted if c != cur) {
        val gain = twom * (kic(c) - kicur) - deg(n) * (tot(c) - tot(cur) + deg(n))
        if (best.forall { case (bc, _, bg) => gain > bg || (gain == bg && c < bc) })
          best = Some((c, kic(c), gain))
      }
      best.filter(_._3 > 0).map { case (c, kc, g) =>
        (n, cur, c, deg(n), kicur, kc, g)
      }
    }
    val got = GraphQueries.graphLouvainOneLevel(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got.nonEmpty, "no node had a positive-gain move (vacuous fixture)")
    assert(got == expected)
    // every reported move is strictly quality-improving and leaves the
    // node's own community for a genuinely adjacent one
    got.foreach { case (n, from, to, _, _, kTo, gain) =>
      assert(gain > 0 && from != to && kTo > 0, s"node $n move is not a real improvement")
      assert(adj(n).exists(v => lab(v) == to), s"node $n target community not adjacent")
    }
  }

  test("graph_louvain_apply: both Q numerators replay the sequential rebuild") {
    val (adj, lab) = graphAndLabels()
    val deg = adj.view.mapValues(_.size.toLong).toMap
    val twom = deg.values.sum
    val tot = lab.toSeq.groupBy(_._2).view
      .mapValues(_.map { case (n, _) => deg(n) }.sum).toMap
    // the same sequential argmax as the one_level spec
    val moves = adj.keys.toSeq.sorted.flatMap { n =>
      val cur = lab(n)
      val kic = adj(n).groupBy(lab).view.mapValues(_.size.toLong).toMap
      val kicur = kic.getOrElse(cur, 0L)
      val cands = kic.keys.toSeq.sorted.filter(_ != cur).map { c =>
        (c, twom * (kic(c) - kicur) - deg(n) * (tot(c) - tot(cur) + deg(n)))
      }
      cands.sortBy { case (c, g) => (-g, c) }.headOption
        .filter(_._2 > 0).map { case (c, _) => n -> c }
    }.toMap
    def qNum(labels: Map[Long, Long]): Long = {
      // directed-edge census per community: degree mass + within-edges
      val byC = adj.toSeq.flatMap { case (u, nbrs) => nbrs.map(v => (labels(u), labels(v))) }
        .groupBy(_._1)
      val degSum = byC.view.mapValues(_.size.toLong).toMap
      val inC = byC.view.mapValues(_.count { case (lu, lv) => lu == lv }.toLong).toMap
      val m2 = degSum.values.sum
      m2 * inC.values.sum - degSum.values.map(d => d * d).sum
    }
    val newLab = lab.map { case (n, l) => n -> moves.getOrElse(n, l) }
    val r = GraphQueries.graphLouvainApply(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(0) == moves.size, "n_moved")
    assert(row.getLong(1) == twom, "twom")
    assert(row.getLong(2) == qNum(lab), "q_before_num")
    assert(row.getLong(3) == qNum(newLab), "q_after_num")
    assert(row.getBoolean(4) == (qNum(newLab) > qNum(lab)), "improved verdict")
  }

  test("llm_sim_recall: n_hit equals the collected parents' set intersection") {
    val truth = graft.queries.Llm.llmSimCosineTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val approx = LlmExtra.llmSimIvfTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val got = LlmExtra.llmSimRecall(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq == truth.keys.toSeq.sorted, "one row per probe")
    got.foreach { case (pid, nTrue, nHit, recall) =>
      assert(nTrue == truth(pid).size.toLong, s"probe $pid n_true")
      val inter = truth(pid) intersect approx.getOrElse(pid, Set.empty)
      assert(nHit == inter.size.toLong, s"probe $pid n_hit vs collected intersection")
      assert(recall >= 0.0 && recall <= 1.0)
      // replay the half-up ratio
      val s = 10000L
      assert(recall == ((nHit * s * 2 + nTrue) / (nTrue * 2)).toDouble / s)
    }
  }

  /** Sequential BPE: census → 32 argmax merges → greedy left-to-right
    * application, all in plain Scala collections. */
  private def greedyMerge(toks: Vector[String], x: String, y: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == x && toks(i + 1) == y) {
        out += (x + y); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.result()
  }

  test("llm_bpe_corpus_fertility: per-lang sums replay a sequential trainer + encoder") {
    // training stream: p_name tokens ∪ documents (doc_id < 4000) tokens
    val trainWords =
      t(spark, sfDir, "part").select(col("p_name")).collect().map(_.getString(0))
        .flatMap(_.split(" ")) ++
      t(spark, sfDir, "documents").filter(col("doc_id") < 4000)
        .select(col("text")).collect().map(_.getString(0)).flatMap(_.split(" "))
    var vocab: Map[String, (Long, Vector[String])] =
      trainWords.filter(_.nonEmpty).groupBy(identity).map { case (w, ws) =>
        w -> (ws.length.toLong, w.map(_.toString).toVector)
      }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    for (_ <- 1 to 32) {
      val pairs = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.values.foreach { case (wn, toks) =>
        toks.sliding(2).foreach {
          case Vector(a, b) => pairs((a, b)) = pairs.getOrElse((a, b), 0L) + wn
          case _ => ()
        }
      }
      if (pairs.nonEmpty) {
        val bestKey: (String, String) =
          pairs.toSeq.minBy { kv => (-kv._2, s"${kv._1._1} ${kv._1._2}") }._1
        val (x, y) = bestKey
        merges += ((x, y))
        vocab = vocab.map { case (w, (wn, toks)) => w -> (wn, greedyMerge(toks, x, y)) }
      }
    }
    // corpus-side: encode every (lang, word) occurrence under the merges
    val langWords = t(spark, sfDir, "documents").select("lang", "text").collect()
      .flatMap(r => r.getString(1).split(" ").filter(_.nonEmpty).map(w => (r.getString(0), w)))
    val nToks = langWords.map(_._2).distinct.map { w =>
      var toks = w.map(_.toString).toVector
      merges.foreach { case (x, y) => toks = greedyMerge(toks, x, y) }
      w -> toks.length.toLong
    }.toMap
    def halfUp(num: Long, den: Long, p: Int): Double = {
      val s = math.pow(10, p).toLong
      if (den == 0) 0.0 else ((num * s * 2 + den) / (den * 2)).toDouble / math.pow(10, p)
    }
    val expected = langWords.groupBy(_._1).toSeq.map { case (lang, ws) =>
      val nWords = ws.length.toLong
      val nTokens = ws.map { case (_, w) => nToks(w) }.sum
      val nChars = ws.map { case (_, w) => w.length.toLong }.sum
      (lang, nWords, nTokens, nChars,
        halfUp(nTokens, nWords, 4), halfUp(nChars, nTokens, 4))
    }.sortBy(_._1)
    val got = LlmExtra.llmBpeCorpusFertility(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == expected)
    // fertility must exceed 1 somewhere only if some word splits into
    // multiple tokens — and can never be below 1
    got.foreach { case (lang, _, nTokens, _, fert, _) =>
      assert(fert >= 1.0, s"$lang fertility below 1 ($fert) — a word encoded to 0 tokens?")
      assert(nTokens > 0)
    }
  }
}
