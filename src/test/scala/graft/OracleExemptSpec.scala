package graft

import org.apache.spark.sql.functions._
import graft.queries.{Llm, LlmExtra, MultimodalQueries, Relational, Scalars, UdxQueries}
import graft.llm.{Lsh, MinHash, SimHash, Winnowing}
import graft.multimodal.{Media, MediaRow}

/** Coverage for the oracle-exempt §2.B rows (SURVEY §5.2 layer 2): each
  * one gets an independent correctness check since the DuckDB compare
  * can't express it. */
class OracleExemptSpec extends GraftSpec {

  // Since round 7 the four sketch queries grade through VERDICT columns
  // (exact counts + boolean accuracy contracts the DuckDB oracle mirrors
  // as literal TRUE). These tests keep the TIGHTER direct checks on the
  // raw estimates — the graded verdicts use conservative bounds (10% /
  // eps·N) so they can't flake; these pin 5%-grade accuracy.

  test("agg_approx_distinct verdicts all true; raw estimates within 5% of exact") {
    val verdicts = Relational.aggApproxDistinct(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(verdicts.nonEmpty && verdicts.forall(_._3), s"verdict false: ${verdicts.mkString(",")}")
    val both = graft.tables.Tables.t(spark, sfDir, "orders")
      .groupBy("o_orderpriority")
      .agg(approx_count_distinct(col("o_custkey"), 0.02).as("apx"),
        countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    for ((k, a, e) <- both)
      assert(math.abs(a - e).toDouble / e <= 0.05, s"$k: approx $a vs exact $e")
  }

  test("agg_approx_percentile verdicts all true; raw elements of near-correct rank") {
    val verdicts = Relational.aggApproxPercentile(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getBoolean(2), r.getBoolean(3)))
    assert(verdicts.nonEmpty && verdicts.forall(v => v._2 && v._3), s"got ${verdicts.mkString(",")}")
    // approx_percentile is element-valued (no interpolation), so compare
    // by RANK, not by value: the returned element's rank among the
    // segment's values must sit within a small band of the target rank.
    val approx = graft.tables.Tables.t(spark, sfDir, "customer")
      .groupBy("c_mktsegment")
      .agg(approx_percentile(col("c_acctbal"), lit(0.5), lit(10000)).as("m"),
        approx_percentile(col("c_acctbal"), lit(0.9), lit(10000)).as("p"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val bySeg = graft.tables.Tables.t(spark, sfDir, "customer")
      .select("c_mktsegment", "c_acctbal").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(approx.keySet == bySeg.keySet)
    for ((seg, (apxMed, apxP90)) <- approx; vals = bySeg(seg); n = vals.length) {
      def rankOf(v: Double) = vals.count(_ <= v + 5e-5)
      assert(math.abs(rankOf(apxMed) - 0.5 * n) <= 2.0, s"$seg: median rank ${rankOf(apxMed)} of $n")
      assert(math.abs(rankOf(apxP90) - 0.9 * n) <= 2.0, s"$seg: p90 rank ${rankOf(apxP90)} of $n")
      assert(apxP90 >= apxMed, s"$seg: p90 $apxP90 below median $apxMed")
    }
  }

  test("agg_hll_union verdicts all true; raw estimates within 5%; union row consistent") {
    val graded = Relational.aggHllUnion(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(3)))
    assert(graded.length == 6 && graded.forall(_._3), s"verdict false: ${graded.mkString(",")}")
    val sk = graft.tables.Tables.t(spark, sfDir, "orders")
      .groupBy("o_orderpriority")
      .agg(hll_sketch_agg(col("o_custkey"), lit(14)).as("sk"))
    val per = sk.select(col("o_orderpriority"), hll_sketch_estimate(col("sk")).as("apx"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val unionEst = sk.agg(hll_sketch_estimate(hll_union_agg(col("sk")))).head.getLong(0).toDouble
    val exactPer = graft.tables.Tables.t(spark, sfDir, "orders")
      .groupBy("o_orderpriority").agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = graft.tables.Tables.t(spark, sfDir, "orders")
      .agg(countDistinct(col("o_custkey"))).head.getLong(0)
    for ((k, e) <- exactPer)
      assert(math.abs(per(k) - e) / e <= 0.05, s"$k: hll ${per(k)} vs exact $e")
    // the UNION estimate must track the distinct count of the union,
    // which is far below the sum of the per-group counts (heavy overlap)
    assert(math.abs(unionEst - exactAll) / exactAll <= 0.05,
      s"union: hll $unionEst vs exact $exactAll (sum of groups ${exactPer.values.sum})")
    assert(unionEst < exactPer.values.sum * 0.9)
  }

  test("fn_map per-user map lookups equal plain pivoted counts") {
    val got = Scalars.fnMap(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val ev = graft.tables.Tables.t(spark, sfDir, "events")
    val expected = ev.groupBy("user_id")
      .agg(
        coalesce(sum(when(col("event_type") === "click", 1L)), lit(0L)).as("clicks"),
        coalesce(sum(when(col("event_type") === "purchase", 1L)), lit(0L)).as("purchases"),
        countDistinct(col("event_type")).as("n_types"))
      .orderBy("user_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
  }

  test("udtf_ngrams generator matches a plain Scala reference count") {
    val got = UdxQueries.udtfNgrams(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val names = graft.tables.Tables.t(spark, sfDir, "part")
      .select("p_name").collect().map(_.getString(0))
    val ref = names.flatMap(n => if (n.length < 3) Nil else (0 to n.length - 3).map(i => n.substring(i, i + 3)))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (g, c) => (-c, g) }.take(20)
    assert(got == ref)
  }

  test("minhash estimated Jaccard tracks exact Jaccard on real docs") {
    val docs = graft.tables.Tables.t(spark, sfDir, "documents")
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = LlmExtra.llmDedupNgramJaccard(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.nonEmpty)
    // On every exact-Jaccard pair, the 64-perm estimate is within 0.25
    // (binomial σ = sqrt(J(1−J)/64) ≈ 0.06; 4σ bound).
    pairs.take(200).foreach { case (a, b, jac) =>
      val est = MinHash.estJaccard(MinHash.signature(docs(a)), MinHash.signature(docs(b)))
      assert(math.abs(est - jac) <= 0.25, s"pair ($a,$b): exact $jac est $est")
    }
  }

  test("llm_dedup_minhash output pairs have nontrivial exact Jaccard") {
    val docs = graft.tables.Tables.t(spark, sfDir, "documents")
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = Llm.llmDedupMinhash(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.nonEmpty)
    out.foreach { case (a, b, est) =>
      val exact = MinHash.exactJaccard(docs(a), docs(b))
      assert(math.abs(est - exact) <= 0.25, s"($a,$b) est=$est exact=$exact")
    }
  }

  test("simhash: identical docs collide, banding finds all close pairs") {
    val s1 = SimHash.simhash64("the quick brown fox jumps over the lazy dog")
    val s2 = SimHash.simhash64("the quick brown fox jumps over the lazy dog")
    assert(s1 == s2)
    val s3 = SimHash.simhash64("the quick brown fox jumps over the lazy cat")
    assert(SimHash.hamming(s1, s3) < SimHash.hamming(s1, SimHash.simhash64("completely different words entirely unrelated text")))
    // pigeonhole: hamming <= 3 implies at least one of 4 bands equal
    val flipped = s1 ^ 0x8000000000000001L ^ 0x10000L // 3 bits in 3 bands
    assert((0 until SimHash.Bands).exists(b => SimHash.band(s1, b) == SimHash.band(flipped, b)))
    val q = LlmExtra.llmDedupSimhash(spark, sfDir)
    val rows = q.collect()
    assert(rows.forall(_.getLong(2) <= 24))
  }

  test("lsh topk recall vs brute-force cosine topk") {
    val brute = Llm.llmSimCosineTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = LlmExtra.llmSimLshTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.nonEmpty)
    // LSH neighbors must be a plausible subset: every LSH hit's cosine is
    // real; recall of the true top-5 should be well above random.
    // Expected recall ≈ 13% on this unclustered random data (8 tables ×
    // 8-bit buckets; near-neighbors at cos≈0.4 collide ~4× the random
    // rate). Assert the mechanism finds at least one true neighbor and
    // that candidate generation isn't degenerate (all or nothing).
    val recall = brute.intersect(lsh).size.toDouble / brute.size
    assert(recall > 0.0, s"LSH found none of the true top-5 (recall 0)")
    assert(lsh.size < 500 * 10, "candidate set degenerated to all pairs")
  }

  test("ivf topk recall vs brute-force cosine topk") {
    val brute = Llm.llmSimCosineTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = LlmExtra.llmSimIvfTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.nonEmpty)
    // probing 2 of 16 cells scans ~1/8 of the corpus; near neighbors
    // cluster into the probe's own cell, so recall must beat that rate
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall > 0.125, s"IVF recall $recall not above the 2/16 scan rate")
  }

  test("salted skew join equals the plain join on skewed data") {
    import SparkSpecBase.spark.implicits._
    // 90% of the large side lands on key 7 — the skew shape
    val large = (1 to 5000).map(i => (if (i % 10 == 0) i % 5 else 7, i.toLong))
      .toDF("k", "payload")
    val small = Seq((7, "hot"), (0, "a"), (1, "b"), (2, "c"), (3, "d"), (4, "e"))
      .toDF("k", "name")
    val salted = graft.operators.SkewJoin
      .saltedInnerJoin(large, small, "k", 8, col("payload"))
      .select("k", "payload", "name")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
    val plain = large.join(small, "k")
      .select("k", "payload", "name")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain && salted.size == 5000)
  }

  test("winnowing guarantee: shared substring ⇒ shared fingerprint") {
    val common = "abcdefghijklmnopqrstuvwxyz0123456789"
    val d1 = "PREFIXONE " + common + " SUFFIXONE"
    val d2 = "thisdiffers " + common + " andthisdifferstoo"
    val f1 = Winnowing.fingerprints(d1).toSet
    val f2 = Winnowing.fingerprints(d2).toSet
    assert(f1.intersect(f2).nonEmpty) // shared run ≥ K+W−1 = 8 chars
    assert(Winnowing.fingerprints(d1).toSeq == Winnowing.fingerprints(d1).toSeq)
    val q = LlmExtra.llmFingerprint(spark, sfDir).collect()
    assert(q.nonEmpty && q.forall(_.getLong(2) > 0))
  }

  test("mm_decode_stub is deterministic and typed") {
    val m = MediaRow(7L, "image", "some bytes here".getBytes("UTF-8"))
    assert(Media.decodeStub(m) == Media.decodeStub(m))
    val meta = Media.decodeStub(m)
    assert(meta.width >= 64 && meta.height >= 64 && meta.n_frames == 1)
    val v = Media.decodeStub(MediaRow(8L, "video", "vid".getBytes))
    assert(v.n_frames >= 25 && Media.sampleFrames(v, 25).nonEmpty)
    val out = MultimodalQueries.mmDecodeStub(spark, sfDir).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
  }

  test("llm_pack_sequences: greedy invariants hold and packing is partition-independent") {
    val cap = 512
    val bins = LlmExtra.llmPackSequences(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(bins.nonEmpty)
    // capacity: a bin over cap must be a single oversized doc
    bins.foreach { case (src, bin, nDocs, tokens) =>
      assert(tokens <= cap || nDocs == 1, s"$src/$bin: $nDocs docs, $tokens tokens")
    }
    // conservation: every doc is packed exactly once
    val totalDocs = graft.tables.Tables.t(spark, sfDir, "documents").count()
    assert(bins.map(_._3).sum == totalDocs)
    // greedy tightness: within a source, no bin (except the last) could
    // have absorbed the following bin entirely if the next bin is one
    // underfull doc — check the direct scan agrees instead
    val docs = graft.tables.Tables.t(spark, sfDir, "documents")
      .selectExpr("source", "doc_id", "size(split(text, ' ')) AS t").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    val expected = docs.flatMap { case (src, toks) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Long)]
      var bin = 0L; var n = 0L; var used = 0L
      toks.foreach { t =>
        if (used > 0 && used + t > cap) { out += ((src, bin, n, used)); bin += 1; n = 0; used = 0 }
        n += 1; used += t
      }
      if (n > 0) out += ((src, bin, n, used))
      out
    }.toSet
    assert(bins.toSet == expected)
  }

  test("mm_frame_sample fan-out matches a direct stub computation") {
    val got = MultimodalQueries.mmFrameSample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    val texts = graft.tables.Tables.t(spark, sfDir, "documents")
      .filter("doc_id < 600 AND doc_id % 3 = 2")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.map(_._1).toSet == texts.keySet)
    got.foreach { case (id, n, first, last) =>
      val meta = Media.decodeStub(MediaRow(id, "video", texts(id).getBytes("UTF-8")))
      val expected = Media.sampleFrames(meta, 16)
      assert(n == expected.length && first == expected.head && last == expected.last,
        s"doc $id: ($n,$first,$last) vs ${expected.length} frames")
    }
  }

  test("mm_resize_plan: fit law, aspect preservation, patch bounds") {
    val rows = graft.queries.MultimodalQueries.mmResizePlan(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, w, h, ow, oh, px, py, np) =>
      assert(ow <= 224 && oh <= 224, s"doc $id output exceeds the canvas")
      assert(px == 224 - ow && py == 224 - oh, s"doc $id letterbox arithmetic")
      if (math.max(w, h) > 224)
        assert(math.max(ow, oh) == 224, s"doc $id long side must hit the canvas")
      else assert(ow == w && oh == h, s"doc $id must not upscale")
      // floor-divided fit distorts aspect by at most one output pixel row
      assert(math.abs(ow * h - oh * w) <= math.max(w, h), s"doc $id aspect drift")
      assert(np >= 1 && np <= 14 * 14, s"doc $id patch count $np out of ViT range")
      assert(np == ((ow + 15) / 16) * ((oh + 15) / 16), s"doc $id patch replay")
    }
  }

  test("mm_phash_dedup: banded candidates equal the brute-force <=2-block set (pigeonhole exactness)") {
    val got = MultimodalQueries.mmPhashDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // recompute signatures independently and brute-force all pairs
    val texts = graft.tables.Tables.t(spark, sfDir, "documents")
      .filter(col("doc_id") < 2000).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).filter(_._2.length >= 8)
    def blocks(text: String): Array[Long] = {
      val len = text.length
      (0 until 8).map { i =>
        val from = (len.toLong * i / 8).toInt      // 0-based start
        val until = (len.toLong * (i + 1) / 8).toInt
        val sum = text.substring(from, until).foldLeft(0L)((a, c) => a + c.toInt)
        (sum / 128) % 256
      }.toArray
    }
    val sigs = texts.map { case (id, t) => (id, blocks(t)) }
    val bruteSet = (for {
      i <- sigs.indices
      j <- (i + 1) until sigs.length
    } yield {
      val (ia, ba) = sigs(i); val (ib, bb) = sigs(j)
      val nd = ba.zip(bb).count { case (x, y) => x != y }.toLong
      (math.min(ia, ib), math.max(ia, ib), nd)
    }).filter(_._3 <= 2).sortBy(t => (t._3, t._1, t._2)).take(100)
    assert(got.toSeq == bruteSet,
      s"banded result diverges from brute force: got ${got.length}, brute ${bruteSet.length}")
    assert(got.nonEmpty, "near-dup corpus must produce at least one <=2-block pair")
  }
}
