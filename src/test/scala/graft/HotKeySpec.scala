package graft

import org.apache.spark.sql.functions._
import graft.operators.HotKeys
import graft.queries.{GraphQueries, Llm, LlmExtra}

/** Adversarial planted-hot-key tests for the two documented 100 TB
  * candidate-join hazards (docs/PLANS.md): the LSH hot band bucket and
  * the boilerplate-shingle posting list. Each plants a key group whose
  * uncapped pair term is quadratic (the 300-doc family alone would emit
  * C(300,2)·16 ≈ 720k band-join rows before dedup; at corpus scale that
  * term is unbounded) and pins that the cap (a) drops exactly the
  * pathological group, (b) keeps every organic near-dup, and (c) leaves
  * under-cap results identical to the uncapped form. */
class HotKeySpec extends GraftSpec {
  import SparkSpecBase.spark.implicits._

  test("dropOverCap drops exactly the over-cap key groups") {
    val df = (1 to 10).map(i => ("hot", i)).toDF("k", "v")
      .union((1 to 3).map(i => ("cold", i)).toDF("k", "v"))
    val kept = HotKeys.dropOverCap(df, Seq("k"), 5)
    assert(kept.count() == 3)
    assert(kept.select("k").distinct().as[String].collect().toSeq == Seq("cold"))
    // under-cap passthrough: nothing dropped, schema unchanged
    val all = HotKeys.dropOverCap(df, Seq("k"), 100)
    assert(all.count() == 13 && all.columns.toSeq == df.columns.toSeq)
  }

  // 300 identical documents: every signature identical, so all 16 band
  // buckets hold the whole family — the planted hot bucket. Two more
  // identical docs with unrelated text form the organic near-dup pair
  // (bucket size 2, always under cap).
  private def plantedDocs = {
    graft.udx.NGrams.registerAll(spark)
    val boiler = "terms of service apply to all content on this mirror site " +
      "please review the full policy before downloading any material today"
    val real = "the migration of arctic terns covers more distance than any " +
      "other bird species crossing both hemispheres during a single year"
    val family = (1 to 300).map(i => (i.toLong, boiler))
    val pair = Seq((1001L, real), (1002L, real))
    (family ++ pair).toDF("doc_id", "text")
  }

  test("LSH band cap: planted hot bucket dropped, organic pair kept") {
    val out = Llm.minhashNearDups(plantedDocs, bandCap = 50)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // the 44,850 family pairs are gone; the organic pair survives
    assert(out == Set((1001L, 1002L)))
  }

  test("LSH band cap: under-cap family is NOT dropped (cap is inert below threshold)") {
    val out = Llm.minhashNearDups(plantedDocs, bandCap = 4096)
      .select("doc_a", "doc_b")
    // all C(300,2) family pairs + the organic pair
    assert(out.count() == 300L * 299 / 2 + 1)
  }

  // 60 docs sharing one boilerplate sentence (its shingles have df=60),
  // each padded with doc-unique words so no other shingle is shared;
  // plus one genuine near-dup pair sharing unique content. With the cap
  // at 50 the boilerplate postings vanish and only the genuine pair has
  // any surviving intersection.
  private def plantedShingleDocs = {
    graft.udx.NGrams.registerAll(spark)
    val boiler = "subscribe to our newsletter for updates and exclusive offers every week"
    val realA = "glacial meltwater carries fine sediment that turns alpine lakes turquoise in summer"
    val realB = "glacial meltwater carries fine sediment that turns alpine lakes turquoise in winter"
    val docs = (1 to 60).map { i =>
      (i.toLong, "web", s"unique$i alpha$i beta$i gamma$i delta$i $boiler")
    } ++ Seq((2001L, "web", realA), (2002L, "web", realB))
    docs.toDF("doc_id", "source", "text")
      .select(col("doc_id"), col("source"), expr("graft_shingles64(text)").as("sh"))
  }

  test("posting df-cap: boilerplate shingle postings dropped, genuine pair kept") {
    val out = LlmExtra.ngramJaccard(plantedShingleDocs, dfCap = 50)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(out == Set((2001L, 2002L)))
  }

  test("posting df-cap: inert below threshold (all boilerplate pairs present)") {
    val n = LlmExtra.ngramJaccard(plantedShingleDocs, dfCap = 4096).count()
    // every one of the C(60,2) boilerplate pairs shares a shingle, plus
    // the genuine pair — df²/2 growth is exactly what the cap bounds
    assert(n == 60L * 59 / 2 + 1)
  }

  // ---- round-8 sites: editdist prefix blocks, semdedup cells, graph blocks ----

  // 300 docs sharing a 20-char boilerplate prefix (the license-header
  // blocking failure: one (source, prefix) block, |block|²/2 pairs) plus
  // one organic near-dup pair in its own size-2 block.
  private def editdistDocs = {
    val boiler = "LICENSE HEADER v2.0 " // exactly 20 chars → one block
    val family = (1 to 300).map(i =>
      (i.toLong, "web", boiler + s"all rights reserved worldwide forever doc $i"))
    val pair = Seq(
      (9001L, "web", "arctic tern migratio" + "n covers both hemispheres every single year"),
      (9002L, "web", "arctic tern migratio" + "n covers both hemispheres every single week"))
    (family ++ pair).toDF("doc_id", "source", "text")
  }

  test("editdist block cap: boilerplate prefix block dropped, organic pair kept") {
    val out = LlmExtra.llmDedupEditdistBlocks(editdistDocs, blockCap = 50)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(out == Set((9001L, 9002L)))
  }

  test("editdist block cap: inert below threshold") {
    val n = LlmExtra.llmDedupEditdistBlocks(editdistDocs, blockCap = 4096).count()
    assert(n == 300L * 299 / 2 + 1)
  }

  // 60 vectors collapsed onto centroid 0 (the saturated SemDeDup cell —
  // exactly the near-duplicate-heavy distribution the operator targets)
  // vs a 3-member cold cell on centroid 1. Unit-norm 2-d vectors.
  private def plantedEmb = {
    val c0 = Array(1f, 0f)
    val c1 = Array(0f, 1f)
    val hot = (100 to 159).map(i => (i.toLong, c0))
    val cold = Seq((1000L, c1), (1001L, c1))
    (Seq((0L, c0), (1L, c1)) ++ hot ++ cold).toDF("vec_id", "v")
  }

  test("semdedup hot-cell cap: saturated cell dropped, cold cell kept") {
    val out = LlmExtra.llmSemdedupCells(plantedEmb, cellCap = 50)
      .select("cell", "n_pairs").as[(Long, Long)].collect().toMap
    // cell 0 (61 members → C(61,2)=1830 pairs uncapped) is gone; cell 1
    // (centroid + 2 members) keeps its 3 pairs
    assert(out == Map(1L -> 3L))
  }

  test("semdedup hot-cell cap: inert below threshold") {
    val out = LlmExtra.llmSemdedupCells(plantedEmb, cellCap = 4096)
      .select("cell", "n_pairs").as[(Long, Long)].collect().toMap
    assert(out == Map(0L -> 61L * 60 / 2, 1L -> 3L))
  }

  // 300 template docs landing in one (source × length-bucket) block
  // (unique langs keep their l-blocks singleton) + an organic pair
  // sharing both its s-block and l-block.
  private def plantedGraphDocs = {
    val family = (1 to 300).map(i => (i.toLong, "tpl", s"zz$i", 150L))
    val pair = Seq((5000L, "web2", "en", 320L), (5001L, "web2", "en", 330L))
    (family ++ pair).toDF("doc_id", "source", "lang", "n_chars")
  }

  test("graph block cap: hot similarity block dropped, organic edge kept") {
    val out = GraphQueries.simEdgesCapped(plantedGraphDocs, blockCap = 50)
      .as[(Long, Long)].collect().toSet
    assert(out == Set((5000L, 5001L)))
  }

  test("graph block cap: inert below threshold") {
    val n = GraphQueries.simEdgesCapped(plantedGraphDocs, blockCap = 4096).count()
    assert(n == 300L * 299 / 2 + 1)
  }

  test("cap guard plans a BROADCAST anti join, not a shuffled one") {
    // the guard's cost model depends on the hot list staying broadcast:
    // a refactor that loses the broadcast hint would put a full shuffle
    // of the payload frame in front of every capped candidate join
    val df = (1 to 100).map(i => ("k" + (i % 10), i)).toDF("k", "v")
    val p = HotKeys.dropOverCap(df, Seq("k"), 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }
}
