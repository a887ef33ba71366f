package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.queries.{LlmExtra, Relational, Scalars, StreamingQueries}
import graft.tables.Tables.t

/** Specs for the round-3 additions beyond the oracle gate: plan-shape
  * guarantees (the part the DuckDB hash-match cannot see) and semantic
  * cross-checks against an independent in-Spark formulation. */
class Round3OpsSpec extends GraftSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("fn_crypto_roundtrip: every row survives the AES roundtrip, ECB is deterministic") {
    val rows = Scalars.fnCryptoRoundtrip(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (st, n, ok, dc, dp) =>
      assert(ok == n, s"$st: ${n - ok} rows failed decrypt(encrypt(x)) == x")
      assert(dc == dp, s"$st: ECB cipher cardinality $dc != plaintext cardinality $dp")
    }
  }

  test("fn_collation: UTF8_LCASE collapses case-variants that stay binary-distinct") {
    val rows = Scalars.fnCollation(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 25, s"expected 25 lcase nation groups, got ${rows.length}")
    rows.foreach { case (name, nv, ndb, ncu) =>
      assert(name == name.toLowerCase, s"$name: group key not lowercased")
      assert(nv == 3, s"$name: expected 3 case variants, got $nv")
      assert(ndb == 3, s"$name: variants must stay binary-distinct, got $ndb")
      val expected = if (name.contains("tion_1")) 3L else 0L
      assert(ncu == expected, s"$name: case-insensitive contains('TION_1') = $ncu")
    }
  }

  test("agg_percentile_cont: quartiles bracket the discrete order stats") {
    val rows = Relational.aggPercentileCont(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (f, n, p25, p50, p75) =>
      assert(n > 0)
      assert(p25 <= p50 && p50 <= p75, s"$f quartile ordering")
      // interpolated values sit between adjacent integer order stats,
      // so each quartile is within 1 cent of an integer lattice point
      Seq(p25, p50, p75).foreach { q =>
        assert(q >= 0, s"$f negative quantile")
        val frac = q - math.floor(q)
        assert(Set(0.0, 0.25, 0.5, 0.75).exists(d => math.abs(frac - d) < 1e-9),
          s"$f quantile $q not on the dyadic quartile lattice")
      }
    }
  }

  test("llm_char_diversity: index in [0,1), counts conserve, replay one doc") {
    val rows = LlmExtra.llmCharDiversity(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, d, g) =>
      assert(d >= 1 && d <= n, s"doc $id distinct-char bounds")
      assert(g >= 0 && g < 1.0, s"doc $id gini out of range")
      if (d == 1) assert(g == 0.0, s"doc $id single-char page must score 0")
    }
    // replay one doc exactly
    val mid = rows(rows.length / 2)
    val text = graft.tables.Tables.t(spark, sfDir, "documents")
      .filter(col("doc_id") === mid._1).select("text").head.getString(0)
    val counts = text.toSeq.groupBy(identity).map(_._2.size.toLong)
    val n = counts.sum
    assert(mid._2 == n && mid._3 == counts.size, s"doc ${mid._1} census replay")
    val num = n * n - counts.map(c => c * c).sum
    val expect = ((2 * num * 10000L + n * n) / (2 * n * n)).toDouble / 10000.0
    assert(math.abs(mid._4 - expect) < 1e-12, s"doc ${mid._1} gini replay")
  }

  test("llm_epoch_shuffle: epochs cover the corpus, orders genuinely differ") {
    val rows = LlmExtra.llmEpochShuffle(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val nDocs = t(spark, sfDir, "documents").count()
    Seq(0L, 1L).foreach { e =>
      val shards = rows.filter(_._1 == e)
      assert(shards.map(_._3).sum == nDocs, s"epoch $e shards must cover the corpus")
      assert(shards.map(_._2).toSet.subsetOf((0L to 15L).toSet), s"epoch $e shard range")
    }
    // the two epochs must produce different orders from the same rule:
    // at least one shard-level checksum differs
    val by = rows.groupBy(_._2)
    assert(by.exists { case (_, g) =>
      g.map(x => (x._1, x._6)).toMap.values.toSet.size > 1 ||
        g.map(x => (x._1, x._3)).toMap.values.toSet.size > 1
    }, "epoch 0 and 1 produced identical shard contents and orders")
  }

  test("llm_shard_manifest: shards partition each source, byte conservation holds") {
    val rows = LlmExtra.llmShardManifest(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val docs = t(spark, sfDir, "documents")
    assert(rows.map(_._3).sum == docs.count(), "shards must partition the corpus")
    assert(rows.map(_._4).sum ==
      docs.agg(sum(octet_length(col("text")))).head.getLong(0), "byte conservation")
    rows.groupBy(_._1).foreach { case (src, shards) =>
      val sorted = shards.sortBy(_._2)
      // shard ids dense from 0, id ranges non-overlapping and ordered
      assert(sorted.map(_._2).zipWithIndex.forall { case (s0, i) => s0 == i },
        s"$src shard ids not dense")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._6 < b._5, s"$src shard ranges overlap")
        case _ =>
      }
      // every shard except possibly the last STARTS under the target
      sorted.dropRight(1).foreach { case (_, sh, _, bytes, _, _) =>
        assert(bytes > 0, s"$src shard $sh empty")
      }
    }
  }

  test("llm_cluster_purity: cells partition the corpus, majority law holds") {
    val rows = LlmExtra.llmClusterPurity(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val nVecs = t(spark, sfDir, "embeddings").count()
    assert(rows.map(_._2).sum == nVecs, "cells must partition the embedding corpus")
    rows.foreach { case (cell, n, _, nMaj, purity) =>
      assert(nMaj >= 1 && nMaj <= n, s"cell $cell majority mass out of range")
      assert(purity > 0 && purity <= 1.0, s"cell $cell purity out of (0,1]")
      // the majority is at least an equal share of the label count
      assert(nMaj * 10 >= n, s"cell $cell majority below the 10-label floor")
    }
  }

  test("llm_rouge_recall: recall bounded, identical-pair sanity, micro-average replays") {
    val rows = LlmExtra.llmRougeRecall(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, nPairs, ov, ref, rec) =>
      assert(nPairs > 0 && ref > 0, s"$lang empty")
      assert(ov <= ref, s"$lang overlap exceeds reference mass")
      assert(rec >= 0 && rec <= 1.0, s"$lang recall out of [0,1]")
      // micro recall replays from the integer sums (half-up, 4 decimals)
      val expect = ((2 * ov * 10000L + ref) / (2 * ref)).toDouble / 10000.0
      assert(math.abs(rec - expect) < 1e-12, s"$lang micro-average replay")
    }
  }

  test("sql_groupby_all resolves to the explicit GROUP BY result") {
    val all = Relational.sqlGroupByAll(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val explicit = t(spark, sfDir, "orders")
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum((col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")).as("cents"))
      .orderBy("o_orderstatus", "o_orderpriority", "n", "cents")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(all.sorted.sameElements(explicit.sorted), "GROUP BY ALL diverges from explicit")
  }

  test("join_range_bucket plans an equi-join, not BroadcastNestedLoopJoin") {
    val p = plan(Relational.joinRangeBucket(spark, sfDir))
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Join") || p.contains("join"), p)
  }

  test("join_range_bucket equals the naive range-predicate join") {
    val banded = Relational.joinRangeBucket(spark, sfDir).collect()
    val iv = t(spark, sfDir, "orders").filter(col("o_orderkey") <= 500)
      .select(col("o_orderkey"),
        to_date(col("o_orderdate")).as("s"),
        date_add(to_date(col("o_orderdate")), (col("o_orderkey") % 30).cast("int")).as("e"))
    val naive = t(spark, sfDir, "lineitem").filter(col("l_orderkey") <= 5000)
      .select(to_date(col("l_shipdate")).as("d"), col("l_quantity"))
      .join(iv, col("d").between(col("s"), col("e")))
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n_shipments"),
        round(sum(col("l_quantity").cast("decimal(12,2)")), 2).cast("double").as("sum_qty"))
      .orderBy("o_orderkey")
      .collect()
    assert(banded.toSeq == naive.toSeq)
  }

  test("window_distinct_count matches the collect_set formulation") {
    val viaRank = Relational.windowDistinctCount(spark, sfDir)
      .select("o_orderkey", "n_distinct_prio").collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaSet = t(spark, sfDir, "orders").filter(col("o_custkey") <= 300)
      .withColumn("n_distinct_prio",
        size(collect_set(col("o_orderpriority")).over(Window.partitionBy("o_custkey"))).cast("long"))
      .select("o_orderkey", "n_distinct_prio").orderBy("o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaRank.toSeq == viaSet.toSeq)
  }

  test("fn_codec round-trips are the identity on every row") {
    val rows = Scalars.fnCodec(spark, sfDir)
      .agg(count(lit(1)).as("n"), count_if(col("b64_roundtrip") && col("hex_roundtrip")).as("ok"))
      .collect().head
    assert(rows.getLong(0) > 0 && rows.getLong(0) == rows.getLong(1))
  }

  test("fn_epoch_time epoch units are consistent and round-trip exactly") {
    val bad = Scalars.fnEpochTime(spark, sfDir)
      .join(t(spark, sfDir, "orders").select("o_orderkey", "o_orderdate"), "o_orderkey")
      .filter(col("epoch_ms") =!= col("epoch_s") * 1000L ||
        col("epoch_us") =!= col("epoch_ms") * 1000L ||
        col("from_epoch") =!= col("o_orderdate"))
      .count()
    assert(bad == 0L)
  }

  test("llm_domain_mix thresholds and kept counts match an independent formulation") {
    val rows = LlmExtra.llmDomainMix(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (src, total, kept, thr) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(4))
      assert(thr == 3 + (src.last - '0'), s"$src threshold")
      assert(kept <= total)
      // independent recomputation: membership via the hex-char SET below
      // the threshold (string isin) instead of conv()'s numeric compare
      val nibbles = (0 until thr).map(n => f"$n%x".toString)
      val expect = t(spark, sfDir, "documents")
        .filter(col("source") === src &&
          substring(md5(col("text")), 1, 1).isin(nibbles: _*))
        .count()
      assert(kept == expect, s"$src kept=$kept expect=$expect")
    }
  }

  test("join_sort_merge pins SortMergeJoin and matches the hint-free result") {
    val p = plan(Relational.joinSortMerge(spark, sfDir))
    assert(p.contains("SortMergeJoin"), p)
    val hinted = Relational.joinSortMerge(spark, sfDir).collect()
    val plain = t(spark, sfDir, "orders")
      .join(t(spark, sfDir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice").cast("decimal(12,2)")), 2).cast("double").as("sum_price"))
      .orderBy("o_orderpriority").collect()
    assert(hinted.toSeq == plain.toSeq)
  }

  test("agg_count_min_sketch estimates bound the exact counts") {
    val est = Relational.aggCountMinSketch(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val exact = t(spark, sfDir, "lineitem").filter(col("l_suppkey").between(1, 20))
      .groupBy("l_suppkey").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val total = t(spark, sfDir, "lineitem").count()
    assert(est.nonEmpty)
    est.foreach { case (k, e) =>
      val ex = exact.getOrElse(k, 0L)
      assert(e >= ex, s"key $k: est $e < exact $ex (CMS never underestimates)")
      assert(e <= ex + (0.001 * total).ceil.toLong + 1, s"key $k: est $e too far above $ex")
    }
  }

  test("llm_vocab_coverage: covered <= total and coverage consistent with counts") {
    val rows = LlmExtra.llmVocabCoverage(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tok, cov, ratio) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(cov <= tok && cov >= 0)
      assert(math.abs(ratio - cov.toDouble / tok) < 1e-4 + 1e-9, s"ratio $ratio vs ${cov.toDouble / tok}")
    }
  }

  test("llm_embed_centroid norms are in (0, 1] for unit-norm inputs and count all vectors") {
    val rows = LlmExtra.llmEmbedCentroid(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val total = t(spark, sfDir, "embeddings").count()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      val norm = r.getDouble(2)
      // mean of unit vectors has norm <= 1 (triangle inequality), > 0
      // unless the class is perfectly balanced around the origin
      assert(norm > 0.0 && norm <= 1.0001, s"label ${r.get(0)} norm=$norm")
    }
  }

  test("window_range_time trailing sums match a self-join recomputation") {
    val viaFrame = Relational.windowRangeTime(spark, sfDir)
      .select("event_id", "n_trailing_1h").collect().map(r => (r.getLong(0), r.getLong(1)))
    val e = t(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), expr("unix_micros(ts) div 1000000").as("es"))
    val viaJoin = e.as("a").join(e.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("b.es").between(col("a.es") - 3600L, col("a.es")))
      .groupBy(col("a.event_id").as("event_id"))
      .agg(count(lit(1)).as("n")).orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaFrame.toSeq == viaJoin.toSeq)
  }

  test("agg_mode picks the most frequent priority per status") {
    val modes = Relational.aggMode(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toList
    assert(modes.nonEmpty)
    val counts = t(spark, sfDir, "orders")
      .groupBy("o_orderstatus", "o_orderpriority").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    modes.foreach { case (status, prio, n) =>
      val grp = counts(status).map(t => (t._2, t._3))
      val best = grp.maxBy { case (p, c) => (c, p) }
      assert((prio, n) == best, s"$status: got ($prio,$n) want $best")
    }
  }

  test("stream_funnel counts are monotonically non-increasing down the stages") {
    val r = StreamingQueries.streamFunnel(spark, sfDir).collect().head
    val (nv, nc, np) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nv > 0 && nv >= nc && nc >= np)
    // clickers really did click at-or-after their first view
    val ev = t(spark, sfDir, "events")
    val v = ev.filter(col("event_type") === "view").groupBy("user_id").agg(min("ts").as("v_ts"))
    val directClickers = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") >= col("v_ts"))
      .select("user_id").distinct().count()
    assert(nc == directClickers)
  }

  test("llm_filter_funnel stage counts are cumulative (non-increasing)") {
    val rows = LlmExtra.llmFilterFunnel(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, s1, s2, s3) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n >= s1 && s1 >= s2 && s2 >= s3 && s3 >= 0, r.toString)
    }
  }

  test("fn_explode_outer keeps one NULL row per empty-array doc") {
    val df = Scalars.fnExplodeOuter(spark, sfDir)
    val nullRows = df.filter(col("pos").isNull).count()
    val emptyDocs = t(spark, sfDir, "documents").filter(col("doc_id") < 2000)
      .filter(size(expr("filter(split(text, ' '), w -> w LIKE '%q%')")) === 0).count()
    assert(emptyDocs > 0 && nullRows == emptyDocs)
    assert(df.select("doc_id").distinct().count() ==
      t(spark, sfDir, "documents").filter(col("doc_id") < 2000).count())
  }

  test("window_share_of_total shares sum to 1") {
    val shares = Relational.windowShareOfTotal(spark, sfDir).collect().map(_.getDouble(2))
    assert(shares.nonEmpty && shares.forall(s => s > 0 && s < 1))
    assert(math.abs(shares.sum - 1.0) < 1e-4)
  }

  test("census_moe_ratio: p in [0,1] and moe_p positive and small relative to p's scale") {
    val rows = graft.queries.CensusQueries.censusMoeRatio(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.filterNot(_.isNullAt(1)).foreach { r =>
      val (p, moe) = (r.getDouble(1), r.getDouble(2))
      assert(p >= 0.0 && p <= 1.0, s"p=$p")
      assert(moe >= 0.0 && moe < 1.0, s"moe_p=$moe")
    }
  }

  test("llm_dedup_components labels are valid components (edge-closed, rep = min member)") {
    val comps = LlmExtra.llmDedupComponents(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(comps.nonEmpty)
    comps.foreach { case (rep, n, maxDoc) =>
      assert(n >= 2, s"component $rep has $n member(s) — nodes only exist via pairs")
      assert(rep <= maxDoc)
    }
    // transitivity actually exercised: at least one component larger
    // than a single pair
    assert(comps.exists(_._2 > 2), "expected at least one transitively merged component")
  }

  test("stream_window_topk emits at most 3 ranked rows per day, counts non-increasing") {
    val rows = StreamingQueries.streamWindowTopk(spark, sfDir)
      .collect().map(r => (r.getDate(0).toString, r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (day, rs) =>
      assert(rs.length <= 3, day)
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq, day)
      val byRank = rs.sortBy(_._3).map(_._2)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b }, day)
    }
  }

  test("scan_observe_metrics: observed counters arrive via QueryExecutionListener") {
    @volatile var seen: Map[String, Any] = Map.empty
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, duration: Long): Unit = {
        qe.observedMetrics.get("graft_metrics").foreach { row =>
          seen = row.schema.fieldNames.zip(row.toSeq).toMap
        }
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val df = Relational.scanObserveMetrics(spark, sfDir)
      val outlierRows = df.collect().map(_.getLong(1)).sum
      // the listener fires asynchronously on the bus — poll briefly
      var tries = 0
      while (seen.isEmpty && tries < 50) { Thread.sleep(100); tries += 1 }
      assert(seen.nonEmpty, "no observed metrics delivered")
      val total = graft.tables.Tables.t(spark, sfDir, "lineitem").count()
      assert(seen("rows_scanned") == total, s"rows_scanned=${seen("rows_scanned")} != $total")
      assert(seen("qty_outliers") == outlierRows,
        s"qty_outliers=${seen("qty_outliers")} != grouped total $outlierRows")
    } finally spark.listenerManager.unregister(listener)
  }

  test("cache_shared_scan: second aggregate reads the cache, not parquet") {
    val df = Relational.cacheSharedScan(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2,
      s"expected both branches on InMemoryTableScan:\n${p.take(3000)}")
    // counts and totals agree between the two cached branches
    val rows = df.collect()
    val n = rows.count(_.getString(1) == "n_orders")
    val t2 = rows.count(_.getString(1) == "total_price")
    assert(n == t2 && n > 0)
  }
}
