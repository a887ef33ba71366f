package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables.t
import graft.llm.{MinHash, Vectors}

/** LLM-data-pipeline operators (SURVEY §2.B llm_* rows): dedup,
  * similarity search, text analysis, multimodal join.
  */
object Llm {

  /** Exact dedup via content hash: per source, total vs distinct md5(text).
    * At scale this is a single hash-shuffle on the digest — the canonical
    * exact-dedup shape. */
  def llmDedupExact(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), countDistinct(md5(col("text"))).as("n_uniq"))
      .orderBy("source")

  /** Dedup with a keep policy: group by a prefix fingerprint (md5 of the
    * first 40 chars — the boilerplate/near-dup families in this corpus
    * share prefixes; full-text md5 has zero collisions below sf0.1) and
    * keep the "best" document per group (longest, doc_id tiebreak) — the
    * canonicalization step after duplicate detection. One hash-groupBy
    * with an argmax aggregate: no window sort, no self-join; the shuffle
    * carries one row per distinct fingerprint. */
  def llmDedupKeepBest(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("h", md5(substring(col("text"), 1, 40)))
      .groupBy("h")
      .agg(
        count(lit(1)).as("n_dupes"),
        // tie-free LEXICOGRAPHIC ordering (chars dominate, doc_id breaks
        // ties) via struct comparison — a packed bigint composite would
        // silently misorder once doc_id reaches the multiplier
        max_by(col("doc_id"), struct(col("n_chars"), col("doc_id"))).as("kept_doc_id"))
      .filter(col("n_dupes") > 1)
      .orderBy("h")

  /** MinHash signatures for a documents-shaped frame — one native-
    * expression map pass (graft.udx.MinHashExpression; same
    * MinHash.signature kernel the UDF called, without the per-row
    * Scala-UDF conversion boundary).
    *
    * Callers persist: `sigs` feeds the band explode AND per-pair
    * join-backs — unpersisted, the 64-hash text pass runs up to four
    * times (the self-join sides don't canonicalize to a reused
    * exchange). The signature table is ~520 bytes/doc vs multi-KB text,
    * so caching it is the 100 TB design too: signatures are a derived
    * table you compute once. */
  private[graft] def signatures(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), expr("graft_minhash(text)").as("sig"))

  /** The (session, dir)-memoized signature table over the FULL
    * documents corpus — five graded queries (`llm_dedup_minhash`,
    * `llm_dedup_cross_corpus`, `llm_dedup_pipeline`,
    * `llm_dup_graph_degree`, `llm_minhash_band_tune`) each persisted
    * their own byte-identical copy of this one map pass (round-15
    * optimization measure: 10 signature passes per two-pass bench).
    * Signatures are the canonical derived table a dedup deployment
    * computes once and fans every analysis out from — the same
    * shared-derivation posture as the graph family's `symAdj`. Entries
    * are session-scoped (see `operators.SessionMemo`): nothing crosses
    * an invocation boundary. */
  private[graft] def sigsShared(s: SparkSession, dir: String): DataFrame =
    graft.operators.SessionMemo.memoized(s, s"minhashSigs|$dir", "minhashSigs") {
      graft.operators.GraftCaches.register(
        signatures(t(s, dir, "documents")).persist())
    }

  /** LSH band rows (doc_id, band, bkey) from a signature table, with the
    * hot-bucket cap (docs/PLANS.md "LSH banding" hazard) applied: band
    * buckets larger than `bandCap` are dropped BEFORE any join —
    * a bucket of that size is a boilerplate family whose |bucket|²/2
    * pair term no partitioning can absorb, and whose members exact /
    * paragraph dedup already collapses at linear cost. See
    * `operators.HotKeys` for the mechanics (tiny count shuffle +
    * broadcast anti join). At the default cap nothing in the graded
    * corpora is dropped (sf0.1 buckets top out in the tens), so graded
    * output is unchanged; `HotKeySpec` pins the cap behavior on planted
    * hot keys. */
  private[graft] def bandsOf(sigs: DataFrame, bandCap: Int): DataFrame = {
    val bandStructs = array((0 until MinHash.Bands).map { i =>
      struct(lit(i).as("band"),
        xxhash64(lit(i), slice(col("sig"), i * MinHash.RowsPerBand + 1, MinHash.RowsPerBand)).as("bkey"))
    }: _*)
    val bands = sigs.select(col("doc_id"), explode(bandStructs).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bkey").as("bkey"))
    graft.operators.HotKeys.dropOverCap(bands, Seq("band", "bkey"), bandCap)
  }

  /** MinHash + LSH near-dup candidates. Signature is one map pass;
    * banding turns candidate generation into an equi-join on the band
    * hash (shuffle, not all-pairs). md5-derived shingle hashes make the
    * signatures DuckDB-expressible, so the whole output is oracle-checked
    * value-for-value; ScalaTest additionally checks estimates against
    * exact Jaccard. */
  def llmDedupMinhash(s: SparkSession, dir: String): DataFrame = {
    graft.udx.NGrams.registerAll(s)
    minhashNearDupsSigs(sigsShared(s, dir), graft.operators.HotKeys.DefaultCap)
  }

  /** Core of `llm_dedup_minhash`, parameterized by input frame and band
    * cap so `HotKeySpec` can drive it with planted hot buckets at a
    * small threshold. */
  private[graft] def minhashNearDups(docs: DataFrame, bandCap: Int): DataFrame =
    minhashNearDupsSigs(signatures(docs).persist(), bandCap)

  /** The near-dup pass over a prebuilt signature table — the graded
    * query hands in the family-shared memoized signatures. */
  private[graft] def minhashNearDupsSigs(sigs: DataFrame, bandCap: Int): DataFrame = {
    val bands = bandsOf(sigs, bandCap)
    val a = bands.select(col("doc_id").as("doc_a"), col("band"), col("bkey"))
    val b = bands.select(col("doc_id").as("doc_b"), col("band"), col("bkey"))
    // dedup candidate PAIRS first (a pair colliding in k bands appears k
    // times), then join the signatures back and estimate ONCE per pair —
    // and the band join itself moves only (doc_id, band, bkey) rows, not
    // 64-long signature arrays
    val candPairs = a.join(b, Seq("band", "bkey"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
    candPairs
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (expr("graft_lmatch(sig_a, sig_b)").cast("double") / MinHash.NumPerm).as("est_jaccard"))
      .filter(col("est_jaccard") >= 0.2)
      .orderBy("doc_a", "doc_b")
  }

  /** Cross-corpus near-dup detection — the doc-level twin of
    * `llm_decontaminate`: flag every TARGET-side document (odd doc_id)
    * whose MinHash signature collides with any REFERENCE-side document
    * (even doc_id) in ≥1 LSH band and matches ≥13/64 rows
    * (est-Jaccard ≥ 0.2). This is how a training corpus is screened
    * against a benchmark/eval corpus at document granularity: signatures
    * once (one map pass, persisted), band equi-join ACROSS the two
    * sides only — never within a side, never all-pairs — then exact
    * row-match confirm per candidate pair. At 100 TB the reference side
    * is typically small enough that its banded signatures broadcast;
    * here both sides shuffle on (band, bkey), which is the general
    * form. */
  def llmDedupCrossCorpus(s: SparkSession, dir: String): DataFrame = {
    graft.udx.NGrams.registerAll(s)
    val sigs = sigsShared(s, dir)
    // hot-band cap applies here too: a boilerplate family spanning both
    // sides would otherwise contribute ref×tgt pairs from one bucket
    val bands = bandsOf(sigs, graft.operators.HotKeys.DefaultCap)
    val ref = bands.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id").as("doc_a"), col("band"), col("bkey"))
    val tgt = bands.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id").as("doc_b"), col("band"), col("bkey"))
    val cands = ref.join(tgt, Seq("band", "bkey"))
      .select("doc_a", "doc_b").distinct()
    cands
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .withColumn("m", expr("graft_lmatch(sig_a, sig_b)").cast("long"))
      .filter(col("m") >= 13)
      .groupBy("doc_b")
      .agg(countDistinct(col("doc_a")).as("n_ref_dups"), max("m").as("best_match"))
      .orderBy("doc_b")
  }

  /** The COMPLETE near-dup dedup pipeline, end to end — what a corpus
    * cleaning job actually runs, composed from the graded pieces:
    * MinHash signatures (native expression, one map pass) → LSH band
    * candidates (equi-join, never all-pairs) → similarity edges at
    * est-Jaccard ≥ 0.5 (integer match-count ≥ 32/64, no float
    * threshold) → connected components (operators.Components: frontier-
    * width Pregel loop with checkpointed lineage) → keep-best survivor
    * per duplicate GROUP (longest doc, doc_id tiebreak — pairwise dedup
    * alone under-merges A~B~C chains). Fully oracle-checked: the DuckDB
    * mirror recomputes signatures arithmetically and closes components
    * with a recursive CTE. Per-group output: size, survivor, removed
    * count. */
  def llmDedupPipeline(s: SparkSession, dir: String): DataFrame = {
    graft.udx.NGrams.registerAll(s)
    // persist both forks: `sigs` feeds the band explode and two per-pair
    // join-backs; `simPairs` below feeds both directions of the edge
    // union. Unpersisted, each downstream reference re-runs the 64-hash
    // text pass — multiplicatively through the union (observed ~350
    // document scans in the built plan). `sigs` is the family-shared
    // memoized table (see `sigsShared`).
    val sigs = sigsShared(s, dir)
    // hot-band cap (see bandsOf): a dropped boilerplate bucket's members
    // still merge via exact/paragraph dedup; LSH is for NEAR dups
    val bands = bandsOf(sigs, graft.operators.HotKeys.DefaultCap)
    val candPairs = bands.select(col("doc_id").as("src"), col("band"), col("bkey"))
      .join(bands.select(col("doc_id").as("dst"), col("band"), col("bkey")), Seq("band", "bkey"))
      .filter(col("src") < col("dst"))
      .select("src", "dst")
      .distinct()
    // similarity gate on the candidates only; integer threshold 32/64
    val simPairs = candPairs
      .join(sigs.select(col("doc_id").as("src"), col("sig").as("sig_a")), "src")
      .join(sigs.select(col("doc_id").as("dst"), col("sig").as("sig_b")), "dst")
      .filter(expr("graft_lmatch(sig_a, sig_b)") >= lit(MinHash.NumPerm / 2))
      .select("src", "dst")
      .persist()
    val edges = simPairs.union(simPairs.select(col("dst").as("src"), col("src").as("dst")))
    val labels = graft.operators.Components.minLabel(edges)
    labels.join(t(s, dir, "documents")
        .select(col("doc_id").as("node"), col("n_chars")), "node")
      .groupBy(col("label").as("group_rep"))
      .agg(
        count(lit(1)).as("n_docs"),
        max_by(col("node"), struct(col("n_chars"), col("node"))).as("kept_doc"),
        max(col("n_chars")).as("kept_chars"))
      .withColumn("n_removed", col("n_docs") - 1)
      .orderBy("group_rep")
  }

  /** Brute-force cosine top-k: 10 probe vectors broadcast against all
    * embeddings; norms precomputed per row before the join; dot product
    * via zip_with/aggregate (no UDF). Ranking is on the ROUNDED cosine
    * with vec_id tiebreak so both engines rank identically. */
  def llmSimCosineTopk(s: SparkSession, dir: String): DataFrame =
    simCosineTopkK(s, dir, 5)

  /** The (session, dir)-memoized brute-force TRUTH table (top-10) that
    * every ANN evaluator grades against — `llm_sim_recall_at_k`,
    * `llm_sim_pq_recall`, and the HNSW search readouts each recomputed
    * the identical 10-probe × corpus scan per invocation (round-15
    * optimization measure: ~10 truth passes per two-pass bench). The
    * deterministic (rounded-cos DESC, vec_id ASC) total order makes
    * every top-k a PREFIX of this table (`rnk <= k`), so one shared
    * top-10 serves all evaluator depths. `llm_sim_cosine_topk` — the
    * graded brute-force operator itself — deliberately does NOT read
    * this memo: it stays a fresh corpus scan every time. */
  private[graft] def truthTop10(s: SparkSession, dir: String): DataFrame =
    graft.operators.SessionMemo.memoized(s, s"annTruth10|$dir", "annTruth10") {
      graft.operators.GraftCaches.register(
        simCosineTopkK(s, dir, 10).persist())
    }

  /** The brute-force pass with the heap depth as a parameter — the
    * recall@k evaluator (`llm_sim_recall_at_k`) reads ONE top-10 pass
    * and derives the k ∈ {1,5,10} prefixes from `rnk`, so deepening the
    * heap must not fork the implementation. */
  private[graft] def simCosineTopkK(s: SparkSession, dir: String, k: Int): DataFrame = {
    graft.udx.NGrams.registerAll(s)
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", Vectors.fnorm(col("v")))
    val probes = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("pid"), col("v").as("pv"), col("nrm").as("pnorm"))
    val pairs = emb.crossJoin(broadcast(probes))
      .filter(col("pid") =!= col("vec_id"))
      .select(col("pid"), col("vec_id").as("nid"),
        round(Vectors.cosineWithNorms(Vectors.fdot(col("pv"), col("v")), col("pnorm"), col("nrm")), 4).as("cos"))
    // bounded-heap top-k aggregate (graft.udx.TopKAggregator) instead of
    // a window row_number: each input partition reduces to ≤ 5 rows per
    // probe before the shuffle — no per-probe global sort, no skew.
    pairs.groupBy("pid")
      .agg(graft.udx.TopKAggregator.topk(k)(col("cos"), col("nid")).as("tk"))
      .select(col("pid"), posexplode(col("tk.items")))
      .select(col("pid"), col("col._2").as("nid"), col("col._1").as("cos"),
        (col("pos") + 1).cast("long").as("rnk"))
      .orderBy("pid", "rnk")
  }

  /** Per-language corpus statistics (doc counts, char/token averages). */
  def llmTextStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        Num.avgInt(col("n_chars"), 2).as("avg_chars"),
        countDistinct(col("source")).as("n_sources"),
        Num.avgInt(size(split(col("text"), " ")), 2).as("avg_tokens"))
      .orderBy("lang")

  /** TF-IDF top-3 terms per language: tf per (lang, term), document
    * frequency per term, score = tf·ln(N/df). Two aggregations plus a
    * windowed top-k; N is a 1-row broadcast, never a collect. */
  def llmTfidfTopTerms(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // tokenization is spread (Tables.spread): the explode multiplies
    // every doc by its word count, so a narrow scan caps the whole pass
    val words = graft.tables.Tables.spread(s,
        docs.select(col("lang"), col("doc_id"), col("text")))
      .select(col("lang"), col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
    // One explode, two CASCADED aggregations: per-(lang,term,doc_id)
    // token counts first (map-side combine collapses repeated terms
    // within a doc before anything shuffles), then tf = Σ per-doc counts
    // and document frequency = row count per (lang,term) over the
    // already-collapsed rows. The single-aggregation form with a mixed
    // count/countDistinct forces Catalyst's distinct-rewrite Expand,
    // which DOUBLES the exploded corpus ahead of the shuffle — at 100 TB
    // that Expand is the bottleneck; the cascade's second shuffle moves
    // only (lang,term,doc) triples. Since every doc has exactly one
    // lang, corpus-wide df is the SUM of per-lang dfl over langs — a
    // window over the tiny aggregated vocabulary, not a second corpus
    // pass.
    val perDoc = words.groupBy("lang", "term", "doc_id")
      .agg(count(lit(1)).as("tfd"))
    val perLang = perDoc.groupBy("lang", "term")
      .agg(sum("tfd").as("tf"), count(lit(1)).as("dfl"))
    val withDf = perLang.withColumn("df", sum(col("dfl")).over(Window.partitionBy("term")))
    val nTotal = docs.agg(count(lit(1)).as("n_total"))
    val scored = withDf.crossJoin(broadcast(nTotal))
      .select(col("lang"), col("term"),
        round(col("tf") * log(col("n_total").cast("double") / col("df").cast("double")), 4).as("score"))
    val w = Window.partitionBy("lang").orderBy(desc("score"), asc("term"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select("lang", "term", "score", "rnk")
      .orderBy("lang", "rnk")
  }

  /** Multimodal star: text table ⋈ vector table on id, grouped stats over
    * one embedding dimension. */
  def llmMultimodalJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .join(t(s, dir, "embeddings"), col("doc_id") === col("vec_id"))
      .groupBy("lang", "label")
      .agg(count(lit(1)).as("n"),
        round(avg(element_at(col("embedding"), 1).cast("double")), 4).as("avg_dim0"))
      .orderBy("lang", "label")
}
