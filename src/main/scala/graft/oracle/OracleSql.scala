package graft.oracle

import graft.queries.Num.{Sql => N}

/** DuckDB oracle SQL (SURVEY §2.B, oracle=yes rows), one string per
  * `SparkEntry.queries` key. Dialect discipline (SURVEY §2.C):
  *  - bare table names (driver registers views over the same parquet);
  *  - identical output column names/ordering keys as the Spark query;
  *  - identical rounding on every floating aggregate;
  *  - DuckDB type normalization: year()/length() cast to INT, ceil/floor
  *    to BIGINT, sum(INT) to BIGINT (DuckDB widens to HUGEINT);
  *  - timestamps compared via epoch_us / date casts (events.ts is ns in
  *    DuckDB but µs-aligned in the data, so epoch_us agrees with Spark's
  *    unix_micros).
  */
object OracleSql {

  /** graph_pagerank_converged: the Spark loop stops at the FIRST round
    * whose L1 rank movement falls to ε = 200 µ-units/node; DuckDB has
    * no loop, so the same stopping rule is solved RELATIONALLY — all
    * 24 capped rounds unroll (integer-exact, so every round's ranks
    * are bit-identical to the Spark loop's), a per-round L1 table
    * picks min(round) at-or-under ε, and that round's rank set is
    * selected from the union of all rounds. Two engines, two
    * algorithms (iterative early-exit vs full unroll + relational
    * arg-min), one bit-exact answer. */
  private def pagerankConvergedSql: String = {
    val R = 24
    // AS MATERIALIZED is load-bearing: each r_k is referenced three
    // times (next round, its L1 row, the all-rounds union) — inlined,
    // the expression tree triples per round and the planner never
    // returns; materialized, the chain is linear like the Spark loop.
    val rounds = (1 to R).map { k =>
      s"""c$k AS MATERIALIZED (
             SELECT e.v AS node, CAST(sum(r.r // d.deg) AS BIGINT) AS sc
             FROM edges e JOIN r${k - 1} r ON r.node = e.u
             JOIN deg d ON d.u = e.u GROUP BY e.v),
      r$k AS MATERIALIZED (
             SELECT nodes.node,
                 CAST(500000 + (500 * coalesce(c$k.sc, 0)) // 1000 AS BIGINT) AS r
             FROM nodes LEFT JOIN c$k ON c$k.node = nodes.node),
      l$k AS (SELECT $k AS round, CAST(sum(abs(a.r - b.r)) AS BIGINT) AS l1
             FROM r$k a JOIN r${k - 1} b ON a.node = b.node)"""
    }.mkString(",\n      ")
    val l1s = (1 to R).map(k => s"SELECT * FROM l$k").mkString(" UNION ALL ")
    val ranks = (1 to R)
      .map(k => s"SELECT $k AS round, node, r FROM r$k").mkString(" UNION ALL ")
    s"""
      WITH docs AS MATERIALIZED (
        SELECT doc_id, source, lang, n_chars FROM documents WHERE doc_id < 1200),
      blocks AS (
        SELECT doc_id AS u,
               concat_ws('|', 's', source, CAST(n_chars // 100 AS VARCHAR)) AS bk
        FROM docs
        UNION ALL
        SELECT doc_id AS u,
               concat_ws('|', 'l', lang, CAST(n_chars // 50 AS VARCHAR)) AS bk
        FROM docs),
      edges0 AS (
        SELECT DISTINCT a.u AS u, b.u AS v
        FROM blocks a JOIN blocks b USING (bk) WHERE a.u < b.u),
      edges AS MATERIALIZED (
        SELECT u, v FROM edges0 UNION SELECT v, u FROM edges0),
      deg AS MATERIALIZED (SELECT u, count(*) AS deg FROM edges GROUP BY u),
      nodes AS MATERIALIZED (SELECT DISTINCT u AS node FROM edges),
      eps AS (SELECT 200 * count(*) AS e FROM nodes),
      r0 AS MATERIALIZED (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
      $rounds,
      l1s AS ($l1s),
      pick AS (
        SELECT coalesce(min(round) FILTER (WHERE ok), $R) AS k, bool_or(ok) AS conv
        FROM (SELECT round, l1 <= (SELECT e FROM eps) AS ok FROM l1s) t),
      ranks AS ($ranks)
      SELECT ranks.node, coalesce(deg.deg, 0) AS n_neighbors, ranks.r AS rank_micro,
             CAST(pick.k AS BIGINT) AS n_rounds, pick.conv AS converged
      FROM ranks JOIN pick ON ranks.round = pick.k
      LEFT JOIN deg ON deg.u = ranks.node
      ORDER BY rank_micro DESC, node LIMIT 25"""
  }

  /** graph_core_full: full core decomposition by synchronous
    * neighborhood h-index iteration (Lü et al. 2016 — estimates start
    * at degree, each round becomes the h-index of the neighbors'
    * estimates, and the fixpoint is exactly coreness). The oracle
    * unrolls the same 12 rounds the Spark side composes lazily: each
    * round is a join to the previous estimates, a per-node descending
    * rank over incoming estimates, and `max(least(est, rank))`.
    * Estimates are monotone non-increasing per node, so "round 12 ==
    * round 11" reduces to comparing the two estimate SUMS — the same
    * `converged` verdict the engine computes from its two persisted
    * frames. MATERIALIZED keeps the chain linear (h11 is referenced
    * three times: h12, its sum, and nothing else would survive
    * inlining). */
  /** The shared 12-round h-index CTE chain over the two-blocking
    * similarity edges — `graph_core_full` histograms `h12.est` with a
    * converged verdict; `graph_core_decomposition` histograms
    * `least(h12.est, 4)` (the k ≤ 4 truncation of the same estimates,
    * matching the engine's shared `hIndexEstimates` core). */
  private val coreHIndexRounds = 12
  private def coreHIndexChainSql: String = {
    val rounds = (1 to coreHIndexRounds).map { r =>
      s"""h$r AS MATERIALIZED (
         |        SELECT u AS node, CAST(max(least(ce, rn)) AS BIGINT) AS est FROM (
         |          SELECT e.u, c.est AS ce,
         |                 row_number() OVER (PARTITION BY e.u ORDER BY c.est DESC) AS rn
         |          FROM edges e JOIN h${r - 1} c ON c.node = e.v)
         |        GROUP BY u)""".stripMargin
    }.mkString(",\n      ")
    s"""docs AS MATERIALIZED (
        SELECT doc_id, source, lang, n_chars FROM documents WHERE doc_id < 1200),
      blocks AS (
        SELECT doc_id AS u,
               concat_ws('|', 's', source, CAST(n_chars // 100 AS VARCHAR)) AS bk
        FROM docs
        UNION ALL
        SELECT doc_id AS u,
               concat_ws('|', 'l', lang, CAST(n_chars // 50 AS VARCHAR)) AS bk
        FROM docs),
      edges0 AS (
        SELECT DISTINCT a.u AS u, b.u AS v
        FROM blocks a JOIN blocks b USING (bk) WHERE a.u < b.u),
      edges AS MATERIALIZED (SELECT u, v FROM edges0 UNION SELECT v, u FROM edges0),
      h0 AS MATERIALIZED (
        SELECT u AS node, CAST(count(*) AS BIGINT) AS est FROM edges GROUP BY u),
      $rounds"""
  }

  private def coreFullSql: String = {
    val R = coreHIndexRounds
    s"""
      WITH $coreHIndexChainSql
      SELECT est AS core_number, CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(min(node) AS BIGINT) AS min_node, CAST(max(node) AS BIGINT) AS max_node,
             ((SELECT sum(est) FROM h${R - 1}) = (SELECT sum(est) FROM h$R)) AS converged
      FROM h$R GROUP BY est ORDER BY est"""
  }

  private def coreDecompSql: String =
    s"""
      WITH $coreHIndexChainSql
      SELECT least(est, 4) AS core_number, CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(min(node) AS BIGINT) AS min_node, CAST(max(node) AS BIGINT) AS max_node,
             ((SELECT sum(est) FROM h${coreHIndexRounds - 1}) =
              (SELECT sum(est) FROM h$coreHIndexRounds)) AS converged
      FROM h$coreHIndexRounds GROUP BY 1 ORDER BY core_number"""

  /** llm_bpe_train: the Spark side loops 6 merge rounds over the word
    * vocabulary; the oracle unrolls the same 6 rounds as CTE stages.
    * Each stage is (a) a weighted adjacent-pair census over the current
    * tokenization, (b) the argmax pair under the (n DESC, pair ASC)
    * total order, and (c) the greedy left-to-right merge expressed
    * declaratively: matches conflict only in consecutive runs, so the
    * odd-ranked matches inside each maximal run (gaps-and-islands over
    * match positions) are exactly the pairs a sequential BPE scan
    * merges. All intermediates are integers/strings — bit-exact across
    * engines. MATERIALIZED on b/v stages keeps the 6-round chain linear
    * (each v is read by the next round's pair explode AND its merge
    * join; inlined, the tree doubles per round). */
  /** One training stage per round r (pair explode → argmax census →
    * gaps-and-islands greedy merge), shared by the 6-round train/encode
    * oracles and the 32-round deep `llm_bpe_vocab_apply` unroll. */
  private def bpeTrainStages(R: Int): String =
    (1 to R).map { r =>
      s"""t$r AS MATERIALIZED (
         |        SELECT w, wn, p.i AS i, p.t AS t, p.nxt AS nxt
         |        FROM (SELECT w, wn,
         |                     unnest(list_transform(range(1, len(arr) + 1),
         |                       i -> {'i': i, 't': arr[i],
         |                             'nxt': CASE WHEN i < len(arr) THEN arr[i + 1] END})) AS p
         |              FROM (SELECT w, wn, string_split(toks, ' ') AS arr FROM v${r - 1}))),
         |      b$r AS MATERIALIZED (
         |        SELECT pair, n FROM (
         |          SELECT t || ' ' || nxt AS pair, CAST(sum(wn) AS BIGINT) AS n
         |          FROM t$r WHERE nxt IS NOT NULL GROUP BY 1)
         |        ORDER BY n DESC, pair LIMIT 1),
         |      m$r AS (
         |        SELECT w, wn, i, t, nxt,
         |               (t = string_split((SELECT pair FROM b$r), ' ')[1] AND
         |                nxt = string_split((SELECT pair FROM b$r), ' ')[2]) AS mm
         |        FROM t$r),
         |      k$r AS MATERIALIZED (
         |        SELECT w, i FROM (
         |          SELECT w, i, row_number() OVER (PARTITION BY w, isl ORDER BY i) AS rnk
         |          FROM (SELECT w, i,
         |                       i - row_number() OVER (PARTITION BY w ORDER BY i) AS isl
         |                FROM m$r WHERE mm))
         |        WHERE rnk % 2 = 1),
         |      v$r AS MATERIALIZED (
         |        SELECT m.w AS w, m.wn AS wn,
         |               string_agg(CASE WHEN k.i IS NOT NULL THEN m.t || m.nxt ELSE m.t END,
         |                          ' ' ORDER BY m.i) AS toks
         |        FROM m$r m
         |        LEFT JOIN k$r k ON m.w = k.w AND m.i = k.i
         |        LEFT JOIN k$r g ON m.w = g.w AND m.i = g.i + 1
         |        WHERE g.i IS NULL
         |        GROUP BY m.w, m.wn)""".stripMargin
    }.mkString(",\n      ")

  private def bpeTrainSql: String = {
    val R = 6
    val stages = bpeTrainStages(R)
    val out = (1 to R).map(r => s"SELECT $r AS r, pair, n FROM b$r").mkString(" UNION ALL ")
    s"""
      WITH v0 AS MATERIALIZED (
        SELECT w, CAST(count(*) AS BIGINT) AS wn,
               trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS toks
        FROM (SELECT unnest(string_split(text, ' ')) AS w
              FROM documents WHERE doc_id < 4000)
        WHERE w <> '' GROUP BY w),
      $stages
      SELECT CAST(r AS BIGINT) AS round, pair, n FROM ($out) ORDER BY round"""
  }

  /** llm_bpe_encode: replay the 6 training stages (identical to
    * llm_bpe_train's unroll — each b$r is that round's argmax pair),
    * then apply each b$r in rank order to the PROBE slice's word state
    * with the same gaps-and-islands greedy-merge window the Spark
    * `bpeMergeStep` runs. Two engines, one merge list, one encoding. */
  private def bpeEncodeSql: String = bpeEncodeSqlFor(
    6,
    """SELECT w, CAST(count(*) AS BIGINT) AS wn,
               trim(regexp_replace(w, '(.)', '\1 ', 'g')) AS toks
        FROM (SELECT unnest(string_split(text, ' ')) AS w
              FROM documents WHERE doc_id < 4000)
        WHERE w <> '' GROUP BY w""")

  /** llm_bpe_deep_encode: the 32-round twin — train on the rich stream,
    * apply all 32 merges to the SAME probe slice the 6-round encode
    * grades, so fertility is comparable across depths. */
  private def bpeDeepEncodeSql: String = bpeEncodeSqlFor(
    32,
    """SELECT w, CAST(count(*) AS BIGINT) AS wn,
               trim(regexp_replace(w, '(.)', '\1 ', 'g')) AS toks
        FROM (SELECT unnest(string_split(p_name, ' ')) AS w FROM part
              UNION ALL
              SELECT unnest(string_split(text, ' ')) AS w
              FROM documents WHERE doc_id < 4000)
        WHERE w <> '' GROUP BY w""")

  /** The two-blocking graph + 3 LPA rounds + per-node Louvain gain
    * table (`g`), shared by the graph_louvain_one_level readout and the
    * graph_louvain_apply before/after modularity comparison. */
  private def louvainCtes: String = """docs AS (SELECT doc_id, source, lang, n_chars FROM documents WHERE doc_id < 1200),
      blocks AS (
        SELECT doc_id AS u, concat_ws('|', 's', source, CAST(n_chars // 100 AS VARCHAR)) AS bk FROM docs
        UNION ALL
        SELECT doc_id AS u, concat_ws('|', 'l', lang, CAST(n_chars // 50 AS VARCHAR)) AS bk FROM docs),
      edges AS (
        SELECT DISTINCT a.u AS u, b.u AS v
        FROM blocks a JOIN blocks b USING (bk) WHERE a.u < b.u),
      adj AS MATERIALIZED (SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges),
      l0 AS (SELECT DISTINCT u AS node, u AS label FROM adj),
      n1 AS (SELECT a.u AS node, l.label, count(*) AS c
             FROM adj a JOIN l0 l ON a.v = l.node GROUP BY 1, 2),
      l1 AS (SELECT node, label FROM (
               SELECT node, label, row_number() OVER (PARTITION BY node
                 ORDER BY c DESC, label) AS rn FROM n1) WHERE rn = 1),
      n2 AS (SELECT a.u AS node, l.label, count(*) AS c
             FROM adj a JOIN l1 l ON a.v = l.node GROUP BY 1, 2),
      l2 AS (SELECT node, label FROM (
               SELECT node, label, row_number() OVER (PARTITION BY node
                 ORDER BY c DESC, label) AS rn FROM n2) WHERE rn = 1),
      n3 AS (SELECT a.u AS node, l.label, count(*) AS c
             FROM adj a JOIN l2 l ON a.v = l.node GROUP BY 1, 2),
      l3 AS MATERIALIZED (SELECT node, label FROM (
               SELECT node, label, row_number() OVER (PARTITION BY node
                 ORDER BY c DESC, label) AS rn FROM n3) WHERE rn = 1),
      deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY 1),
      twom AS (SELECT CAST(sum(deg) AS BIGINT) AS twom FROM deg),
      tot AS (SELECT l.label AS c, CAST(sum(d.deg) AS BIGINT) AS tot
              FROM l3 l JOIN deg d USING (node) GROUP BY 1),
      kic AS (SELECT a.u AS node, l.label AS c, CAST(count(*) AS BIGINT) AS k_ic
              FROM adj a JOIN l3 l ON a.v = l.node GROUP BY 1, 2),
      base AS (SELECT k.node, k.c, k.k_ic, cur.label AS cur
               FROM kic k JOIN l3 cur USING (node)),
      own AS (SELECT node, k_ic AS k_icur FROM base WHERE c = cur),
      g AS (
        SELECT b.node, b.cur, b.c, b.k_ic, coalesce(o.k_icur, 0) AS k_icur, d.deg,
               t.twom * (b.k_ic - coalesce(o.k_icur, 0))
                 - d.deg * (tc.tot - tu.tot + d.deg) AS gain_scaled
        FROM base b LEFT JOIN own o USING (node)
        JOIN deg d USING (node)
        JOIN tot tc ON tc.c = b.c
        JOIN tot tu ON tu.c = b.cur
        CROSS JOIN twom t
        WHERE b.c <> b.cur)"""

  /** One Louvain sweep's CTE block for the fixpoint unroll
    * (graph_louvain_converged): moves + post-move labeling + that
    * labeling's exact Q numerator. Sweep 1 reads the gain table `g`
    * that `louvainCtes` already builds against l3; sweeps r ≥ 2 re-run
    * the full gain chain against lab{r-1}. An empty moves$r makes
    * lab$r ≡ lab{r-1} (and q$r ≡ q{r-1}) — exactly the engine's
    * zero-move terminal sweep semantics. */
  private def louvainSweep(r: Int): String = {
    val labIn = if (r == 1) "l3" else s"lab${r - 1}"
    val gName = if (r == 1) "g" else s"g$r"
    val gainCtes = if (r == 1) "" else s"""tot$r AS (SELECT l.label AS c, CAST(sum(d.deg) AS BIGINT) AS tot
              FROM $labIn l JOIN deg d USING (node) GROUP BY 1),
      kic$r AS (SELECT a.u AS node, l.label AS c, CAST(count(*) AS BIGINT) AS k_ic
              FROM adj a JOIN $labIn l ON a.v = l.node GROUP BY 1, 2),
      base$r AS (SELECT k.node, k.c, k.k_ic, cur.label AS cur
               FROM kic$r k JOIN $labIn cur USING (node)),
      own$r AS (SELECT node, k_ic AS k_icur FROM base$r WHERE c = cur),
      g$r AS (
        SELECT b.node, b.cur, b.c,
               t.twom * (b.k_ic - coalesce(o.k_icur, 0))
                 - d.deg * (tc.tot - tu.tot + d.deg) AS gain_scaled
        FROM base$r b LEFT JOIN own$r o USING (node)
        JOIN deg d USING (node)
        JOIN tot$r tc ON tc.c = b.c
        JOIN tot$r tu ON tu.c = b.cur
        CROSS JOIN twom t
        WHERE b.c <> b.cur),
      """
    s"""${gainCtes}moves$r AS MATERIALIZED (
        SELECT node, c AS to_c
        FROM (SELECT *, row_number() OVER (PARTITION BY node
                ORDER BY gain_scaled DESC, c) AS rn FROM $gName)
        WHERE rn = 1 AND gain_scaled > 0),
      lab$r AS MATERIALIZED (
        SELECT l.node, coalesce(m.to_c, l.label) AS label
        FROM $labIn l LEFT JOIN moves$r m USING (node)),
      q$r AS (
        SELECT CAST(sum(deg_sum) * sum(in_edges) - sum(deg_sum * deg_sum) AS BIGINT) AS q
        FROM (SELECT lu.label AS community, CAST(count(*) AS BIGINT) AS deg_sum,
                     CAST(count(*) FILTER (WHERE lu.label = lv.label) AS BIGINT) AS in_edges
              FROM adj a JOIN lab$r lu ON a.u = lu.node JOIN lab$r lv ON a.v = lv.node
              GROUP BY 1))"""
  }

  /** One WEIGHTED Louvain sweep on the contracted graph `cadj`
    * (u, v, w — symmetric, self-loops carry each community's internal
    * mass) for the graph_louvain_two_level unroll. Same gain algebra as
    * `louvainSweep` with counts replaced by weight sums; k_ic excludes
    * self-loop rows (a super-node's own loop moves with it and cancels
    * out of every gain difference), deg/tot include them — mirroring
    * the engine's `louvainMovesWeightedOn`. */
  private def louvainWeightedSweep(r: Int): String = louvainWeightedSweepP("c", r)

  /** Prefix-parameterized weighted sweep (round 15): the dendrogram
    * unroll runs the same sweep chain on each contracted level, so the
    * CTE namespace takes the level prefix — `p`adj/`p`deg are the
    * level's contracted graph, `p`l0 its identity seed. Prefix "c"
    * reproduces the two-level unroll's names verbatim. */
  private def louvainWeightedSweepP(p: String, r: Int): String = {
    val labIn = if (r == 1) s"${p}l0" else s"${p}l${r - 1}"
    s"""${p}tot$r AS (SELECT l.label AS c, CAST(sum(d.deg) AS BIGINT) AS tot
              FROM $labIn l JOIN ${p}deg d USING (node) GROUP BY 1),
      ${p}kic$r AS (SELECT a.u AS node, l.label AS c, CAST(sum(a.w) AS BIGINT) AS k_ic
              FROM ${p}adj a JOIN $labIn l ON a.v = l.node WHERE a.u <> a.v GROUP BY 1, 2),
      ${p}base$r AS (SELECT k.node, k.c, k.k_ic, cur.label AS cur
               FROM ${p}kic$r k JOIN $labIn cur USING (node)),
      ${p}own$r AS (SELECT node, k_ic AS k_icur FROM ${p}base$r WHERE c = cur),
      ${p}g$r AS (
        SELECT b.node, b.cur, b.c,
               t.twom * (b.k_ic - coalesce(o.k_icur, 0))
                 - d.deg * (tc.tot - tu.tot + d.deg) AS gain_scaled
        FROM ${p}base$r b LEFT JOIN ${p}own$r o USING (node)
        JOIN ${p}deg d USING (node)
        JOIN ${p}tot$r tc ON tc.c = b.c
        JOIN ${p}tot$r tu ON tu.c = b.cur
        CROSS JOIN twom t
        WHERE b.c <> b.cur),
      ${p}moves$r AS MATERIALIZED (
        SELECT node, c AS to_c
        FROM (SELECT *, row_number() OVER (PARTITION BY node
                ORDER BY gain_scaled DESC, c) AS rn FROM ${p}g$r)
        WHERE rn = 1 AND gain_scaled > 0),
      ${p}l$r AS MATERIALIZED (
        SELECT l.node, coalesce(m.to_c, l.label) AS label
        FROM $labIn l LEFT JOIN ${p}moves$r m USING (node)),
      ${p}q$r AS (
        SELECT CAST(sum(deg_sum) * sum(in_w) - sum(deg_sum * deg_sum) AS BIGINT) AS q
        FROM (SELECT lu.label AS community, CAST(sum(a.w) AS BIGINT) AS deg_sum,
                     CAST(coalesce(sum(a.w) FILTER (WHERE lu.label = lv.label), 0) AS BIGINT) AS in_w
              FROM ${p}adj a JOIN ${p}l$r lu ON a.u = lu.node JOIN ${p}l$r lv ON a.v = lv.node
              GROUP BY 1))"""
  }

  /** One dendrogram level's contraction + seed + sweep-0 census CTEs:
    * contract `srcAdj` by `srcLab` (inter-community weights aggregated,
    * internal mass as self-loops), identity seed, exact Q of the seed
    * partition (= the source level's terminal Q — contraction
    * preserves Q). */
  private def louvainContractionCtes(p: String, srcAdj: String, srcLab: String): String =
    s"""${p}adj AS MATERIALIZED (
        SELECT lu.label AS u, lv.label AS v, CAST(sum(a.w) AS BIGINT) AS w
        FROM $srcAdj a JOIN $srcLab lu ON a.u = lu.node JOIN $srcLab lv ON a.v = lv.node
        GROUP BY 1, 2),
      ${p}deg AS MATERIALIZED (
        SELECT u AS node, CAST(sum(w) AS BIGINT) AS deg FROM ${p}adj GROUP BY 1),
      ${p}l0 AS (SELECT node, node AS label FROM ${p}deg),
      ${p}q0 AS (
        SELECT CAST(sum(deg_sum) * sum(in_w) - sum(deg_sum * deg_sum) AS BIGINT) AS q
        FROM (SELECT lu.label AS community, CAST(sum(a.w) AS BIGINT) AS deg_sum,
                     CAST(coalesce(sum(a.w) FILTER (WHERE lu.label = lv.label), 0) AS BIGINT) AS in_w
              FROM ${p}adj a JOIN ${p}l0 lu ON a.u = lu.node JOIN ${p}l0 lv ON a.v = lv.node
              GROUP BY 1))"""

  /** The navigable-graph BUILD CTE chain shared by `llm_sim_hnsw_topk`
    * and the round-15 `llm_sim_hnsw_tune` sweep: LSH-ring ∪ cell-ring
    * candidate pairs → per-node top-M by rounded cosine → symmetrized
    * (`gsym`), plus the probe set `p` and the brute-force `truth` at
    * depth 10. Mirrors the engine's `LlmExtra.hnswGraph` exactly
    * (single-window ring ranks here — the oracle corpus is graded-SF
    * sized; the engine's banded rank is position-identical). */
  private def hnswGraphCtes: String = """uvals AS (
        SELECT i,
               ((CAST(('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 16)) AS UBIGINT) >> 11)::DOUBLE
                / 9007199254740992.0) * 2.0 - 1.0 AS u
        FROM range(16384) t(i)),
      comp AS (
        SELECT c.pi, c.d, u0.u + u1.u + u2.u + u3.u AS v
        FROM (SELECT pi, d, (pi * 64 + d) * 4 AS o
              FROM range(64) p(pi), range(64) dd(d)) c
        JOIN uvals u0 ON u0.i = c.o
        JOIN uvals u1 ON u1.i = c.o + 1
        JOIN uvals u2 ON u2.i = c.o + 2
        JOIN uvals u3 ON u3.i = c.o + 3),
      plane AS (SELECT pi, list(v ORDER BY d) AS p FROM comp GROUP BY pi),
      n AS MATERIALIZED (
        SELECT vec_id, embedding,
               sqrt((SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                     FROM unnest(embedding) AS u(x))) AS nrm
        FROM embeddings),
      vb AS (
        SELECT e.vec_id, pl.pi // 8 AS tb, pl.pi % 8 AS bit,
               CASE WHEN (SELECT sum(a * b) FROM (
                            SELECT unnest(pl.p) AS a,
                                   CAST(unnest(e.embedding) AS DOUBLE) AS b)) >= 0
                    THEN 1 ELSE 0 END AS s
        FROM n e CROSS JOIN plane pl),
      bkts AS (
        SELECT vec_id, tb, tb * 65536 + CAST(sum(s * (1 << CAST(bit AS INT))) AS BIGINT) AS bkt
        FROM vb GROUP BY vec_id, tb),
      bkpos AS (
        SELECT vec_id, bkt,
               row_number() OVER (PARTITION BY bkt ORDER BY vec_id) AS pos,
               count(*) OVER (PARTITION BY bkt) AS sz
        FROM bkts),
      lshp AS (
        SELECT a.vec_id AS u, b.vec_id AS nb
        FROM (SELECT vec_id, bkt, pos, sz, unnest(range(1, 9)) AS d FROM bkpos) a
        JOIN bkpos b
          ON a.bkt = b.bkt AND a.d < a.sz
         AND b.pos = ((a.pos - 1 + a.d) % a.sz) + 1),
      cents AS (SELECT vec_id AS cell, embedding AS cv FROM n WHERE vec_id < 16),
      cscored AS MATERIALIZED (
        SELECT e.vec_id, c.cell,
               (SELECT sum(a * b) FROM (
                  SELECT CAST(unnest(e.embedding) AS DOUBLE) AS a,
                         CAST(unnest(c.cv) AS DOUBLE) AS b)) AS d
        FROM n e CROSS JOIN cents c),
      member AS (
        SELECT vec_id, cell FROM (
          SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell) AS rr
          FROM cscored) WHERE rr <= 2),
      cpos AS (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY cell ORDER BY vec_id) AS pos,
               count(*) OVER (PARTITION BY cell) AS sz
        FROM member),
      cellp AS (
        SELECT a.vec_id AS u, b.vec_id AS nb
        FROM (SELECT vec_id, cell, pos, sz, unnest(range(1, 33)) AS d FROM cpos) a
        JOIN cpos b
          ON a.cell = b.cell AND a.d < a.sz
         AND b.pos = ((a.pos - 1 + a.d) % a.sz) + 1),
      upairs AS MATERIALIZED (
        SELECT DISTINCT u, nb FROM (
          SELECT u, nb FROM lshp UNION ALL SELECT u, nb FROM cellp
          UNION ALL SELECT nb AS u, u AS nb FROM lshp
          UNION ALL SELECT nb AS u, u AS nb FROM cellp)),
      ep AS (
        SELECT pr.u, pr.nb,
               round((SELECT sum(a * b) FROM (
                        SELECT CAST(unnest(un.embedding) AS DOUBLE) AS a,
                               CAST(unnest(nn.embedding) AS DOUBLE) AS b))
                     / (un.nrm * nn.nrm), 4) AS ecos
        FROM upairs pr JOIN n un ON un.vec_id = pr.u
                       JOIN n nn ON nn.vec_id = pr.nb),
      gtop AS (
        SELECT u, nb FROM (
          SELECT u, nb, row_number() OVER (PARTITION BY u ORDER BY ecos DESC, nb) AS rr
          FROM ep) WHERE rr <= 10),
      gsym AS MATERIALIZED (
        SELECT u, nb FROM gtop UNION SELECT nb AS u, u AS nb FROM gtop),
      p AS (SELECT vec_id AS pid, embedding AS pe, nrm AS pnorm FROM n WHERE vec_id < 10),
      bf AS (
        SELECT p.pid, c.vec_id AS nid,
               round((SELECT sum(a * b) FROM (
                        SELECT CAST(unnest(p.pe) AS DOUBLE) AS a,
                               CAST(unnest(c.embedding) AS DOUBLE) AS b))
                     / (p.pnorm * c.nrm), 4) AS cos
        FROM p CROSS JOIN n c WHERE c.vec_id <> p.pid),
      truth AS (
        SELECT pid, nid, rnk FROM (
          SELECT pid, nid, row_number() OVER (PARTITION BY pid ORDER BY cos DESC, nid) AS rnk
          FROM bf) WHERE rnk <= 10)"""

  /** One beam search unrolled over the shared graph: self-entry scored
    * (`{pfx}vis0`), then r hops of beam-`b` expand / NOT-EXISTS-dedup /
    * score / accumulate — the engine's loop, hop per CTE block. Ends at
    * `{pfx}vis{r}` plus the ranked `{pfx}appr`. */
  private def hnswSearchCtes(pfx: String, b: Int, r: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""${pfx}vis0 AS MATERIALIZED (
        SELECT g.u AS pid, g.nb AS nid,
               round((SELECT sum(a * b) FROM (
                        SELECT CAST(unnest(p.pe) AS DOUBLE) AS a,
                               CAST(unnest(nn.embedding) AS DOUBLE) AS b))
                     / (p.pnorm * nn.nrm), 4) AS cos
        FROM gsym g JOIN p ON p.pid = g.u JOIN n nn ON nn.vec_id = g.nb)"""
    for (i <- 1 to r) {
      sb ++= s""",
      ${pfx}f${i - 1} AS (
        SELECT pid, nid FROM (
          SELECT pid, nid, row_number() OVER (PARTITION BY pid ORDER BY cos DESC, nid) AS rr
          FROM ${pfx}vis${i - 1}) WHERE rr <= $b),
      ${pfx}ex$i AS (
        SELECT DISTINCT f.pid, g.nb AS nid
        FROM ${pfx}f${i - 1} f JOIN gsym g ON g.u = f.nid
        WHERE g.nb <> f.pid
          AND NOT EXISTS (SELECT 1 FROM ${pfx}vis${i - 1} v WHERE v.pid = f.pid AND v.nid = g.nb)),
      ${pfx}sc$i AS (
        SELECT e.pid, e.nid,
               round((SELECT sum(a * b) FROM (
                        SELECT CAST(unnest(p.pe) AS DOUBLE) AS a,
                               CAST(unnest(nn.embedding) AS DOUBLE) AS b))
                     / (p.pnorm * nn.nrm), 4) AS cos
        FROM ${pfx}ex$i e JOIN p ON p.pid = e.pid JOIN n nn ON nn.vec_id = e.nid),
      ${pfx}vis$i AS MATERIALIZED (
        SELECT pid, nid, cos FROM ${pfx}vis${i - 1} UNION ALL SELECT pid, nid, cos FROM ${pfx}sc$i)"""
    }
    sb ++= s""",
      ${pfx}appr AS (
        SELECT pid, nid,
               row_number() OVER (PARTITION BY pid ORDER BY cos DESC, nid) AS ra
        FROM ${pfx}vis$r)"""
    sb.toString
  }

  /** One tune-sweep config row: exact aggregate hits over the truth
    * join plus the visited budget, ratios over sums. */
  private def hnswTuneRow(pfx: String, b: Int, r: Int): String = s"""
        SELECT CAST($b AS BIGINT) AS beam_b, CAST($r AS BIGINT) AS hops_r,
               (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_probes,
               (SELECT CAST(count(*) AS BIGINT) FROM ${pfx}vis$r) AS n_visited,
               CAST(count(*) FILTER (WHERE t.rnk <= 5 AND a.ra <= 5) AS BIGINT) AS n_hit_5,
               CAST(count(*) FILTER (WHERE a.ra <= 10) AS BIGINT) AS n_hit_10,
               ${N.ratio("count(*) FILTER (WHERE t.rnk <= 5 AND a.ra <= 5)",
                         "count(*) FILTER (WHERE t.rnk <= 5)", 4)} AS recall_at_5,
               ${N.ratio("count(*) FILTER (WHERE a.ra <= 10)", "count(*)", 4)} AS recall_at_10
        FROM truth t LEFT JOIN ${pfx}appr a ON a.pid = t.pid AND a.nid = t.nid"""

  /** The shared ANN-evaluation CTE chain (llm_sim_recall /
    * llm_sim_recall_at_k): one norms pass, the brute-force truth and
    * the IVF candidate search both ranked to `depth` with rnk kept, so
    * prefix recalls derive from ONE pass per side. */
  private def annRecallCtes(depth: Int): String = s"""n AS MATERIALIZED (
        SELECT vec_id, embedding,
               sqrt((SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                     FROM unnest(embedding) AS u(x))) AS nrm
        FROM embeddings),
      p AS (SELECT vec_id AS pid, embedding AS pe, nrm AS pnorm FROM n WHERE vec_id < 10),
      bf_pairs AS (
        SELECT p.pid AS pid, c.vec_id AS nid,
               round((SELECT sum(a * b) FROM (
                        SELECT CAST(unnest(p.pe) AS DOUBLE) AS a,
                               CAST(unnest(c.embedding) AS DOUBLE) AS b))
                     / (p.pnorm * c.nrm), 4) AS cos
        FROM p CROSS JOIN n c WHERE c.vec_id <> p.pid),
      truth AS (
        SELECT pid, nid, rnk FROM (
          SELECT pid, nid, row_number() OVER (PARTITION BY pid ORDER BY cos DESC, nid) AS rnk
          FROM bf_pairs) WHERE rnk <= $depth),
      cents AS (SELECT vec_id AS cell, embedding AS cv FROM n WHERE vec_id < 16),
      scored AS (
        SELECT e.vec_id, c.cell,
               (SELECT sum(a * b) FROM (
                  SELECT CAST(unnest(e.embedding) AS DOUBLE) AS a,
                         CAST(unnest(c.cv) AS DOUBLE) AS b)) AS d
        FROM n e CROSS JOIN cents c),
      assigned AS (
        SELECT vec_id, cell FROM (
          SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell) AS r
          FROM scored) WHERE r = 1),
      probecells AS (
        SELECT vec_id AS pid, cell FROM (
          SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell) AS r
          FROM scored WHERE vec_id < 10) WHERE r <= 2),
      cand AS (
        SELECT DISTINCT p.pid, a.vec_id AS nid
        FROM assigned a JOIN probecells p ON a.cell = p.cell
        WHERE a.vec_id <> p.pid),
      iv_pairs AS (
        SELECT cand.pid, cand.nid,
               round((SELECT sum(a * b) FROM (
                        SELECT CAST(unnest(pp.embedding) AS DOUBLE) AS a,
                               CAST(unnest(nn.embedding) AS DOUBLE) AS b))
                     / (pp.nrm * nn.nrm), 4) AS cos
        FROM cand JOIN n pp ON pp.vec_id = cand.pid
                  JOIN n nn ON nn.vec_id = cand.nid),
      approx AS (
        SELECT pid, nid, rnk FROM (
          SELECT pid, nid, row_number() OVER (PARTITION BY pid ORDER BY cos DESC, nid) AS rnk
          FROM iv_pairs) WHERE rnk <= $depth)"""

  /** The R apply stages shared by the encode oracles and the corpus
    * fertility oracle: each stage re-runs the gaps-and-islands greedy
    * merge of that round's trained argmax pair (b$r) over the APPLY word
    * state e${"$"}{r-1} → e$r. */
  private def bpeApplyStages(R: Int): String =
    (1 to R).map { r =>
      s"""et$r AS MATERIALIZED (
         |        SELECT w, wn, p.i AS i, p.t AS t, p.nxt AS nxt
         |        FROM (SELECT w, wn,
         |                     unnest(list_transform(range(1, len(arr) + 1),
         |                       i -> {'i': i, 't': arr[i],
         |                             'nxt': CASE WHEN i < len(arr) THEN arr[i + 1] END})) AS p
         |              FROM (SELECT w, wn, string_split(toks, ' ') AS arr FROM e${r - 1}))),
         |      em$r AS (
         |        SELECT w, wn, i, t, nxt,
         |               (t = string_split((SELECT pair FROM b$r), ' ')[1] AND
         |                nxt = string_split((SELECT pair FROM b$r), ' ')[2]) AS mm
         |        FROM et$r),
         |      ek$r AS MATERIALIZED (
         |        SELECT w, i FROM (
         |          SELECT w, i, row_number() OVER (PARTITION BY w, isl ORDER BY i) AS rnk
         |          FROM (SELECT w, i,
         |                       i - row_number() OVER (PARTITION BY w ORDER BY i) AS isl
         |                FROM em$r WHERE mm))
         |        WHERE rnk % 2 = 1),
         |      e$r AS MATERIALIZED (
         |        SELECT m.w AS w, m.wn AS wn,
         |               string_agg(CASE WHEN k.i IS NOT NULL THEN m.t || m.nxt ELSE m.t END,
         |                          ' ' ORDER BY m.i) AS toks
         |        FROM em$r m
         |        LEFT JOIN ek$r k ON m.w = k.w AND m.i = k.i
         |        LEFT JOIN ek$r g ON m.w = g.w AND m.i = g.i + 1
         |        WHERE g.i IS NULL
         |        GROUP BY m.w, m.wn)""".stripMargin
    }.mkString(",\n      ")

  private def bpeEncodeSqlFor(R: Int, trainV0Body: String): String = {
    s"""
      WITH v0 AS MATERIALIZED (
        $trainV0Body),
      ${bpeTrainStages(R)},
      e0 AS MATERIALIZED (
        SELECT w, CAST(count(*) AS BIGINT) AS wn,
               trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS toks
        FROM (SELECT unnest(string_split(text, ' ')) AS w
              FROM documents WHERE doc_id % 7 = 3)
        WHERE w <> '' GROUP BY w),
      ${bpeApplyStages(R)}
      SELECT w, wn, toks,
             CAST(len(string_split(toks, ' ')) AS BIGINT) AS n_toks
      FROM e$R ORDER BY wn DESC, w LIMIT 30"""
  }

  /** llm_bpe_corpus_fertility: 32 rich-training stages, then the apply
    * stages over the WHOLE-corpus word census (every doc_id — no probe
    * filter), joined to the per-(lang, word) census for the per-language
    * fertility and compression readout. Same half-up integer ratio as
    * the engine's Num.ratio. */
  private def bpeCorpusFertilitySql: String = {
    val R = 32
    s"""
      WITH v0 AS MATERIALIZED (
        SELECT w, CAST(count(*) AS BIGINT) AS wn,
               trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS toks
        FROM (SELECT unnest(string_split(p_name, ' ')) AS w FROM part
              UNION ALL
              SELECT unnest(string_split(text, ' ')) AS w
              FROM documents WHERE doc_id < 4000)
        WHERE w <> '' GROUP BY w),
      ${bpeTrainStages(R)},
      e0 AS MATERIALIZED (
        SELECT w, CAST(count(*) AS BIGINT) AS wn,
               trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS toks
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE w <> '' GROUP BY w),
      ${bpeApplyStages(R)},
      vocab AS (
        SELECT w, CAST(len(string_split(toks, ' ')) AS BIGINT) AS n_toks
        FROM e$R),
      lang_words AS (
        SELECT lang, w, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE w <> '' GROUP BY lang, w),
      agg AS (
        SELECT lang,
               CAST(sum(cnt) AS BIGINT) AS n_words,
               CAST(sum(cnt * n_toks) AS BIGINT) AS n_tokens,
               CAST(sum(cnt * len(w)) AS BIGINT) AS n_chars
        FROM lang_words JOIN vocab USING (w) GROUP BY lang)
      SELECT lang, n_words, n_tokens, n_chars,
             ${N.ratio("n_tokens", "n_words", 4)} AS fertility,
             ${N.ratio("n_chars", "n_tokens", 4)} AS chars_per_token
      FROM agg ORDER BY lang"""
  }

  /** llm_bpe_vocab_apply: the DEEP unroll — 32 training stages over the
    * richer p_name ∪ documents word stream, reading out the final
    * tokenized vocab (each stage's argmax feeds every later stage, so a
    * hash match certifies all 32 merges). */
  private def bpeVocabApplySql: String = {
    val R = 32
    s"""
      WITH v0 AS MATERIALIZED (
        SELECT w, CAST(count(*) AS BIGINT) AS wn,
               trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS toks
        FROM (SELECT unnest(string_split(p_name, ' ')) AS w FROM part
              UNION ALL
              SELECT unnest(string_split(text, ' ')) AS w
              FROM documents WHERE doc_id < 4000)
        WHERE w <> '' GROUP BY w),
      ${bpeTrainStages(R)}
      SELECT w, wn, toks,
             CAST(len(string_split(toks, ' ')) AS BIGINT) AS n_toks
      FROM v$R ORDER BY wn DESC, w LIMIT 30"""
  }

  /** graph_node2vec_biased: the 4 biased steps unrolled as CTE stages.
    * Each stage joins the previous state to the adjacency (candidates),
    * LEFT-joins the (prev, v) edge marker for the distance-1 weight
    * class, and picks by integer inverse-CDF over the per-walker
    * cumulative weight — the same windows the Spark side runs. */
  /** The similarity-graph construction shared by every walk oracle
    * (same blocks → edges → symmetric adjacency the engine's `symAdj`
    * builds). */
  /** census_suppression_fixpoint: 3 unrolled (row pass, column pass)
    * rounds over the cell frame — each pass re-counts suppressed cells
    * per margin and adds the smallest unsuppressed cell to any margin
    * holding exactly one, stamping the adding round. */
  private def suppressFixpointSql: String = {
    def pass(from: String, to: String, margin: String, other: String, r: Int): String =
      s"""p$to AS (
        SELECT *, count(*) FILTER (supp) OVER (PARTITION BY $margin) AS ns,
               row_number() OVER (PARTITION BY $margin ORDER BY supp, n, $other) AS rk
        FROM $from),
      s$to AS (
        SELECT n_name, segment, n,
               supp OR (ns = 1 AND NOT supp AND rk = 1) AS supp,
               CASE WHEN ns = 1 AND NOT supp AND rk = 1 THEN CAST($r AS BIGINT) ELSE rnd END AS rnd
        FROM p$to)"""
    val passes = (1 to 3).flatMap { r =>
      val a = 2 * r - 1; val b = 2 * r
      Seq(pass(s"s${a - 1}", s"$a", "n_name", "segment", r),
        pass(s"s$a", s"$b", "segment", "n_name", r))
    }.mkString(",\n      ")
    s"""
      WITH cells AS (
        SELECT n.n_name, c.c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2),
      s0 AS (
        SELECT n_name, segment, n, n < 5 AS supp,
               CASE WHEN n < 5 THEN CAST(0 AS BIGINT) END AS rnd
        FROM cells),
      $passes,
      lone AS (
        SELECT (count(*) FILTER (ns = 1) = 0) AS converged FROM (
          SELECT m, count(*) FILTER (supp) AS ns FROM (
            SELECT 'r|' || n_name AS m, supp FROM s6
            UNION ALL SELECT 'c|' || segment, supp FROM s6) GROUP BY m))
      SELECT s6.n_name, s6.segment,
             CASE WHEN NOT supp THEN n END AS published_n,
             CASE WHEN rnd = 0 THEN 'P' WHEN supp THEN 'C' ELSE 'OK' END AS flag,
             rnd AS supp_round, lone.converged
      FROM s6 CROSS JOIN lone ORDER BY n_name, segment"""
  }

  private def simGraphCtes: String =
    s"""docs AS (SELECT doc_id, source, lang, n_chars FROM documents WHERE doc_id < 1200),
      blocks AS (
        SELECT doc_id AS u, concat_ws('|', 's', source, CAST(n_chars // 100 AS VARCHAR)) AS bk FROM docs
        UNION ALL
        SELECT doc_id AS u, concat_ws('|', 'l', lang, CAST(n_chars // 50 AS VARCHAR)) AS bk FROM docs),
      edges AS (
        SELECT DISTINCT a.u AS u, b.u AS v
        FROM blocks a JOIN blocks b USING (bk) WHERE a.u < b.u),
      adj AS (SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges),
      nodes AS (SELECT DISTINCT u AS node FROM adj)"""

  /** The 4 uniform (md5-argmin) walk stages + the per-stage visit union
    * carrying the step index — shared by graph_random_walk and
    * graph_walk_skipgram. */
  private def uniformWalkCtes: String = {
    val stages = (1 to 4).map { k =>
      s"""s$k AS (SELECT walker, node FROM (
         |        SELECT c.walker, a.v AS node,
         |               row_number() OVER (PARTITION BY c.walker
         |                 ORDER BY md5(c.walker || ':' || $k || ':' || a.v), a.v) AS rn
         |        FROM s${k - 1} c JOIN adj a ON a.u = c.node) WHERE rn = 1)""".stripMargin
    }.mkString(",\n      ")
    s"""s0 AS (SELECT node AS walker, node FROM nodes WHERE node % 17 = 0),
      $stages,
      visits AS (
        SELECT walker, node, 0 AS st FROM s0 UNION ALL SELECT walker, node, 1 FROM s1
        UNION ALL SELECT walker, node, 2 FROM s2 UNION ALL SELECT walker, node, 3 FROM s3
        UNION ALL SELECT walker, node, 4 FROM s4)"""
  }

  private def randomWalkSql: String =
    s"""
      WITH $simGraphCtes,
      $uniformWalkCtes
      SELECT node, CAST(count(*) AS BIGINT) AS n_visits,
             CAST(count(DISTINCT walker) AS BIGINT) AS n_walkers
      FROM visits GROUP BY 1 ORDER BY n_visits DESC, node LIMIT 25"""

  private def walkSkipgramSql: String =
    s"""
      WITH $simGraphCtes,
      $uniformWalkCtes
      SELECT a, b, n_pairs FROM (
        SELECT x.node AS a, y.node AS b, CAST(count(*) AS BIGINT) AS n_pairs
        FROM visits x JOIN visits y
          ON x.walker = y.walker AND abs(x.st - y.st) <= 2 AND x.st <> y.st
        GROUP BY 1, 2)
      ORDER BY n_pairs DESC, a, b LIMIT 25"""

  /** The 4 biased (p/q inverse-CDF) walk stages + step-tagged visit
    * union — shared by graph_node2vec_biased and its skip-gram census. */
  private def biasedWalkCtes: String = {
    val stages = (1 to 4).map { k =>
      s"""c$k AS (
         |        SELECT c.walker, c.node, a.v,
         |               CASE WHEN a.v = c.prev THEN 1
         |                    WHEN nb.u IS NOT NULL THEN 4
         |                    ELSE 2 END AS wt
         |        FROM s${k - 1} c
         |        JOIN adj a ON a.u = c.node
         |        LEFT JOIN adj nb ON nb.u = c.prev AND nb.v = a.v),
         |      s$k AS (
         |        SELECT walker, node AS prev, v AS node FROM (
         |          SELECT walker, node, v,
         |                 row_number() OVER (PARTITION BY walker ORDER BY v) AS rn
         |          FROM (
         |            SELECT walker, node, v, cw,
         |                   CAST(('0x' || substr(md5(walker || ':' || $k || ':n2v'), 1, 15)) AS BIGINT) % tot AS r
         |            FROM (
         |              SELECT walker, node, v, wt,
         |                     sum(wt) OVER (PARTITION BY walker ORDER BY v
         |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         |                     sum(wt) OVER (PARTITION BY walker) AS tot
         |              FROM c$k))
         |          WHERE cw > r)
         |        WHERE rn = 1)""".stripMargin
    }.mkString(",\n      ")
    s"""s0 AS (SELECT node AS walker, node AS prev, node FROM nodes WHERE node % 17 = 0),
      $stages,
      visits AS (
        SELECT walker, node, 0 AS st FROM s0 UNION ALL SELECT walker, node, 1 FROM s1
        UNION ALL SELECT walker, node, 2 FROM s2 UNION ALL SELECT walker, node, 3 FROM s3
        UNION ALL SELECT walker, node, 4 FROM s4)"""
  }

  private def node2vecBiasedSql: String =
    s"""
      WITH $simGraphCtes,
      $biasedWalkCtes
      SELECT node, CAST(count(*) AS BIGINT) AS n_visits,
             CAST(count(DISTINCT walker) AS BIGINT) AS n_walkers
      FROM visits GROUP BY 1 ORDER BY n_visits DESC, node LIMIT 25"""

  private def node2vecSkipgramSql: String =
    s"""
      WITH $simGraphCtes,
      $biasedWalkCtes
      SELECT a, b, n_pairs FROM (
        SELECT x.node AS a, y.node AS b, CAST(count(*) AS BIGINT) AS n_pairs
        FROM visits x JOIN visits y
          ON x.walker = y.walker AND abs(x.st - y.st) <= 2 AND x.st <> y.st
        GROUP BY 1, 2)
      ORDER BY n_pairs DESC, a, b LIMIT 25"""

  /** The PQ training + encode + ADC chain (llm_sim_pq_topk's WITH body
    * through the `adc` CTE), shared with the PQ recall evaluator:
    * per-subspace codebooks by the kmeans-oracle pattern (quantized
    * integer coordinates, exact integer distances, (d2, cid) argmin,
    * floor-averaged updates, 2 unrolled Lloyd rounds), codes for every
    * vector, per-probe distance tables, ADC sums. */
  private def pqAdcCtes: String = """qv AS (
        SELECT vec_id, (pos - 1) // 16 AS sub, pos,
               CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT) AS xq
        FROM (SELECT vec_id, unnest(embedding) AS x,
                     generate_subscripts(embedding, 1) AS pos
              FROM embeddings)),
      c0 AS (SELECT sub, vec_id AS cid, pos, xq AS cq FROM qv WHERE vec_id < 8),
      d1 AS (SELECT q.vec_id, q.sub, c.cid, CAST(sum((q.xq - c.cq) * (q.xq - c.cq)) AS BIGINT) AS d2
             FROM qv q JOIN c0 c ON c.sub = q.sub AND c.pos = q.pos
             GROUP BY q.vec_id, q.sub, c.cid),
      a1 AS (SELECT vec_id, sub, cid FROM (
               SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, cid) AS rn
               FROM d1) WHERE rn = 1),
      c1 AS (SELECT a.sub, a.cid, q.pos, CAST(floor(sum(q.xq)::DOUBLE / count(*)) AS BIGINT) AS cq
             FROM qv q JOIN a1 a ON a.vec_id = q.vec_id AND a.sub = q.sub
             GROUP BY a.sub, a.cid, q.pos),
      d2_ AS (SELECT q.vec_id, q.sub, c.cid, CAST(sum((q.xq - c.cq) * (q.xq - c.cq)) AS BIGINT) AS d2
              FROM qv q JOIN c1 c ON c.sub = q.sub AND c.pos = q.pos
              GROUP BY q.vec_id, q.sub, c.cid),
      a2 AS (SELECT vec_id, sub, cid FROM (
               SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, cid) AS rn
               FROM d2_) WHERE rn = 1),
      c2 AS (SELECT a.sub, a.cid, q.pos, CAST(floor(sum(q.xq)::DOUBLE / count(*)) AS BIGINT) AS cq
             FROM qv q JOIN a2 a ON a.vec_id = q.vec_id AND a.sub = q.sub
             GROUP BY a.sub, a.cid, q.pos),
      df AS (SELECT q.vec_id, q.sub, c.cid, CAST(sum((q.xq - c.cq) * (q.xq - c.cq)) AS BIGINT) AS d2
             FROM qv q JOIN c2 c ON c.sub = q.sub AND c.pos = q.pos
             GROUP BY q.vec_id, q.sub, c.cid),
      codes AS (SELECT vec_id, sub, cid FROM (
                  SELECT vec_id, sub, cid, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, cid) AS rn
                  FROM df) WHERE rn = 1),
      dt AS (SELECT q.vec_id AS pid, q.sub, c.cid,
                    CAST(sum((q.xq - c.cq) * (q.xq - c.cq)) AS BIGINT) AS d
             FROM qv q JOIN c2 c ON c.sub = q.sub AND c.pos = q.pos
             WHERE q.vec_id < 10
             GROUP BY q.vec_id, q.sub, c.cid),
      adc AS (SELECT dt.pid, codes.vec_id AS nid, CAST(sum(dt.d) AS BIGINT) AS adc_d2
              FROM codes JOIN dt ON dt.sub = codes.sub AND dt.cid = codes.cid
              WHERE codes.vec_id <> dt.pid
              GROUP BY dt.pid, codes.vec_id)"""

  val sql: Map[String, String] = Map(
    "graph_pagerank_converged" -> pagerankConvergedSql,
    "graph_core_full" -> coreFullSql,
    "llm_bpe_train" -> bpeTrainSql,
    "llm_bpe_encode" -> bpeEncodeSql,
    "llm_bpe_vocab_apply" -> bpeVocabApplySql,
    "llm_bpe_deep_encode" -> bpeDeepEncodeSql,
    "llm_bpe_corpus_fertility" -> bpeCorpusFertilitySql,
    "scan_parquet_project" -> """
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100""",

    "scan_pushdown_filter" -> """
      SELECT count(*) AS n_rows, round(sum(l_extendedprice), 2) AS sum_price,
             round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_quantity < 25""",

    "filter_predicates" -> s"""
      SELECT ${N.d2(s"SUM(${N.money("l_extendedprice")} * ${N.rate("l_discount")})")} AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""",

    "filter_in_like" -> """
      SELECT p_partkey, p_name, p_brand, p_size
      FROM part
      WHERE p_brand IN ('Brand#1', 'Brand#12', 'Brand#22')
        AND p_name LIKE '%wid%' AND p_name NOT LIKE '%cold%'
      ORDER BY p_partkey""",

    "project_expressions" -> s"""
      SELECT l_orderkey, l_linenumber,
             ${N.d2(s"${N.money("l_extendedprice")} * (1 - ${N.rate("l_discount")})")} AS revenue,
             ${N.d2(s"${N.money("l_extendedprice")} * (1 + ${N.rate("l_tax")})")} AS gross,
             CASE WHEN l_quantity < 10 THEN 'low'
                  WHEN l_quantity < 30 THEN 'mid'
                  ELSE 'high' END AS qty_bucket
      FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 500""",

    "join_inner_hash" -> """
      SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "join_broadcast" -> """
      SELECT p_brand, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand ORDER BY p_brand""",

    "join_left_outer" -> """
      SELECT c_custkey, count(o_orderkey) AS n_orders
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey ORDER BY c_custkey""",

    "join_full_outer" -> """
      SELECT COALESCE(a.key, b.key) AS key,
             CASE WHEN a.key IS NULL THEN 0 ELSE 1 END AS in_a,
             CASE WHEN b.key IS NULL THEN 0 ELSE 1 END AS in_b
      FROM (SELECT DISTINCT c_custkey AS key FROM customer WHERE c_acctbal > 9000) a
      FULL JOIN (SELECT DISTINCT o_custkey AS key FROM orders WHERE o_totalprice > 400000) b
        ON a.key = b.key
      ORDER BY key""",

    "join_semi" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey""",

    "join_anti" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey""",

    "join_cross" -> """
      SELECT r_name, n_name FROM region CROSS JOIN nation
      ORDER BY r_name, n_name""",

    "join_theta_range" -> """
      SELECT p_size, count(*) AS n_pairs, round(sum(l_quantity), 2) AS sum_qty
      FROM (SELECT * FROM lineitem WHERE l_orderkey <= 80) l
      JOIN (SELECT * FROM part WHERE p_size <= 10) p
        ON l.l_quantity BETWEEN p.p_size - 2 AND p.p_size + 2
      GROUP BY p_size ORDER BY p_size""",

    "join_asof" -> """
      SELECT p.event_id AS event_id, p.user_id AS user_id,
             epoch_us(p.ts) AS purchase_us, epoch_us(c.ts) AS last_click_us
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY event_id""",

    // same oracle as join_asof: the custom physical operator must land
    // on identical rows to DuckDB's native ASOF LEFT JOIN
    "join_asof_native" -> """
      SELECT p.event_id AS event_id, p.user_id AS user_id,
             epoch_us(p.ts) AS purchase_us, epoch_us(c.ts) AS last_click_us
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY event_id""",

    // same mirror as stream_interval_join — the custom operator must
    // reproduce the declarative band join exactly
    "join_interval_native" -> s"""
      WITH c AS (SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'),
           p AS (SELECT user_id, ts AS p_ts, value FROM events WHERE event_type = 'purchase')
      SELECT c.user_id AS user_id, count(*) AS n_pairs, ${N.sumMoney("value")} AS sum_value
      FROM c JOIN p ON c.user_id = p.user_id
        AND p.p_ts >= c.click_ts AND p.p_ts <= c.click_ts + INTERVAL 1 HOUR
      GROUP BY c.user_id ORDER BY user_id""",

    // nearest-either-direction, ties to the earlier click
    "join_asof_nearest" -> """
      WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
           c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
      SELECT p.event_id AS event_id, p.user_id AS user_id,
             epoch_us(p.ts) AS purchase_us,
             (SELECT epoch_us(c.ts) FROM c
              WHERE c.user_id = p.user_id
              ORDER BY abs(epoch_us(c.ts) - epoch_us(p.ts)), c.ts
              LIMIT 1) AS nearest_click_us
      FROM p ORDER BY event_id""",

    // correlated-min mirror: forward direction isn't in DuckDB's ASOF
    "join_asof_forward" -> """
      WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
           p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
      SELECT c.event_id AS event_id, c.user_id AS user_id,
             epoch_us(c.ts) AS click_us,
             (SELECT epoch_us(min(p.ts)) FROM p
              WHERE p.user_id = c.user_id AND p.ts >= c.ts) AS next_purchase_us
      FROM c ORDER BY event_id""",

    // correlated-max mirror: DuckDB ASOF has no tolerance clause, so the
    // bounded match is expressed directly
    "join_asof_tolerance" -> """
      WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
           c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
      SELECT p.event_id AS event_id, p.user_id AS user_id,
             epoch_us(p.ts) AS purchase_us,
             (SELECT epoch_us(max(c.ts)) FROM c
              WHERE c.user_id = p.user_id AND c.ts <= p.ts
                AND c.ts >= p.ts - INTERVAL 1 HOUR) AS last_click_us
      FROM p ORDER BY event_id""",

    // observe() is transparent to results — the oracle is the plain aggregate
    "scan_observe_metrics" -> """
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS outlier_cents
      FROM lineitem WHERE l_quantity > 45
      GROUP BY l_returnflag ORDER BY l_returnflag""",

    "cache_shared_scan" -> """
      WITH slice AS (
        SELECT o_orderpriority, o_totalprice FROM orders WHERE o_orderkey % 5 = 0)
      SELECT o_orderpriority, metric, v FROM (
        SELECT o_orderpriority, 'n_orders' AS metric, CAST(count(*) AS DOUBLE) AS v
        FROM slice GROUP BY o_orderpriority
        UNION ALL
        SELECT o_orderpriority, 'total_price' AS metric,
               round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS v
        FROM slice GROUP BY o_orderpriority)
      ORDER BY o_orderpriority, metric""",

    "join_multiway" -> s"""
      SELECT l_orderkey, ${N.d2(s"SUM(${N.money("l_extendedprice")} * (1 - ${N.rate("l_discount")}))")} AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate > TIMESTAMP '1998-01-01'
      GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey LIMIT 10""",

    "join_star_flagship" -> s"""
      SELECT n_name, ${N.d2(s"SUM(${N.money("l_extendedprice")} * (1 - ${N.rate("l_discount")}))")} AS revenue
      FROM region
      JOIN nation ON n_regionkey = r_regionkey
      JOIN customer ON c_nationkey = n_nationkey
      JOIN orders ON o_custkey = c_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY n_name ORDER BY revenue DESC, n_name""",

    // --- sketch verdicts (round 7, exempt-set shrink): the estimate
    // values are engine-specific digests and stay out of the hashed
    // output; the accuracy CONTRACT rides as boolean columns the oracle
    // states as literal TRUE next to exact counts it recomputes. A
    // sketch that undercounts (CMS), returns a wrong-rank element
    // (approx_percentile), or drifts past its error bound (HLL) breaks
    // the hash.
    "agg_approx_distinct" -> """
      SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_exact,
             TRUE AS within_10pct
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "agg_approx_percentile" -> """
      SELECT c_mktsegment, count(*) AS n,
             TRUE AS median_rank_ok, TRUE AS p90_rank_ok
      FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "agg_count_min_sketch" -> """
      WITH k AS (SELECT range AS suppkey FROM range(1, 21)),
      c AS (SELECT l_suppkey AS suppkey, count(*) AS n_exact
            FROM lineitem WHERE l_suppkey BETWEEN 1 AND 20 GROUP BY 1)
      SELECT k.suppkey, coalesce(c.n_exact, 0) AS n_exact,
             TRUE AS est_ge_exact, TRUE AS est_le_bound
      FROM k LEFT JOIN c USING (suppkey) ORDER BY suppkey""",

    "agg_hll_union" -> """
      SELECT * FROM (
        SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_exact,
               count(*) AS n_orders, TRUE AS within_10pct
        FROM orders GROUP BY o_orderpriority
        UNION ALL
        SELECT 'ALL', count(DISTINCT o_custkey), count(*), TRUE FROM orders
      ) ORDER BY o_orderpriority""",

    "agg_hash_groupby" -> s"""
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_base_price,
             ${N.d2(s"SUM(${N.money("l_extendedprice")} * (1 - ${N.rate("l_discount")}))")} AS sum_disc_price,
             ${N.d2(s"SUM(${N.money("l_extendedprice")} * (1 - ${N.rate("l_discount")}) * (1 + ${N.rate("l_tax")}))")} AS sum_charge,
             ${N.avgMoney("l_quantity", 4)} AS avg_qty,
             ${N.avgMoney("l_extendedprice", 4)} AS avg_price,
             ${N.avgMoney("l_discount", 4)} AS avg_disc,
             count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
      GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",

    "agg_distinct_count" -> """
      SELECT c_mktsegment, count(DISTINCT o_custkey) AS n_cust, count(*) AS n_orders
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "agg_grouping_sets" -> """
      SELECT l_returnflag, l_linestatus,
             GROUPING(l_returnflag, l_linestatus) AS gid,
             round(sum(l_quantity), 2) AS sum_qty,
             count(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",

    "agg_rollup" -> """
      SELECT COALESCE(yr, -1) AS yr, COALESCE(mon, -1) AS mon,
             round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
      FROM (SELECT CAST(year(o_orderdate) AS INT) AS yr,
                   CAST(month(o_orderdate) AS INT) AS mon, o_totalprice
            FROM orders)
      GROUP BY ROLLUP(yr, mon)
      ORDER BY yr, mon""",

    "agg_cube" -> """
      SELECT COALESCE(l_returnflag, 'ALL') AS flag, COALESCE(l_linestatus, 'ALL') AS status,
             count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      ORDER BY flag, status""",

    "agg_pivot" -> """
      SELECT o_orderpriority,
             CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
             CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
             CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "agg_having" -> """
      SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
      FROM orders GROUP BY o_orderpriority HAVING count(*) > 100
      ORDER BY o_orderpriority""",

    "agg_stats" -> s"""
      SELECT n_name, round(min(c_acctbal), 2) AS min_bal, round(max(c_acctbal), 2) AS max_bal,
             ${N.avgMoney("c_acctbal", 4)} AS avg_bal, round(stddev_samp(c_acctbal), 2) AS std_bal,
             round(var_samp(c_acctbal), 2) AS var_bal, count(*) AS n
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name""",

    "window_rank" -> """
      SELECT o_custkey, o_orderkey, o_totalprice,
             rank() OVER w AS rnk, dense_rank() OVER w AS drnk
      FROM orders WHERE o_custkey <= 200
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      ORDER BY o_custkey, rnk, o_orderkey""",

    "window_topk_per_group" -> """
      SELECT c_mktsegment, o_orderkey, o_totalprice, rn FROM (
        SELECT c_mktsegment, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY c_mktsegment
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders JOIN customer ON o_custkey = c_custkey)
      WHERE rn <= 3 ORDER BY c_mktsegment, rn""",

    "window_running_sum" -> """
      SELECT o_custkey, o_orderkey,
             round(sum(o_totalprice) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_price
      FROM orders WHERE o_custkey <= 200
      ORDER BY o_custkey, o_orderkey""",

    "window_moving_sum" -> s"""
      SELECT o_custkey, o_orderkey,
             ${N.d2(s"SUM(${N.money("o_totalprice")}) OVER w")} AS mov_sum,
             count(*) OVER w AS n_in_frame
      FROM orders WHERE o_custkey <= 200
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
      ORDER BY o_custkey, o_orderkey""",

    "window_range_frame" -> """
      SELECT o_custkey, o_orderkey, price_l,
             round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY price_l
               RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW), 2) AS range_sum
      FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(floor(o_totalprice) AS BIGINT) AS price_l
            FROM orders WHERE o_custkey <= 200)
      ORDER BY o_custkey, price_l, o_orderkey""",

    "window_lag_lead" -> """
      SELECT user_id, event_id,
             round(value - lag(value, 1) OVER w, 4) AS d_value,
             epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS d_ts_us
      FROM (SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-04')
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, event_id""",

    "window_ntile" -> """
      SELECT c_custkey, c_acctbal,
             ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
      FROM customer WHERE c_custkey < 2000
      ORDER BY c_custkey""",

    "sort_multi_null" -> """
      SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg_nn, c_acctbal
      FROM customer
      ORDER BY seg_nn DESC NULLS LAST, c_custkey
      LIMIT 1000""",

    "topk_global" -> """
      SELECT l_orderkey, l_linenumber, l_extendedprice
      FROM lineitem
      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      LIMIT 20""",

    "set_union" -> """
      SELECT key, count(*) AS n FROM (
        SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION ALL
        SELECT c_custkey AS key FROM customer WHERE c_acctbal > 8000)
      GROUP BY key ORDER BY key""",

    "set_intersect" -> """
      SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING'
      INTERSECT
      SELECT o_custkey AS key FROM orders
      ORDER BY key""",

    "set_except" -> """
      SELECT c_custkey AS key FROM customer
      EXCEPT
      SELECT o_custkey AS key FROM orders
      ORDER BY key""",

    "fn_string" -> """
      SELECT p_partkey,
             upper(p_name) AS name_upper,
             CAST(length(p_name) AS INT) AS name_len,
             substring(p_name, 1, 5) AS name_sub,
             trim(concat(' ', p_name, ' ')) AS name_trim,
             regexp_extract(p_brand, '[0-9]+') AS brand_num,
             concat_ws('-', p_brand, p_type) AS brand_type,
             regexp_replace(p_name, 'a', 'X', 'g') AS name_repl
      FROM part ORDER BY p_partkey LIMIT 200""",

    "fn_date" -> """
      SELECT o_orderkey,
             CAST(year(o_orderdate) AS INT) AS yr,
             CAST(month(o_orderdate) AS INT) AS mon,
             CAST(day(o_orderdate) AS INT) AS dom,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
             CAST(o_orderdate AS DATE) + 30 AS plus30,
             CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INT) AS days_to_2000
      FROM orders ORDER BY o_orderkey LIMIT 200""",

    "fn_math" -> s"""
      SELECT p_partkey,
             CAST(ROUND(${N.money("p_retailprice")}, 1) AS DOUBLE) AS price_r1,
             abs(p_retailprice - 1000) AS abs_diff,
             CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
             CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
             round(pow(p_retailprice, 0.5), 4) AS price_pow_half,
             round(ln(p_retailprice), 4) AS price_ln,
             round(sqrt(p_retailprice), 4) AS price_sqrt,
             p_partkey % 7 AS key_mod
      FROM part ORDER BY p_partkey LIMIT 200""",

    "fn_conditional" -> """
      SELECT c_custkey,
             CASE WHEN c_acctbal < 0 THEN 'neg'
                  WHEN c_acctbal < 5000 THEN 'low'
                  ELSE 'high' END AS bal_bucket,
             COALESCE(nullif(c_mktsegment, 'BUILDING'), 'none') AS seg_or_none,
             round(greatest(c_acctbal, 0.0), 2) AS bal_pos,
             round(least(c_acctbal, 1000.0), 2) AS bal_cap
      FROM customer ORDER BY c_custkey LIMIT 500""",

    "fn_json" -> s"""
      SELECT event_type, CAST(sum(k) AS BIGINT) AS sum_k, count(*) AS n,
             ${N.avgInt("k", 4)} AS avg_k
      FROM (SELECT event_type, CAST(json_extract(props, '$$.k') AS INT) AS k FROM events)
      GROUP BY event_type ORDER BY event_type""",

    "fn_array" -> """
      SELECT vec_id,
             CAST(len(embedding) AS INT) AS dim,
             round(CAST(embedding[1] AS DOUBLE), 4) AS first_val,
             round(CAST(embedding[-1] AS DOUBLE), 4) AS last_val,
             round((SELECT sum(CAST(x AS DOUBLE)) FROM unnest(embedding[1:4]) AS u(x)), 4) AS sum_first4
      FROM embeddings ORDER BY vec_id LIMIT 1000""",

    "fn_explode_words" -> """
      SELECT word, count(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE length(word) > 0
      GROUP BY word ORDER BY n DESC, word LIMIT 20""",

    "join_shuffle_hash" -> s"""
      SELECT o_orderpriority, count(*) AS n_items, ${N.sumMoney("l_extendedprice")} AS sum_price
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "sql_recursive_cte" -> """
      WITH RECURSIVE cal(m) AS (
        SELECT DATE '1995-01-01'
        UNION ALL SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM cal WHERE m < DATE '1998-12-01'
      )
      SELECT m, count(o_orderkey) AS n_orders
      FROM cal LEFT JOIN orders
        ON CAST(date_trunc('month', o_orderdate) AS DATE) = m
      GROUP BY m ORDER BY m""",

    "join_right_outer" -> """
      SELECT p_partkey, count(l_orderkey) AS n_lineitems
      FROM lineitem RIGHT JOIN part ON l_partkey = p_partkey
      GROUP BY p_partkey ORDER BY p_partkey""",

    "agg_collect_sorted" -> """
      SELECT o_custkey,
             array_to_string(list_sort(list(o_orderpriority)), '|') AS priorities,
             count(*) AS n
      FROM orders WHERE o_custkey <= 100
      GROUP BY o_custkey ORDER BY o_custkey""",

    "sql_scalar_subquery" -> """
      SELECT c_custkey,
             (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
             (SELECT max(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_price
      FROM customer
      WHERE c_custkey <= 500
      ORDER BY c_custkey""",

    "sql_exists_subquery" -> """
      SELECT c_custkey, c_name
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 200000)
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      ORDER BY c_custkey""",

    // the salted join is algebraically the plain join — that IS the check
    "join_skew_salted" -> s"""
      SELECT c_mktsegment, count(*) AS n_orders,
             ${N.sumMoney("o_totalprice")} AS sum_price
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    // bloom prefilter + exact confirm ≡ plain semi-join
    "join_bloom_prefilter" -> s"""
      SELECT l_returnflag, count(*) AS n_items,
             ${N.sumMoney("l_extendedprice")} AS sum_price
      FROM lineitem
      WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
      GROUP BY l_returnflag ORDER BY l_returnflag""",

    "agg_string_agg" -> """
      SELECT o_custkey,
             string_agg(o_orderpriority, '|' ORDER BY o_orderkey) AS priorities,
             count(*) AS n
      FROM orders
      WHERE o_custkey <= 100
      GROUP BY o_custkey
      ORDER BY o_custkey""",

    "llm_pii_scrub" -> """
      WITH w AS (
        SELECT source,
               CASE WHEN doc_id % 7 = 0
                    THEN text || ' contact user' || doc_id || '@example.com or 555-' ||
                         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    ELSE text END AS t2
        FROM documents),
      m AS (
        SELECT source,
               len(regexp_extract_all(t2, '[a-z0-9._-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS n_email,
               len(regexp_extract_all(t2, '\d{3}-\d{4}')) AS n_phone,
               len(t2) - len(regexp_replace(regexp_replace(t2,
                 '[a-z0-9._-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
                 '\d{3}-\d{4}', '[PHONE]', 'g')) AS red
        FROM w)
      SELECT source,
             CAST(sum(n_email) AS BIGINT) AS n_emails,
             CAST(sum(n_phone) AS BIGINT) AS n_phones,
             CAST(sum(red) AS BIGINT) AS chars_redacted,
             count(CASE WHEN n_email + n_phone > 0 THEN 1 END) AS n_docs_pii
      FROM m GROUP BY source ORDER BY source""",

    // ovf can't be expressed in DuckDB 1.0 (BIGINT overflow errors, no
    // try_add) — the oracle pins the expected constant NULL
    "fn_try_arith" -> """
      SELECT l_orderkey, l_linenumber,
             CAST(CAST(l_extendedprice AS DECIMAL(12,2)) /
                  nullif(l_quantity - l_quantity, 0) AS DOUBLE) AS div0,
             round(CAST(l_extendedprice AS DOUBLE) / 4.0, 4) AS div_ok,
             try_cast(l_returnflag AS INT) AS cast_bad,
             try_cast(CAST(l_linenumber AS VARCHAR) AS INT) AS cast_ok,
             CAST(NULL AS BIGINT) AS ovf
      FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 300""",

    "fn_string_extra" -> """
      SELECT p_partkey,
             translate(p_name, 'ae', '43') AS name_leet,
             lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
             rpad(p_brand, 10, '.') AS brand_padded,
             reverse(p_name) AS name_rev,
             repeat(p_brand, 2) AS brand_twice,
             left(p_name, 4) AS name_left,
             right(p_name, 4) AS name_right,
             split_part(p_type, ' ', 2) AS type_mid
      FROM part WHERE p_partkey <= 500 ORDER BY p_partkey""",

    "fn_date_extra" -> """
      SELECT o_orderkey,
             CAST(o_orderdate AS DATE) AS d,
             CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3mo,
             last_day(CAST(o_orderdate AS DATE)) AS eom,
             CAST(quarter(o_orderdate) AS INT) AS q,
             CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
             CAST(weekofyear(o_orderdate) AS INT) AS woy,
             CAST(dayofyear(o_orderdate) AS INT) AS doy
      FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey""",

    "agg_multi_distinct" -> """
      SELECT o_orderstatus,
             count(DISTINCT o_custkey) AS n_cust,
             count(DISTINCT o_orderpriority) AS n_prio,
             count(*) AS n
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "window_ignore_nulls" -> """
      SELECT o_custkey, o_orderkey,
             last_value(CASE WHEN o_totalprice > 200000 THEN o_totalprice END IGNORE NULLS)
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS last_big
      FROM orders WHERE o_custkey <= 200
      ORDER BY o_custkey, o_orderkey""",

    "agg_median_percentile" -> """
      SELECT c_mktsegment,
             round(median(c_acctbal), 4) AS median_bal,
             round(quantile_cont(c_acctbal, 0.25), 4) AS p25_bal,
             round(quantile_cont(c_acctbal, 0.75), 4) AS p75_bal,
             count(*) AS n
      FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "agg_corr_covar" -> """
      SELECT l_returnflag,
             round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
             round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_s,
             round(covar_pop(l_quantity, l_extendedprice), 2) AS covar_p,
             count(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "agg_arg_minmax" -> """
      SELECT c_mktsegment,
             arg_max(c_name, CAST(round(c_acctbal * 100) AS BIGINT)::HUGEINT * 9223372036854775808 + c_custkey) AS richest,
             arg_min(c_name, CAST(round(c_acctbal * 100) AS BIGINT)::HUGEINT * 9223372036854775808 + c_custkey) AS poorest,
             count(*) AS n
      FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "agg_bool_countif" -> """
      SELECT o_orderpriority,
             CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
             bool_and(o_totalprice > 0) AS all_positive,
             bool_or(o_orderstatus = 'F') AS any_finished,
             count(*) AS n
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "window_value_fns" -> """
      SELECT o_custkey, o_orderkey,
             first_value(o_totalprice) OVER w AS first_price,
             last_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
             nth_value(o_totalprice, 2) OVER w AS second_price
      FROM orders WHERE o_custkey <= 200
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_orderkey""",

    "window_percent_cume" -> """
      SELECT c_mktsegment, c_custkey,
             round(percent_rank() OVER w, 6) AS pct_rank,
             round(cume_dist() OVER w, 6) AS cume
      FROM customer WHERE c_custkey <= 500
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      ORDER BY c_mktsegment, c_custkey""",

    "set_ops_all" -> """
      WITH a AS (SELECT l_orderkey AS key FROM lineitem WHERE l_quantity > 45),
           b AS (SELECT l_orderkey AS key FROM lineitem WHERE l_returnflag = 'R'),
           i AS (SELECT key, count(*) AS n_inter FROM (SELECT key FROM a INTERSECT ALL SELECT key FROM b) GROUP BY key),
           e AS (SELECT key, count(*) AS n_except FROM (SELECT key FROM a EXCEPT ALL SELECT key FROM b) GROUP BY key)
      SELECT COALESCE(i.key, e.key) AS key,
             COALESCE(n_inter, 0) AS n_inter,
             COALESCE(n_except, 0) AS n_except
      FROM i FULL JOIN e ON i.key = e.key
      ORDER BY key""",

    "fn_struct" -> """
      SELECT o_orderkey,
             o_orderstatus AS status,
             CAST(year(o_orderdate) AS INT) AS yr,
             CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS bucket,
             round(o_totalprice, 2) AS price
      FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey""",

    "agg_unpivot" -> """
      WITH wide AS (
        SELECT o_orderpriority, count(*) AS n_orders,
               count(DISTINCT o_custkey) AS n_customers
        FROM orders GROUP BY o_orderpriority)
      SELECT o_orderpriority, metric, val
      FROM wide UNPIVOT (val FOR metric IN (n_orders, n_customers))
      ORDER BY o_orderpriority, metric""",

    "fn_bitwise" -> """
      SELECT o_orderkey,
             o_orderkey << 2 AS shl,
             o_orderkey >> 1 AS shr,
             o_orderkey & 255 AS band,
             o_orderkey | 16 AS bor,
             xor(o_orderkey, 85) AS bxor,
             CAST(bit_count(o_orderkey) AS INT) AS bcount,
             ~o_orderkey AS bnot
      FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey""",

    "fn_posexplode" -> """
      SELECT doc_id, CAST(i - 1 AS INT) AS pos, words[i] AS word
      FROM (SELECT doc_id, string_split(text, ' ') AS words
            FROM documents WHERE doc_id < 20),
           UNNEST(range(1, len(words) + 1)) AS t(i)
      ORDER BY doc_id, pos""",

    "fn_map" -> """
      SELECT user_id,
             count(*) FILTER (WHERE event_type = 'click') AS clicks,
             count(*) FILTER (WHERE event_type = 'purchase') AS purchases,
             count(DISTINCT event_type) AS n_types
      FROM events GROUP BY user_id ORDER BY user_id""",

    "udtf_ngrams" -> """
      SELECT gram, count(1) AS n FROM (
        SELECT unnest(list_transform(range(1, greatest(length(p_name) - 1, 1)),
                                     i -> substr(p_name, i, 3))) AS gram
        FROM part)
      GROUP BY gram ORDER BY n DESC, gram LIMIT 20""",

    "udaf_weighted_avg" -> """
      SELECT p_brand,
             round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS wavg_price,
             count(*) AS n
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand ORDER BY p_brand""",

    // The graded batch form: withWatermark is a no-op in batch by Spark's
    // contract, so the output is the plain hourly rollup — checkable; the
    // streaming late-drop semantics stay asserted on MemoryStreams in
    // StreamingSpec.
    "stream_watermark_late" -> """
      SELECT epoch_us(date_trunc('hour', ts)) AS win_start_us, event_type, count(*) AS n
      FROM events GROUP BY 1, 2 ORDER BY win_start_us, event_type""",

    "stream_tumbling_count" -> s"""
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
             count(*) AS n, ${N.sumMoney("value")} AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY day, event_type""",

    "stream_sliding_avg" -> s"""
      SELECT epoch_us(w) AS win_start_us, ${N.avgMoney("value", 4)} AS avg_value, count(*) AS n
      FROM (
        SELECT time_bucket(INTERVAL '30 minutes', ts) AS w, value FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS w, value FROM events)
      GROUP BY w ORDER BY win_start_us""",

    "stream_session_window" -> """
      WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_s
        FROM events),
      grouped AS (
        SELECT user_id, ts,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS grp
        FROM flagged)
      SELECT user_id, epoch_us(min(ts)) AS session_start_us, count(*) AS n
      FROM grouped GROUP BY user_id, grp
      ORDER BY user_id, session_start_us""",

    "stream_dedup" -> """
      SELECT user_id, event_type, first_event_id, first_ts_us FROM (
        SELECT user_id, event_type, event_id AS first_event_id, epoch_us(ts) AS first_ts_us,
               row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
        FROM events)
      WHERE rn = 1 ORDER BY user_id, event_type""",

    "stream_interval_join" -> s"""
      WITH c AS (SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'),
           p AS (SELECT user_id, ts AS p_ts, value FROM events WHERE event_type = 'purchase')
      SELECT c.user_id AS user_id, count(*) AS n_pairs, ${N.sumMoney("value")} AS sum_value
      FROM c JOIN p ON c.user_id = p.user_id
        AND p.p_ts >= c.click_ts AND p.p_ts <= c.click_ts + INTERVAL 1 HOUR
      GROUP BY c.user_id ORDER BY user_id""",

    "llm_dedup_exact" -> """
      SELECT source, count(*) AS n_docs, count(DISTINCT md5(text)) AS n_uniq
      FROM documents GROUP BY source ORDER BY source""",

    "llm_dedup_keep_best" -> """
      SELECT h, n_dupes, kept_doc_id FROM (
        SELECT md5(substr(text, 1, 40)) AS h, count(*) AS n_dupes,
               arg_max(doc_id, n_chars::HUGEINT * 9223372036854775808 + doc_id) AS kept_doc_id
        FROM documents GROUP BY 1)
      WHERE n_dupes > 1 ORDER BY h""",

    "llm_sim_cosine_topk" -> """
      WITH n AS (
        SELECT vec_id, embedding,
               sqrt((SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                     FROM unnest(embedding) AS u(x))) AS nrm
        FROM embeddings),
      p AS (SELECT vec_id AS pid, embedding AS pe, nrm AS pnorm FROM n WHERE vec_id < 10),
      pairs AS (
        SELECT p.pid AS pid, c.vec_id AS nid,
               round((SELECT sum(a * b) FROM (
                        SELECT CAST(unnest(p.pe) AS DOUBLE) AS a,
                               CAST(unnest(c.embedding) AS DOUBLE) AS b))
                     / (p.pnorm * c.nrm), 4) AS cos
        FROM p CROSS JOIN n c WHERE c.vec_id <> p.pid)
      SELECT pid, nid, cos, rnk FROM (
        SELECT pid, nid, cos,
               row_number() OVER (PARTITION BY pid ORDER BY cos DESC, nid) AS rnk
        FROM pairs)
      WHERE rnk <= 5 ORDER BY pid, rnk""",

    "llm_text_stats" -> s"""
      SELECT lang, count(*) AS n_docs, ${N.avgInt("n_chars", 2)} AS avg_chars,
             count(DISTINCT source) AS n_sources,
             ${N.avgInt("len(string_split(text, ' '))", 2)} AS avg_tokens
      FROM documents GROUP BY lang ORDER BY lang""",

    "llm_tfidf_top_terms" -> """
      WITH words AS (
        SELECT lang, doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      w2 AS (SELECT * FROM words WHERE length(term) > 0),
      tf AS (SELECT lang, term, count(*) AS tf FROM w2 GROUP BY lang, term),
      dfreq AS (SELECT term, count(*) AS df
                FROM (SELECT DISTINCT doc_id, term FROM w2) GROUP BY term),
      n AS (SELECT count(*) AS n_total FROM documents),
      scored AS (
        SELECT lang, term,
               round(tf * ln(CAST(n_total AS DOUBLE) / CAST(df AS DOUBLE)), 4) AS score
        FROM tf JOIN dfreq USING (term) CROSS JOIN n)
      SELECT lang, term, score, rnk FROM (
        SELECT lang, term, score,
               row_number() OVER (PARTITION BY lang ORDER BY score DESC, term) AS rnk
        FROM scored)
      WHERE rnk <= 3 ORDER BY lang, rnk""",

    "llm_multimodal_join" -> """
      SELECT lang, label, count(*) AS n,
             round(avg(CAST(embedding[1] AS DOUBLE)), 4) AS avg_dim0
      FROM documents JOIN embeddings ON doc_id = vec_id
      GROUP BY lang, label ORDER BY lang, label""",

    "llm_dedup_ngram_jaccard" -> s"""
      WITH d AS (
        SELECT doc_id, source,
               list_distinct([array_to_string(w[CAST(i AS INT):CAST(i AS INT)+2], ' ')
                              FOR i IN range(1, greatest(len(w)-2, 1)+1)]) AS sh
        FROM (SELECT doc_id, source, string_split(text, ' ') AS w
              FROM documents WHERE doc_id < 2000))
      SELECT doc_a, doc_b, ${N.ratio("inter", "uni", 4)} AS jac FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               len(list_intersect(a.sh, b.sh)) AS inter,
               len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS uni
        FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id)
      WHERE inter >= 1 ORDER BY doc_a, doc_b""",

    "llm_decontaminate" -> """
      WITH gs AS (
        SELECT doc_id,
               unnest(list_distinct([array_to_string(w[CAST(i AS INT):CAST(i AS INT)+7], ' ')
                                     FOR i IN range(1, greatest(len(w)-7, 1)+1)])) AS g
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
      g AS (SELECT doc_id, CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) AS gh FROM gs),
           bench AS (SELECT DISTINCT gh FROM g WHERE doc_id < 10)
      SELECT doc_id, count(DISTINCT g.gh) AS n_hits
      FROM g JOIN bench ON g.gh = bench.gh
      WHERE doc_id >= 10
      GROUP BY doc_id ORDER BY doc_id""",

    "llm_dedup_embed_cosine" -> """
      WITH n AS (
        SELECT vec_id, embedding,
               sqrt((SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                     FROM unnest(embedding) AS u(x))) AS nrm
        FROM embeddings),
      p AS (SELECT vec_id AS pid, embedding AS pe, nrm AS pnorm FROM n WHERE vec_id < 100)
      SELECT pid, nid, cos FROM (
        SELECT p.pid AS pid, c.vec_id AS nid,
               round((SELECT sum(a * b) FROM (
                        SELECT CAST(unnest(p.pe) AS DOUBLE) AS a,
                               CAST(unnest(c.embedding) AS DOUBLE) AS b))
                     / (p.pnorm * c.nrm), 4) AS cos
        FROM p CROSS JOIN n c WHERE c.vec_id > p.pid)
      WHERE cos >= 0.30 ORDER BY pid, nid""",

    "llm_lang_id" -> """
      WITH grams AS (
        SELECT doc_id, lang, unnest([substr(text, CAST(i AS INT), 3)
                                     FOR i IN range(1, greatest(length(text)-2, 1)+1)]) AS gram
        FROM documents WHERE doc_id % 10 <= 1),
      profile AS (
        SELECT plang, gram FROM (
          SELECT lang AS plang, gram, count(*) AS cnt,
                 row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, gram) AS rk
          FROM grams WHERE doc_id % 10 = 1 GROUP BY lang, gram)
        WHERE rk <= 50),
      test_grams AS (
        SELECT DISTINCT doc_id, gram FROM grams WHERE doc_id % 10 = 0),
      scores AS (
        SELECT doc_id, plang, count(*) AS score
        FROM test_grams JOIN profile USING (gram) GROUP BY doc_id, plang),
      pred AS (
        SELECT doc_id, plang AS pred_lang FROM (
          SELECT doc_id, plang,
                 row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, plang) AS rk
          FROM scores)
        WHERE rk = 1)
      SELECT lang, pred_lang, count(*) AS n
      FROM documents JOIN pred USING (doc_id)
      WHERE doc_id % 10 = 0
      GROUP BY lang, pred_lang ORDER BY lang, pred_lang""",

    "llm_quality_score" -> s"""
      SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
             ${N.ratio("n_alpha", "n_tokens", 2)} AS avg_token_len,
             ${N.ratio("n_stop", "n_tokens", 4)} AS stop_rate,
             CASE WHEN n_tokens < 8 THEN 'short'
                  WHEN len(list_distinct(w)) * 2 < n_tokens THEN 'repetitive'
                  ELSE 'ok' END AS quality
      FROM (
        SELECT doc_id, w, len(w) AS n_tokens,
               length(replace(text, ' ', '')) AS n_alpha,
               len(list_filter(w, x -> x IN ('a', 'the', 'of', 'and', 'data', 'row'))) AS n_stop
        FROM (SELECT doc_id, text, string_split(text, ' ') AS w
              FROM documents WHERE doc_id < 2000))
      ORDER BY doc_id""",

    "llm_token_count" -> """
      SELECT lang,
             CAST(sum(ws_tokens) AS BIGINT) AS sum_ws_tokens,
             CAST(sum(re_tokens) AS BIGINT) AS sum_re_tokens,
             CAST(max(re_tokens) AS BIGINT) AS max_re_tokens,
             count(*) AS n_docs
      FROM (SELECT lang, len(string_split(text, ' ')) AS ws_tokens,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS re_tokens
            FROM documents)
      GROUP BY lang ORDER BY lang""",

    "mm_binary_features" -> """
      SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes,
             sha256(text) AS sha,
             CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte
      FROM documents WHERE doc_id < 2000 ORDER BY doc_id""",

    // The stub decoder is md5-hex-slice arithmetic (Media.decodeStub),
    // so the oracle recomputes width/height/frames/rate from md5(text)
    // directly — the same exempt-set graduation as minhash/fingerprint.
    "mm_decode_stub" -> """
      WITH m AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
               octet_length(encode(text)) AS n_bytes, md5(text) AS hx
        FROM documents WHERE doc_id < 2000),
      d AS (
        SELECT kind, n_bytes,
          CASE WHEN kind = 'audio' THEN 0
               ELSE 64 + CAST(('0x' || substr(hx, 1, 8)) AS BIGINT) % 1857 END AS width,
          CASE WHEN kind = 'image' THEN 1
               WHEN kind = 'video' THEN 25 * (1 + CAST(('0x' || substr(hx, 17, 8)) AS BIGINT) % 256)
               ELSE 0 END AS n_frames,
          CASE WHEN kind = 'audio' THEN
                 CASE WHEN CAST(('0x' || substr(hx, 25, 8)) AS BIGINT) % 2 = 0
                      THEN 44100 ELSE 16000 END
               ELSE 0 END AS sample_rate
        FROM m)
      SELECT kind, count(*) AS n, CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
             CAST(max(width) AS BIGINT) AS max_width,
             CAST(max(n_frames) AS BIGINT) AS max_frames,
             count(DISTINCT sample_rate) AS n_rates
      FROM d GROUP BY kind ORDER BY kind""",

    "mm_token_budget" -> """
      WITH m AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
               len(string_split(text, ' ')) AS n_text_tokens, md5(text) AS hx
        FROM documents WHERE doc_id < 2000),
      d AS (
        SELECT kind, n_text_tokens,
               64 + CAST(('0x' || substr(hx, 1, 8)) AS BIGINT) % 1857 AS width,
               64 + CAST(('0x' || substr(hx, 9, 8)) AS BIGINT) % 1017 AS height,
               25 * (1 + CAST(('0x' || substr(hx, 17, 8)) AS BIGINT) % 256) AS vframes
        FROM m),
      p AS (
        SELECT kind, CAST(n_text_tokens AS BIGINT) AS n_text_tokens,
          CASE WHEN kind = 'image' THEN
                 CAST(ceil(width / 16.0) AS BIGINT) * CAST(ceil(height / 16.0) AS BIGINT)
               WHEN kind = 'video' THEN
                 CAST(ceil(width / 16.0) AS BIGINT) * CAST(ceil(height / 16.0) AS BIGINT)
                   * CAST(ceil(vframes / 16.0) AS BIGINT)
               ELSE 1200 END AS media_tokens
        FROM d)
      SELECT kind, count(*) AS n_docs,
             CAST(sum(n_text_tokens) AS BIGINT) AS text_tokens,
             CAST(sum(media_tokens) AS BIGINT) AS media_tokens,
             CAST(max(n_text_tokens + media_tokens) AS BIGINT) AS max_budget
      FROM p GROUP BY kind ORDER BY kind""",

    // every-16th-frame sampling over frames 0..n_frames-1 reduces to
    // closed-form integer arithmetic on the stub's frame count
    "mm_frame_sample" -> """
      WITH v AS (
        SELECT doc_id,
               25 * (1 + CAST(('0x' || substr(md5(text), 17, 8)) AS BIGINT) % 256) AS n_frames
        FROM documents WHERE doc_id < 600 AND doc_id % 3 = 2)
      SELECT doc_id, (n_frames - 1) // 16 + 1 AS n_sampled,
             CAST(0 AS BIGINT) AS first_frame,
             16 * ((n_frames - 1) // 16) AS last_frame
      FROM v ORDER BY doc_id""",

    // greedy next-fit packing is a sequential scan per source — the
    // mirror steps the same recurrence with a recursive CTE over the
    // doc_id-ordered row number (all sources advance in lockstep; depth
    // = max docs per source)
    "llm_pack_sequences" -> """
      WITH RECURSIVE d AS (
        SELECT source, len(string_split(text, ' ')) AS tok,
               row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        FROM documents),
      rec AS (
        SELECT source, rn, tok, CAST(0 AS BIGINT) AS bin_id, tok AS used
        FROM d WHERE rn = 1
        UNION ALL
        SELECT d.source, d.rn, d.tok,
               CASE WHEN r.used > 0 AND r.used + d.tok > 512
                    THEN r.bin_id + 1 ELSE r.bin_id END,
               CASE WHEN r.used > 0 AND r.used + d.tok > 512
                    THEN d.tok ELSE r.used + d.tok END
        FROM rec r JOIN d ON d.source = r.source AND d.rn = r.rn + 1)
      SELECT source, bin_id, count(*) AS n_docs,
             CAST(sum(tok) AS BIGINT) AS sum_tokens
      FROM rec GROUP BY source, bin_id ORDER BY source, bin_id""",

    "agg_bit_ops" -> """
      SELECT o_orderpriority,
             bit_and(o_orderkey) AS k_and,
             bit_or(o_orderkey) AS k_or,
             bit_xor(o_orderkey) AS k_xor,
             count(*) AS n
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "sql_lateral_join" -> """
      SELECT n_name, t.c_custkey AS top_custkey, t.c_acctbal AS top_acctbal
      FROM nation, LATERAL (
        SELECT c_custkey, c_acctbal FROM customer c
        WHERE c.c_nationkey = n_nationkey
        ORDER BY c_acctbal DESC, c_custkey LIMIT 1) t
      ORDER BY n_name""",

    "join_null_safe" -> """
      SELECT ck, count(*) AS n_pairs
      FROM (SELECT nullif(c_nationkey % 5, 0) AS ck FROM customer) c
      JOIN (SELECT nullif(s_nationkey % 5, 0) AS sk FROM supplier) sp
        ON ck IS NOT DISTINCT FROM sk
      GROUP BY ck ORDER BY ck NULLS FIRST""",

    "window_gaps_islands" -> """
      WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) >= INTERVAL '45 minutes'
                    THEN 1 ELSE 0 END AS new_s
        FROM events),
      grouped AS (
        SELECT user_id, ts,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS grp
        FROM flagged)
      SELECT user_id, min(epoch_us(ts)) AS session_start_us,
             count(*) AS n_events,
             (max(epoch_us(ts)) - min(epoch_us(ts))) // 60000000 AS duration_min
      FROM grouped GROUP BY user_id, grp
      ORDER BY user_id, session_start_us""",

    "fn_array_extra" -> """
      SELECT doc_id,
             array_to_string(list_sort(w), ' ') AS sorted_words,
             CAST(len(list_distinct(w)) AS BIGINT) AS n_uniq,
             CAST(len(list_intersect(w, ['join','hash','scan','row'])) AS BIGINT) AS n_common,
             list_contains(w, 'join') AS has_join,
             CAST(coalesce(list_position(w, 'hash'), 0) AS BIGINT) AS pos_hash,
             CAST(len(list_filter(w, x -> length(x) > 4)) AS BIGINT) AS n_long,
             list_has_any(w, ['vector','batch']) AS has_vb,
             list_reverse(w)[1] AS last_word,
             CAST(len(flatten([w, w])) AS BIGINT) AS n_flat
      FROM (SELECT doc_id, string_split(text, ' ')[1:8] AS w FROM documents)
      ORDER BY doc_id""",

    "fn_regexp" -> """
      SELECT p_partkey,
             regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
             regexp_matches(p_name, '^[bg]') AS starts_bg,
             CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS BIGINT) AS n_vowels,
             regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head
      FROM part ORDER BY p_partkey LIMIT 500""",

    "fn_interval_arith" -> """
      SELECT o_orderkey,
             o_orderdate + INTERVAL 36 HOUR AS plus_36h,
             o_orderdate - INTERVAL 90 MINUTE AS minus_90m,
             o_orderdate + INTERVAL 2 DAY + INTERVAL 3 HOUR AS plus_2d3h,
             date_diff('hour', TIMESTAMP '1990-01-01 00:00:00', o_orderdate) AS hours_since_1990,
             date_diff('day', o_orderdate, TIMESTAMP '2005-01-01 00:00:00') AS days_to_2005
      FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""",

    "fn_trig" -> """
      SELECT p_partkey,
             round(sin(p_retailprice / 1000), 4) AS sin_x,
             round(cos(p_retailprice / 1000), 4) AS cos_x,
             round(tan(p_retailprice / 1000), 4) AS tan_x,
             round(atan(p_retailprice / 1000), 4) AS atan_x,
             round(atan2(p_retailprice / 1000, 2.0), 4) AS atan2_x2,
             round(degrees(p_retailprice / 1000), 4) AS deg_x,
             round(radians(CAST(p_size AS DOUBLE)), 4) AS rad_size,
             round(log2(p_retailprice), 4) AS log2_price,
             round(log10(p_retailprice), 4) AS log10_price,
             CAST(sign(p_size - 25) AS INT) AS sign_size,
             round(exp((p_retailprice / 1000) / 10), 4) AS exp_x10
      FROM part ORDER BY p_partkey LIMIT 500""",

    "llm_hash_split" -> s"""
      SELECT lang,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c','d') THEN 'val'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('e','f') THEN 'test'
                  ELSE 'train' END AS split,
             count(*) AS n_docs,
             ${N.avgInt("n_chars", 2)} AS avg_chars
      FROM documents GROUP BY 1, 2 ORDER BY lang, split""",

    "llm_stratified_sample" -> s"""
      SELECT lang, count(*) AS n_total,
             CAST(count_if(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2')) AS BIGINT) AS n_sampled,
             ${N.ratio(
               "SUM(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2') THEN n_chars END)",
               "count_if(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2'))", 2)} AS avg_chars_sampled
      FROM documents GROUP BY lang ORDER BY lang""",

    "llm_repetition_score" -> s"""
      WITH b AS (
        SELECT doc_id, list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) AS bigrams
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id < 1000))
      SELECT doc_id,
             CAST(len(bigrams) AS BIGINT) AS n_bigrams,
             CAST(len(list_distinct(bigrams)) AS BIGINT) AS n_uniq,
             ${N.ratio("len(bigrams) - len(list_distinct(bigrams))", "len(bigrams)", 4)} AS rep_ratio
      FROM b ORDER BY doc_id""",

    "census_moe_agg" -> s"""
      SELECT n_name, count(*) AS n_cust,
             ${N.d2(s"SUM(${N.money("c_acctbal")})")} AS est_sum,
             round(sqrt(CAST(SUM(c2) AS DOUBLE) / 1000000.0), 2) AS moe_agg
      FROM (SELECT c_nationkey, c_acctbal,
                   CAST(round(c_acctbal * 100) AS BIGINT) * CAST(round(c_acctbal * 100) AS BIGINT) AS c2
            FROM customer)
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name""",

    // one (unit x group) census; D's numerator is a BIGINT cross-product
    // sum (no per-unit ratio), isolation is per-unit micro-floor terms
    "census_dissimilarity" -> s"""
      WITH cens AS (
        SELECT n.n_name,
               CAST(count(*) FILTER (WHERE c.c_mktsegment = 'BUILDING') AS BIGINT) AS a,
               CAST(count(*) FILTER (WHERE c.c_mktsegment <> 'BUILDING') AS BIGINT) AS b
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1),
      tot AS (SELECT CAST(sum(a) AS BIGINT) AS ta, CAST(sum(b) AS BIGINT) AS tb FROM cens)
      SELECT CAST(count(*) AS BIGINT) AS n_units,
             max(ta) AS tot_a, max(tb) AS tot_b,
             CAST(sum(abs(a * tb - b * ta)) AS BIGINT) AS d_num,
             ${N.ratio("sum(abs(a * tb - b * ta))", "max(ta) * max(tb) * 2", 6)} AS dissimilarity,
             CAST(sum((a * a * 1000000) // (ta * (a + b))) AS BIGINT) AS isolation_micro
      FROM cens CROSS JOIN tot""",

    // ascending (cents, custkey) rank weights; ties carry equal values so
    // the rank-weighted sum is order-free; BIGINT until the final ratio
    "census_gini" -> s"""
      WITH r AS (
        SELECT n.n_name, CAST(round(c.c_acctbal * 100) AS BIGINT) AS cents, c.c_custkey
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE c.c_acctbal > 0),
      rk AS (
        SELECT n_name, cents,
               row_number() OVER (PARTITION BY n_name ORDER BY cents, c_custkey) AS rnk
        FROM r)
      SELECT n_name, CAST(count(*) AS BIGINT) AS n_cust,
             CAST(sum(cents) AS BIGINT) AS sum_cents,
             CAST(2 * sum(rnk * cents) - (count(*) + 1) * sum(cents) AS BIGINT) AS g_num,
             ${N.ratio("2 * sum(rnk * cents) - (count(*) + 1) * sum(cents)",
                       "count(*) * sum(cents)", 6)} AS gini
      FROM rk GROUP BY n_name ORDER BY n_name""",

    // exact cross-product ratio e_ij*E / (e_i*E_j), one half-up ratio per cell
    "census_location_quotient" -> s"""
      WITH cens AS (
        SELECT n.n_name, c.c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS e_ij
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2),
      bn AS (SELECT n_name, CAST(sum(e_ij) AS BIGINT) AS e_i FROM cens GROUP BY 1),
      bs AS (SELECT segment, CAST(sum(e_ij) AS BIGINT) AS e_j FROM cens GROUP BY 1),
      tt AS (SELECT CAST(sum(e_ij) AS BIGINT) AS e_tot FROM cens)
      SELECT cens.n_name, cens.segment, cens.e_ij, bn.e_i, bs.e_j,
             ${N.ratio("cens.e_ij * tt.e_tot", "bn.e_i * bs.e_j", 6)} AS lq
      FROM cens JOIN bn USING (n_name) JOIN bs USING (segment) CROSS JOIN tt
      ORDER BY n_name, segment""",

    "llm_normalize_dedup" -> """
      SELECT source, count(*) AS n_docs,
             count(DISTINCT md5(text)) AS n_uniq_raw,
             count(DISTINCT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')))) AS n_uniq_norm
      FROM documents GROUP BY source ORDER BY source""",

    "llm_chunk_split" -> """
      WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS w,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents WHERE doc_id < 1000),
      c AS (
        SELECT doc_id, w, n_tok,
               CASE WHEN n_tok <= 128 THEN 1 ELSE 1 + (n_tok - 128 + 95) // 96 END AS n_chunks
        FROM d)
      SELECT doc_id, CAST(u.chunk_id AS BIGINT) AS chunk_id,
             least(128, n_tok - u.chunk_id * 96) AS chunk_len,
             w[CAST(u.chunk_id * 96 + 1 AS INT)] AS first_tok
      FROM c, LATERAL unnest(range(0, n_chunks)) AS u(chunk_id)
      ORDER BY doc_id, chunk_id""",

    "llm_length_histogram" -> """
      SELECT least(n_chars // 100, 9) AS bucket, count(*) AS n_docs,
             min(n_chars) AS min_chars, max(n_chars) AS max_chars
      FROM documents GROUP BY 1 ORDER BY bucket""",

    "llm_dedup_editdist" -> """
      WITH d AS (
        SELECT doc_id, source, substr(text, 1, 20) AS blk, substr(text, 21, 60) AS body
        FROM documents)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(levenshtein(a.body, b.body) AS BIGINT) AS edit_dist
      FROM d a JOIN d b ON a.source = b.source AND a.blk = b.blk AND a.doc_id < b.doc_id
      WHERE levenshtein(a.body, b.body) <= 30
      ORDER BY doc_a, doc_b""",

    // oracle IS the naive range-predicate join — the Spark side's banded
    // equi-join must produce identical pairs
    "join_range_bucket" -> s"""
      SELECT o.o_orderkey, count(*) AS n_shipments,
             ${N.d2(s"sum(${N.money("l.l_quantity")})")} AS sum_qty
      FROM orders o JOIN lineitem l
        ON CAST(l.l_shipdate AS DATE)
           BETWEEN CAST(o.o_orderdate AS DATE)
               AND CAST(o.o_orderdate AS DATE) + to_days(CAST(o.o_orderkey % 30 AS INT))
      WHERE o.o_orderkey <= 500 AND l.l_orderkey <= 5000
      GROUP BY o.o_orderkey ORDER BY o.o_orderkey""",

    // DuckDB supports DISTINCT window aggregates natively; Spark side
    // uses the dense_rank/max rewrite — values must agree
    "window_distinct_count" -> """
      SELECT o_orderkey, o_custkey, o_orderpriority,
             CAST(count(DISTINCT o_orderpriority)
                  OVER (PARTITION BY o_custkey) AS BIGINT) AS n_distinct_prio
      FROM orders WHERE o_custkey <= 300 ORDER BY o_orderkey""",

    "fn_codec" -> """
      SELECT p_partkey,
             hex(p_name) AS hex_name,
             base64(CAST(p_name AS BLOB)) AS b64_name,
             CAST(from_base64(base64(CAST(p_name AS BLOB))) AS VARCHAR) = p_name AS b64_roundtrip,
             CAST(unhex(hex(p_name)) AS VARCHAR) = p_name AS hex_roundtrip,
             md5(p_name) AS md5_name,
             sha256(p_name) AS sha256_name
      FROM part ORDER BY p_partkey LIMIT 500""",

    "fn_epoch_time" -> """
      SELECT o_orderkey,
             CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
             epoch_ms(o_orderdate) AS epoch_ms,
             epoch_us(o_orderdate) AS epoch_us,
             make_timestamp(epoch_us(o_orderdate)) AS from_epoch,
             strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS fmt_full,
             strftime(o_orderdate, '%Y-%m') AS fmt_ym
      FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""",

    "stream_window_topk" -> """
      WITH c AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type, count(*) AS n
        FROM events GROUP BY 1, 2),
      r AS (
        SELECT day, event_type, n,
               row_number() OVER (PARTITION BY day ORDER BY n DESC, event_type) AS rn
        FROM c)
      SELECT day, event_type, CAST(n AS BIGINT) AS n, CAST(rn AS BIGINT) AS rn
      FROM r WHERE rn <= 3 ORDER BY day, rn""",

    "window_range_time" -> """
      WITH e AS (
        SELECT event_id, user_id, value,
               epoch_us(ts) // 1000000 AS epoch_s
        FROM events)
      SELECT event_id, user_id,
             CAST(count(*) OVER w AS BIGINT) AS n_trailing_1h,
             CAST(ROUND(sum(CAST(value AS DECIMAL(12,2))) OVER w, 2) AS DOUBLE)
               AS sum_trailing_1h
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
                   RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
      ORDER BY event_id""",

    // same composite encoding as the Spark side — DuckDB's native mode()
    // breaks ties arbitrarily, so neither engine uses it
    "agg_mode" -> """
      WITH c AS (
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders GROUP BY 1, 2),
      m AS (
        SELECT o_orderstatus,
               max(lpad(CAST(n AS VARCHAR), 12, '0') || '|' || o_orderpriority) AS enc
        FROM c GROUP BY 1)
      SELECT o_orderstatus,
             split_part(enc, '|', 2) AS mode_priority,
             CAST(split_part(enc, '|', 1) AS BIGINT) AS mode_count
      FROM m ORDER BY o_orderstatus""",

    // oracle IS the hint-free join — the merge hint changes the plan,
    // never the result
    "join_sort_merge" -> s"""
      SELECT o_orderpriority, count(*) AS n_items,
             ${N.sumMoney("l_extendedprice")} AS sum_price
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "stream_tws_user_totals" -> """
      SELECT user_id, count(*) AS n_events,
             CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS total_cents,
             max(epoch_us(ts)) AS last_us
      FROM events GROUP BY user_id ORDER BY user_id""",

    "stream_funnel" -> s"""
      WITH v AS (
        SELECT user_id, min(ts) AS v_ts FROM events
        WHERE event_type = 'view' GROUP BY 1),
      c AS (
        SELECT e.user_id, min(e.ts) AS c_ts FROM events e
        JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts >= v.v_ts GROUP BY 1),
      p AS (
        SELECT e.user_id, min(e.ts) AS p_ts FROM events e
        JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts GROUP BY 1)
      SELECT count(*) AS n_viewers,
             CAST(count(c_ts) AS BIGINT) AS n_clickers,
             CAST(count(p_ts) AS BIGINT) AS n_purchasers,
             ${N.ratio("count(c_ts)", "count(*)", 4)} AS view_to_click,
             ${N.ratio("count(p_ts)", "count(c_ts)", 4)} AS click_to_purchase
      FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)""",

    "fn_explode_outer" -> """
      WITH d AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), w -> w LIKE '%q%') AS qs
        FROM documents WHERE doc_id < 2000)
      SELECT doc_id, CAST(u.i AS INT) AS pos, qs[CAST(u.i + 1 AS INT)] AS qtoken
      FROM d LEFT JOIN LATERAL unnest(range(len(qs))) u(i) ON TRUE
      ORDER BY doc_id, pos NULLS FIRST""",

    "window_share_of_total" -> """
      WITH per AS (
        SELECT n_name, sum(CAST(c_acctbal AS DECIMAL(12,2)) + 1000) AS s
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name)
      SELECT n_name,
             CAST(ROUND(s, 2) AS DOUBLE) AS adj_balance,
             round(CAST(s AS DOUBLE) / CAST(sum(s) OVER () AS DOUBLE), 6) AS share
      FROM per ORDER BY n_name""",

    // identical IEEE expression tree over exact integer aggregates
    "census_moe_ratio" -> """
      WITH c AS (
        SELECT n_name,
               CAST(round((c_acctbal + 1000) * 100) AS BIGINT) AS cents,
               c_mktsegment = 'BUILDING' AS seg
        FROM customer JOIN nation ON c_nationkey = n_nationkey),
      g AS (
        SELECT n_name,
               sum(CASE WHEN seg THEN cents END) AS numC,
               sum(cents) AS denC,
               sum(CASE WHEN seg THEN cents * cents END) AS moeN2c,
               sum(cents * cents) AS moeD2c
        FROM c GROUP BY n_name)
      SELECT n_name,
             round(numC::DOUBLE / denC::DOUBLE, 6) AS p,
             round(
               sqrt(CASE WHEN (moeN2c::DOUBLE / 1000000.0)
                              - (numC::DOUBLE / denC::DOUBLE) * (numC::DOUBLE / denC::DOUBLE)
                                * (moeD2c::DOUBLE / 1000000.0) < 0
                         THEN (moeN2c::DOUBLE / 1000000.0)
                              + (numC::DOUBLE / denC::DOUBLE) * (numC::DOUBLE / denC::DOUBLE)
                                * (moeD2c::DOUBLE / 1000000.0)
                         ELSE (moeN2c::DOUBLE / 1000000.0)
                              - (numC::DOUBLE / denC::DOUBLE) * (numC::DOUBLE / denC::DOUBLE)
                                * (moeD2c::DOUBLE / 1000000.0) END)
               / (denC::DOUBLE / 100.0), 6) AS moe_p
      FROM g ORDER BY n_name""",

    // same edge set; components via recursive transitive closure
    // (min reachable node == the propagation fixpoint)
    "llm_dedup_components" -> """
      WITH pre AS (
        SELECT CAST(('0x' || substr(md5(substr(text, 1, 40)), 1, 15)) AS BIGINT) AS k,
               doc_id FROM documents),
      suf AS (
        SELECT CAST(('0x' || substr(md5(substr(text, greatest(1, n_chars - 39), 40)), 1, 15)) AS BIGINT) AS k,
               doc_id FROM documents),
      pp AS (
        SELECT a.doc_id AS s, b.doc_id AS d
        FROM pre a JOIN pre b ON a.k = b.k AND a.doc_id < b.doc_id
        UNION
        SELECT a.doc_id, b.doc_id
        FROM suf a JOIN suf b ON a.k = b.k AND a.doc_id < b.doc_id),
      e AS (SELECT s, d FROM pp UNION SELECT d, s FROM pp),
      nodes AS (SELECT DISTINCT s AS n FROM e),
      r AS (
        WITH RECURSIVE reach(n, m) AS (
          SELECT n, n FROM nodes
          UNION
          SELECT e.s, reach.m FROM e JOIN reach ON e.d = reach.n)
        SELECT n, min(m) AS rep FROM reach GROUP BY n)
      SELECT rep, count(*) AS n_docs, CAST(max(n) AS BIGINT) AS max_doc
      FROM r GROUP BY rep ORDER BY rep""",

    "llm_filter_funnel" -> s"""
      WITH d AS (
        SELECT lang,
               n_chars >= 100 AS s1,
               n_chars >= 100 AND len(string_split(text, ' ')) >= 20 AS s2,
               n_chars >= 100 AND len(string_split(text, ' ')) >= 20
                 AND len(list_distinct(string_split(text, ' '))) * 10
                     >= len(string_split(text, ' ')) * 3 AS s3
        FROM documents)
      SELECT lang, count(*) AS n_docs,
             CAST(count_if(s1) AS BIGINT) AS pass_length,
             CAST(count_if(s2) AS BIGINT) AS pass_words,
             CAST(count_if(s3) AS BIGINT) AS pass_repetition,
             ${N.ratio("count_if(s3)", "count(*)", 4)} AS keep_rate
      FROM d GROUP BY lang ORDER BY lang""",

    "llm_vocab_coverage" -> s"""
      WITH w AS (
        SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents),
      v AS (
        SELECT word FROM (
          SELECT word, count(*) AS n FROM w GROUP BY 1
          ORDER BY n DESC, word LIMIT 20)),
      m AS (
        SELECT lang, word IN (SELECT word FROM v) AS cov FROM w)
      SELECT lang, count(*) AS n_tokens,
             CAST(count_if(cov) AS BIGINT) AS n_covered,
             ${N.ratio("count_if(cov)", "count(*)", 4)} AS coverage
      FROM m GROUP BY lang ORDER BY lang""",

    "llm_embed_centroid" -> """
      WITH e AS (
        SELECT label,
               u.i AS pos,
               CAST(floor(embedding[CAST(u.i + 1 AS INT)]::DOUBLE * 10000) AS BIGINT) AS xq
        FROM embeddings, LATERAL unnest(range(len(embedding))) u(i)),
      g AS (
        SELECT label, pos, sum(xq) AS sx, count(*) AS n FROM e GROUP BY 1, 2)
      SELECT label, CAST(max(n) AS BIGINT) AS n_vecs,
             round(sqrt(CAST(sum(sx * sx) AS DOUBLE)) / (CAST(max(n) AS BIGINT) * 10000.0), 4)
               AS centroid_norm
      FROM g GROUP BY label ORDER BY label""",

    "llm_domain_mix" -> """
      WITH d AS (
        SELECT source, n_chars,
               3 + ascii(substr(source, length(source), 1)) - 48 AS thr,
               CAST(('0x' || substr(md5(text), 1, 1)) AS INT) AS nib
        FROM documents)
      SELECT source, count(*) AS n_total,
             CAST(count_if(nib < thr) AS BIGINT) AS n_kept,
             CAST(coalesce(sum(CASE WHEN nib < thr THEN n_chars END), 0) AS BIGINT) AS kept_chars,
             max(thr) AS threshold_16ths
      FROM d GROUP BY source ORDER BY source""",

    "sql_merge_upsert" -> """
      WITH target AS (
        SELECT o_orderkey AS t_key, o_orderpriority AS t_prio,
               CAST(round(o_totalprice * 100) AS BIGINT) AS t_cents
        FROM orders WHERE o_orderkey % 4 <> 3),
      staging AS (
        SELECT o_orderkey AS s_key, o_orderpriority AS s_prio,
               CAST(round(o_totalprice * 100) AS BIGINT) * 11 // 10 AS s_cents
        FROM orders WHERE o_orderkey % 2 = 0),
      merged AS (
        SELECT coalesce(s_prio, t_prio) AS prio,
               coalesce(s_cents, t_cents) AS cents,
               (s_key IS NOT NULL AND t_key IS NOT NULL) AS updated,
               (t_key IS NULL) AS inserted
        FROM target FULL OUTER JOIN staging ON t_key = s_key)
      SELECT prio AS o_orderpriority,
             count(*) AS n_rows,
             CAST(count_if(updated) AS BIGINT) AS n_updated,
             CAST(count_if(inserted) AS BIGINT) AS n_inserted,
             CAST(count_if(NOT updated AND NOT inserted) AS BIGINT) AS n_kept,
             CAST(sum(cents) AS BIGINT) AS total_cents
      FROM merged GROUP BY prio ORDER BY o_orderpriority""",

    "llm_dedup_url_canonical" -> """
      WITH u AS (
        SELECT lower(source || '.example.com') AS chost,
               concat('https://',
                      CASE WHEN doc_id % 2 = 1 THEN upper(source || '.example.com')
                           ELSE source || '.example.com' END,
                      '/page/', CAST(doc_id // 7 AS VARCHAR),
                      CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END,
                      CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&utm_id=9' ELSE '' END) AS raw_url
        FROM documents WHERE doc_id < 7000),
      c AS (
        SELECT chost, raw_url,
               regexp_replace(regexp_replace(lower(raw_url), '\?utm_[^#]*$', ''), '/$', '') AS canon_url
        FROM u)
      SELECT chost,
             count(DISTINCT raw_url) AS n_raw,
             count(DISTINCT canon_url) AS n_canonical
      FROM c GROUP BY chost ORDER BY chost""",

    "llm_perplexity_score" -> """
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE doc_id % 10 <= 1),
      train AS (SELECT w FROM tok WHERE doc_id % 10 = 1),
      counts AS (SELECT w, count(*) AS cnt FROM train GROUP BY w),
      lm AS (SELECT w, cnt FROM counts ORDER BY cnt DESC, w LIMIT 5000),
      tot AS (SELECT count(*) AS bigN, count(DISTINCT w) AS vocabV FROM train),
      test AS (SELECT doc_id, w FROM tok WHERE doc_id % 10 = 0 AND doc_id < 2000),
      scored AS (
        SELECT doc_id,
               CAST(round(-ln((coalesce(cnt, 0) + 1)::DOUBLE / (bigN + vocabV)::DOUBLE) * 1000000) AS BIGINT) AS nlp6
        FROM test LEFT JOIN lm USING (w) CROSS JOIN tot)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             round(CAST(sum(nlp6) AS DOUBLE) / (count(*) * 1000000.0), 4) AS avg_neg_logp
      FROM scored GROUP BY doc_id ORDER BY doc_id""",

    // map HOF results read back as scalars → relational restatement
    "fn_map_extra" -> """
      WITH c AS (
        SELECT user_id, event_type, count(*) AS n
        FROM events WHERE user_id < 300 GROUP BY user_id, event_type)
      SELECT user_id,
             CAST(2 * sum(n) AS BIGINT) AS doubled_total,
             CAST(count_if(n >= 2) AS BIGINT) AS n_frequent_types,
             CAST(sum(n * CASE event_type WHEN 'click' THEN 2 WHEN 'purchase' THEN 5 ELSE 0 END) AS BIGINT) AS weighted_score,
             string_agg(upper(event_type), ',' ORDER BY upper(event_type)) AS keys_upper
      FROM c GROUP BY user_id ORDER BY user_id""",

    // VARIANT is an encoding choice; the values compare as plain ints
    "fn_json_variant" -> """
      WITH e AS (
        SELECT event_type, CAST(props::JSON ->> 'k' AS INT) AS k FROM events)
      SELECT event_type, count(*) AS n,
             count(k) AS n_with_k,
             CAST(sum(k) AS BIGINT) AS sum_k,
             max(k) AS max_k
      FROM e GROUP BY event_type ORDER BY event_type""",

    "typed_group_gaps" -> """
      WITH e AS (
        SELECT user_id, epoch_us(ts) AS us FROM events WHERE user_id < 200),
      g AS (
        SELECT user_id,
               (us - lag(us) OVER (PARTITION BY user_id ORDER BY us)) // 60000000 AS gap
        FROM e)
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             coalesce(max(gap), -1) AS max_gap_min,
             coalesce(min(gap), -1) AS min_gap_min
      FROM g GROUP BY user_id ORDER BY user_id""",

    "fn_url" -> """
      WITH u AS (
        SELECT doc_id,
               concat('https://', source, '.example.com/docs/',
                      CAST(doc_id AS VARCHAR), '?lang=', lang, '&rev=2') AS url
        FROM documents WHERE doc_id < 1500)
      SELECT doc_id, url,
             regexp_extract(url, 'https://([^/]+)/', 1) AS host,
             regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
             regexp_extract(url, '\?(.*)$', 1) AS query,
             regexp_extract(url, '[?&]lang=([^&]*)', 1) AS q_lang
      FROM u ORDER BY doc_id""",

    // the source_* oracles aggregate the parquet directly; the Spark
    // side aggregates the same rows after a write→read through the
    // format under test, so serializer fidelity is what's being hashed
    "source_json_roundtrip" -> """
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
             epoch_us(min(ts)) AS first_ts_us,
             epoch_us(max(ts)) AS last_ts_us
      FROM events WHERE event_id % 20 = 0
      GROUP BY event_type ORDER BY event_type""",

    "source_orc_roundtrip" -> """
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents,
             max(l_shipdate) AS last_ship
      FROM lineitem WHERE l_orderkey % 10 = 0
      GROUP BY l_returnflag ORDER BY l_returnflag""",

    "sink_sorted_runs" -> """
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents,
             min(l_shipdate) AS first_ship,
             max(l_shipdate) AS last_ship
      FROM lineitem
      WHERE l_shipdate >= '1996-03-01' AND l_shipdate < '1996-06-01'
      GROUP BY l_returnflag ORDER BY l_returnflag""",

    "fn_stable_id" -> """
      WITH h AS (
        SELECT doc_id, md5(concat(
          CASE WHEN source IS NULL THEN 'n' ELSE 'v' || source END, chr(1),
          CASE WHEN text   IS NULL THEN 'n' ELSE 'v' || text   END)) AS m
        FROM documents WHERE doc_id < 1500)
      SELECT doc_id,
             concat(substr(m, 1, 8), '-', substr(m, 9, 4), '-', substr(m, 13, 4),
                    '-', substr(m, 17, 4), '-', substr(m, 21, 12)) AS stable_id
      FROM h ORDER BY doc_id""",

    "fn_try_cast" -> """
      WITH x AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 3 = 0
                    THEN concat(CAST(o_orderkey AS VARCHAR), 'x')
                    ELSE CAST(o_orderkey AS VARCHAR) END AS num_s,
               CASE WHEN o_orderkey % 5 = 0 THEN '2024-13-01'
                    ELSE '2024-06-15' END AS date_s
        FROM orders WHERE o_orderkey <= 4000),
      t2 AS (SELECT TRY_CAST(num_s AS BIGINT) AS as_num,
                    TRY_CAST(date_s AS DATE) AS as_date FROM x)
      SELECT count(*) AS n,
             count(as_num) AS n_num_ok,
             count(as_date) AS n_date_ok,
             CAST(sum(coalesce(as_num, 0)) AS BIGINT) AS num_total,
             count(DISTINCT as_date) AS n_dates
      FROM t2""",

    "agg_regression" -> """
      SELECT l_returnflag,
             round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
             round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
             round(regr_r2(l_extendedprice, l_quantity), 4) AS r2,
             CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    // bitmaps are exact — the oracle is plain COUNT(DISTINCT)
    "agg_bitmap_distinct" -> """
      WITH per AS (
        SELECT o_orderpriority, CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust
        FROM orders GROUP BY o_orderpriority),
      allr AS (
        SELECT 'ALL' AS o_orderpriority, CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust
        FROM orders)
      SELECT * FROM per UNION ALL SELECT * FROM allr ORDER BY o_orderpriority""",

    "set_union_by_name" -> """
      WITH v1 AS (
        SELECT o_orderkey AS key, o_orderpriority AS prio, NULL::BIGINT AS cents
        FROM orders WHERE o_orderkey % 10 = 1),
      v2 AS (
        SELECT o_orderkey AS key, NULL::VARCHAR AS prio,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey % 10 = 2),
      u AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
      SELECT prio IS NULL AS from_v2, count(*) AS n,
             count(prio) AS n_prio,
             CAST(coalesce(sum(cents), 0) AS BIGINT) AS cents
      FROM u GROUP BY from_v2 ORDER BY from_v2""",

    // XML codec roundtrip: the serialized text stays out of the hash
    // (layout is engine-specific); parsed-back values mirror the direct
    // computation, entity escaping included
    "fn_xml" -> """
      SELECT c_custkey, c_custkey AS k,
             c_mktsegment || ' & <co>' AS seg,
             CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      FROM customer WHERE c_custkey <= 500 ORDER BY c_custkey""",

    "fn_csv_struct" -> """
      WITH c AS (
        SELECT c_custkey, c_mktsegment AS seg,
               CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        FROM customer WHERE c_custkey <= 500)
      SELECT c_custkey, c_custkey AS k, seg, cents,
             concat(CAST(c_custkey AS VARCHAR), ',', seg, ',', CAST(cents AS VARCHAR)) AS reserialized
      FROM c ORDER BY c_custkey""",

    // Full MinHash mirror: identical shingling (split on ' ', drop empty
    // tokens, word-3-grams), identical md5-derived 31-bit shingle hash,
    // identical LCG permutation family (a·h+b mod 2^31−1) — so signatures,
    // band collisions, and est_jaccard agree value-for-value with the
    // native graft_minhash expression. The Spark side's xxhash64 band key
    // is mirrored by direct band-slice equality (equivalent: the band key
    // is injective on the slice modulo a 2^-64 collision).
    "llm_dedup_minhash" -> """
      WITH wd AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
        FROM documents),
      sh AS (
        SELECT doc_id,
               CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                    ELSE list_distinct(list_transform(range(1, len(w) - 1), i ->
                         array_to_string(w[i:i+2], ' '))) END AS shs
        FROM wd),
      hs AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT) & 2147483647 AS h
        FROM (SELECT doc_id, unnest(shs) AS g FROM sh)),
      perm AS (
        SELECT i,
               1 + (1664525 * (i + 1) + 1013904223) % 2147483646 AS a,
               (22695477 * (i + 1) + 1) % 2147483647 AS b
        FROM range(64) t(i)),
      sig AS (
        SELECT doc_id, i, min((a * h + b) % 2147483647) AS v
        FROM hs CROSS JOIN perm GROUP BY doc_id, i),
      bands AS (
        SELECT doc_id, i // 4 AS band,
               string_agg(CAST(v AS VARCHAR), ',' ORDER BY i) AS bkey
        FROM sig GROUP BY doc_id, i // 4),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
        WHERE a.doc_id < b.doc_id),
      sigv AS (SELECT doc_id, list(v ORDER BY i) AS sig FROM sig GROUP BY doc_id)
      SELECT c.doc_a, c.doc_b,
             len(list_filter(range(1, 65), j -> sa.sig[j] = sb.sig[j])) / 64.0 AS est_jaccard
      FROM cand c
      JOIN sigv sa ON sa.doc_id = c.doc_a
      JOIN sigv sb ON sb.doc_id = c.doc_b
      WHERE len(list_filter(range(1, 65), j -> sa.sig[j] = sb.sig[j])) / 64.0 >= 0.2
      ORDER BY doc_a, doc_b""",

    // The composed pipeline mirror: minhash signatures recomputed
    // arithmetically (same CTEs as llm_dedup_minhash), band-slice
    // candidates, integer similarity gate (>= 32/64 matching rows),
    // recursive-CTE component closure, keep-best survivor per group.
    "llm_dedup_pipeline" -> """
      WITH wd AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
        FROM documents),
      sh AS (
        SELECT doc_id,
               CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                    ELSE list_distinct(list_transform(range(1, len(w) - 1), i ->
                         array_to_string(w[i:i+2], ' '))) END AS shs
        FROM wd),
      hs AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT) & 2147483647 AS h
        FROM (SELECT doc_id, unnest(shs) AS g FROM sh)),
      perm AS (
        SELECT i,
               1 + (1664525 * (i + 1) + 1013904223) % 2147483646 AS a,
               (22695477 * (i + 1) + 1) % 2147483647 AS b
        FROM range(64) t(i)),
      sig AS (
        SELECT doc_id, i, min((a * h + b) % 2147483647) AS v
        FROM hs CROSS JOIN perm GROUP BY doc_id, i),
      bands AS (
        SELECT doc_id, i // 4 AS band,
               string_agg(CAST(v AS VARCHAR), ',' ORDER BY i) AS bkey
        FROM sig GROUP BY doc_id, i // 4),
      cand AS (
        SELECT DISTINCT a.doc_id AS s, b.doc_id AS d
        FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
        WHERE a.doc_id < b.doc_id),
      sigv AS (SELECT doc_id, list(v ORDER BY i) AS sig FROM sig GROUP BY doc_id),
      sim AS (
        SELECT c.s, c.d FROM cand c
        JOIN sigv sa ON sa.doc_id = c.s
        JOIN sigv sb ON sb.doc_id = c.d
        WHERE len(list_filter(range(1, 65), j -> sa.sig[j] = sb.sig[j])) >= 32),
      e AS (SELECT s, d FROM sim UNION SELECT d, s FROM sim),
      nodes AS (SELECT DISTINCT s AS n FROM e),
      r AS (
        WITH RECURSIVE reach(n, m) AS (
          SELECT n, n FROM nodes
          UNION
          SELECT e.s, reach.m FROM e JOIN reach ON e.d = reach.n)
        SELECT n, min(m) AS rep FROM reach GROUP BY n),
      j AS (SELECT r.rep, r.n, documents.n_chars
            FROM r JOIN documents ON documents.doc_id = r.n),
      g AS (SELECT rep, count(*) AS n_docs, max(n_chars) AS kept_chars
            FROM j GROUP BY rep),
      k AS (SELECT rep, n AS kept_doc FROM (
              SELECT rep, n, row_number() OVER (PARTITION BY rep ORDER BY n_chars DESC, n DESC) AS rk
              FROM j) WHERE rk = 1)
      SELECT g.rep AS group_rep, g.n_docs, k.kept_doc, g.kept_chars,
             g.n_docs - 1 AS n_removed
      FROM g JOIN k USING (rep) ORDER BY group_rep""",

    // Full SimHash mirror: md5-derived 64-bit token hash (first 16 md5
    // hex chars), per-bit majority votes over token OCCURRENCES, 4×16-bit
    // pigeonhole banding, exact Hamming on candidates. est/limit ordering
    // (hamming, doc_a, doc_b) is a total order, so LIMIT 100 is stable.
    "llm_dedup_simhash" -> """
      WITH tok AS (
        SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
        FROM documents),
      th AS (
        SELECT doc_id, CAST(('0x' || substr(md5(w), 1, 16)) AS UBIGINT) AS h
        FROM tok),
      votes AS (
        SELECT doc_id, j,
               sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS acc
        FROM th CROSS JOIN (SELECT unnest(range(64)) AS j) b
        GROUP BY doc_id, j),
      sig AS (
        SELECT doc_id,
               sum(CASE WHEN acc > 0 THEN CAST(1 AS UBIGINT) << CAST(j AS INT)
                        ELSE CAST(0 AS UBIGINT) END) AS sig
        FROM votes GROUP BY doc_id),
      bands AS (
        SELECT doc_id, sig, b AS band, (sig >> (b * 16)) & 65535 AS bkey
        FROM sig CROSS JOIN (SELECT unnest(range(4)) AS b) t),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
        FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
        WHERE a.doc_id < b.doc_id)
      SELECT doc_a, doc_b, hamming FROM cand
      WHERE hamming <= 24
      ORDER BY hamming, doc_a, doc_b
      LIMIT 100""",

    // Winnowing mirror: md5-derived char-5-gram hashes, window-4 robust
    // winnowing — per-window min via a ROWS frame, rightmost tie-break via
    // max(pos) over positions attaining the window min, consecutive-dup
    // drop via lag(minpos). Short docs (≤ W grams) emit the single min.
    "llm_fingerprint" -> """
      WITH d AS (
        SELECT doc_id, text, length(text) AS n FROM documents WHERE doc_id < 500),
      g AS (
        SELECT doc_id, n, unnest(range(1, greatest(n - 4, 1) + 1)) AS pos
        FROM d),
      h AS (
        SELECT g.doc_id, g.n, greatest(g.n - 4, 1) AS ng, g.pos,
               CAST(('0x' || substr(md5(CASE WHEN g.n < 5 THEN d.text
                     ELSE substr(d.text, CAST(g.pos AS INT), 5) END), 1, 8)) AS BIGINT) AS h
        FROM g JOIN d USING (doc_id)),
      wm AS (
        SELECT doc_id, pos AS s,
               min(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
               ng
        FROM h),
      sel AS (
        SELECT w.doc_id, w.s, max(p.pos) AS minpos, any_value(w.wmin) AS fp
        FROM wm w JOIN h p ON p.doc_id = w.doc_id
                          AND p.pos BETWEEN w.s AND w.s + 3 AND p.h = w.wmin
        WHERE w.ng > 4 AND w.s <= w.ng - 3
        GROUP BY w.doc_id, w.s),
      em AS (
        SELECT doc_id, s, minpos, fp,
               lag(minpos) OVER (PARTITION BY doc_id ORDER BY s) AS prevpos
        FROM sel),
      agg AS (
        SELECT doc_id,
               CAST(count_if(prevpos IS NULL OR minpos <> prevpos) AS BIGINT) AS n_fps,
               min(CASE WHEN prevpos IS NULL THEN fp END) AS fp_first
        FROM em GROUP BY doc_id),
      small AS (
        SELECT doc_id, CAST(1 AS BIGINT) AS n_fps, min(h) AS fp_first
        FROM h WHERE ng <= 4 GROUP BY doc_id)
      SELECT d.doc_id, CAST(d.n AS INT) AS n_chars_txt, a.n_fps, a.fp_first
      FROM d JOIN (SELECT * FROM agg UNION ALL SELECT * FROM small) a USING (doc_id)
      ORDER BY doc_id""",

    // Lloyd's k-means, 3 unrolled rounds, k=8 — integer-exact mirror:
    // quantized vectors, Σ(Δq)² distances, (d2, cell) argmin, floor-div
    // centroid updates. pos labeling differs (0- vs 1-based) but is only
    // ever a join key within one engine.
    "llm_kmeans_train" -> """
      WITH qv AS (
        SELECT vec_id, pos, CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT) AS xq
        FROM (SELECT vec_id, unnest(embedding) AS x,
                     generate_subscripts(embedding, 1) AS pos
              FROM embeddings)),
      c0 AS (SELECT vec_id AS cell, pos, xq AS cq FROM qv WHERE vec_id < 8),
      d1 AS (SELECT q.vec_id, c.cell, CAST(sum((q.xq - c.cq) * (q.xq - c.cq)) AS BIGINT) AS d2
             FROM qv q JOIN c0 c USING (pos) GROUP BY q.vec_id, c.cell),
      a1 AS (SELECT vec_id, cell FROM (
               SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
               FROM d1) WHERE rn = 1),
      c1 AS (SELECT a.cell, q.pos, CAST(floor(sum(q.xq)::DOUBLE / count(*)) AS BIGINT) AS cq
             FROM qv q JOIN a1 a USING (vec_id) GROUP BY a.cell, q.pos),
      d2_ AS (SELECT q.vec_id, c.cell, CAST(sum((q.xq - c.cq) * (q.xq - c.cq)) AS BIGINT) AS d2
              FROM qv q JOIN c1 c USING (pos) GROUP BY q.vec_id, c.cell),
      a2 AS (SELECT vec_id, cell FROM (
               SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
               FROM d2_) WHERE rn = 1),
      c2 AS (SELECT a.cell, q.pos, CAST(floor(sum(q.xq)::DOUBLE / count(*)) AS BIGINT) AS cq
             FROM qv q JOIN a2 a USING (vec_id) GROUP BY a.cell, q.pos),
      d3 AS (SELECT q.vec_id, c.cell, CAST(sum((q.xq - c.cq) * (q.xq - c.cq)) AS BIGINT) AS d2
             FROM qv q JOIN c2 c USING (pos) GROUP BY q.vec_id, c.cell),
      a3 AS (SELECT vec_id, cell FROM (
               SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
               FROM d3) WHERE rn = 1),
      c3 AS (SELECT a.cell, q.pos, CAST(floor(sum(q.xq)::DOUBLE / count(*)) AS BIGINT) AS cq
             FROM qv q JOIN a3 a USING (vec_id) GROUP BY a.cell, q.pos),
      df AS (SELECT q.vec_id, c.cell, CAST(sum((q.xq - c.cq) * (q.xq - c.cq)) AS BIGINT) AS d2
             FROM qv q JOIN c3 c USING (pos) GROUP BY q.vec_id, c.cell),
      af AS (SELECT vec_id, cell, d2 FROM (
               SELECT vec_id, cell, d2, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
               FROM df) WHERE rn = 1),
      norms AS (SELECT cell, round(sqrt(sum(cq * cq)::DOUBLE) / 10000.0, 4) AS centroid_norm
                FROM c3 GROUP BY cell)
      SELECT af.cell, count(*) AS n_vecs, CAST(sum(af.d2) AS BIGINT) AS inertia,
             any_value(n.centroid_norm) AS centroid_norm
      FROM af JOIN norms n USING (cell)
      GROUP BY af.cell ORDER BY af.cell""",

    // Full LSH mirror: the md5-derived Irwin-Hall plane components are
    // recomputed in SQL (same index arithmetic, same (h>>>11)/2^53
    // uniform), buckets are the same sign patterns, and the final exact
    // top-5 ranks on the 4-rounded cosine — value-for-value with the
    // Spark path.
    "llm_sim_lsh_topk" -> """
      WITH uvals AS (
        SELECT i,
               ((CAST(('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 16)) AS UBIGINT) >> 11)::DOUBLE
                / 9007199254740992.0) * 2.0 - 1.0 AS u
        FROM range(16384) t(i)),
      comp AS (
        SELECT c.pi, c.d, u0.u + u1.u + u2.u + u3.u AS v
        FROM (SELECT pi, d, (pi * 64 + d) * 4 AS o
              FROM range(64) p(pi), range(64) dd(d)) c
        JOIN uvals u0 ON u0.i = c.o
        JOIN uvals u1 ON u1.i = c.o + 1
        JOIN uvals u2 ON u2.i = c.o + 2
        JOIN uvals u3 ON u3.i = c.o + 3),
      plane AS (SELECT pi, list(v ORDER BY d) AS p FROM comp GROUP BY pi),
      n AS (
        SELECT vec_id, embedding,
               sqrt((SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                     FROM unnest(embedding) AS u(x))) AS nrm
        FROM embeddings),
      vb AS (
        SELECT e.vec_id, pl.pi // 8 AS tb, pl.pi % 8 AS bit,
               CASE WHEN (SELECT sum(a * b) FROM (
                            SELECT unnest(pl.p) AS a,
                                   CAST(unnest(e.embedding) AS DOUBLE) AS b)) >= 0
                    THEN 1 ELSE 0 END AS s
        FROM n e CROSS JOIN plane pl),
      bkts AS (
        SELECT vec_id, tb, tb * 65536 + CAST(sum(s * (1 << CAST(bit AS INT))) AS BIGINT) AS bkt
        FROM vb GROUP BY vec_id, tb),
      cand AS (
        SELECT DISTINCT p.vec_id AS pid, e.vec_id AS nid
        FROM bkts p JOIN bkts e ON p.bkt = e.bkt
        WHERE p.vec_id < 10 AND e.vec_id <> p.vec_id),
      pairs AS (
        SELECT cand.pid, cand.nid,
               round((SELECT sum(a * b) FROM (
                        SELECT CAST(unnest(pp.embedding) AS DOUBLE) AS a,
                               CAST(unnest(nn.embedding) AS DOUBLE) AS b))
                     / (pp.nrm * nn.nrm), 4) AS cos
        FROM cand JOIN n pp ON pp.vec_id = cand.pid
                  JOIN n nn ON nn.vec_id = cand.nid)
      SELECT pid, nid, cos, rnk FROM (
        SELECT pid, nid, cos,
               row_number() OVER (PARTITION BY pid ORDER BY cos DESC, nid) AS rnk
        FROM pairs)
      WHERE rnk <= 5 ORDER BY pid, rnk""",

    // Full IVF mirror: argmax cell assignment (d desc, cell asc — the
    // TopKAggregator's exact ordering), 2-probe cells per query, pair
    // dedup, rounded-cosine top-5.
    "llm_sim_ivf_topk" -> """
      WITH n AS (
        SELECT vec_id, embedding,
               sqrt((SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                     FROM unnest(embedding) AS u(x))) AS nrm
        FROM embeddings),
      cents AS (SELECT vec_id AS cell, embedding AS cv FROM n WHERE vec_id < 16),
      scored AS (
        SELECT e.vec_id, c.cell,
               (SELECT sum(a * b) FROM (
                  SELECT CAST(unnest(e.embedding) AS DOUBLE) AS a,
                         CAST(unnest(c.cv) AS DOUBLE) AS b)) AS d
        FROM n e CROSS JOIN cents c),
      assigned AS (
        SELECT vec_id, cell FROM (
          SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell) AS r
          FROM scored) WHERE r = 1),
      probecells AS (
        SELECT vec_id AS pid, cell FROM (
          SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell) AS r
          FROM scored WHERE vec_id < 10) WHERE r <= 2),
      cand AS (
        SELECT DISTINCT p.pid, a.vec_id AS nid
        FROM assigned a JOIN probecells p ON a.cell = p.cell
        WHERE a.vec_id <> p.pid),
      pairs AS (
        SELECT cand.pid, cand.nid,
               round((SELECT sum(a * b) FROM (
                        SELECT CAST(unnest(pp.embedding) AS DOUBLE) AS a,
                               CAST(unnest(nn.embedding) AS DOUBLE) AS b))
                     / (pp.nrm * nn.nrm), 4) AS cos
        FROM cand JOIN n pp ON pp.vec_id = cand.pid
                  JOIN n nn ON nn.vec_id = cand.nid)
      SELECT pid, nid, cos, rnk FROM (
        SELECT pid, nid, cos,
               row_number() OVER (PARTITION BY pid ORDER BY cos DESC, nid) AS rnk
        FROM pairs)
      WHERE rnk <= 5 ORDER BY pid, rnk""",

    // ANN recall: both parents' chains over ONE shared norms CTE —
    // brute-force truth top-5 vs IVF candidate top-5, per-probe
    // intersection count, half-up recall ratio
    "llm_sim_recall" -> s"""
      WITH ${annRecallCtes(5)}
      SELECT t.pid, CAST(count(*) AS BIGINT) AS n_true,
             CAST(count(a.nid) AS BIGINT) AS n_hit,
             ${N.ratio("count(a.nid)", "count(*)", 4)} AS recall_at_5
      FROM truth t LEFT JOIN approx a ON t.pid = a.pid AND t.nid = a.nid
      GROUP BY t.pid ORDER BY t.pid""",

    // navigable-graph beam search replayed in full: LSH-bucket ∪
    // 2-cell-mate candidate pairs -> per-node top-10 by rounded cosine
    // -> symmetrized; self-entry at the probe's adjacency list, then 2
    // unrolled expand/score/beam-4 hops (NOT EXISTS = the engine's
    // left_anti dedup); graded against the same brute-force truth as
    // the recall siblings
    "llm_sim_hnsw_topk" -> s"""
      WITH $hnswGraphCtes,
      ${hnswSearchCtes("", 4, 2)},
      nv AS (SELECT pid, CAST(count(*) AS BIGINT) AS n_visited FROM vis2 GROUP BY pid)
      SELECT t.pid, nv.n_visited,
             CAST(count(*) FILTER (WHERE t.rnk <= 5 AND a.ra <= 5) AS BIGINT) AS n_hit_5,
             CAST(count(*) FILTER (WHERE a.ra <= 10) AS BIGINT) AS n_hit_10,
             ${N.ratio("count(*) FILTER (WHERE t.rnk <= 5 AND a.ra <= 5)",
                       "count(*) FILTER (WHERE t.rnk <= 5)", 4)} AS recall_at_5,
             ${N.ratio("count(*) FILTER (WHERE a.ra <= 10)", "count(*)", 4)} AS recall_at_10
      FROM truth t LEFT JOIN appr a ON a.pid = t.pid AND a.nid = t.nid
      JOIN nv ON nv.pid = t.pid
      GROUP BY t.pid, nv.n_visited ORDER BY t.pid""",

    // the tuning sweep: three budget configs over ONE shared graph
    // build — skim (2,1), the graded default (4,2), deep (8,3) — each
    // an aggregate row of exact hit sums + half-up ratio recalls
    "llm_sim_hnsw_tune" -> s"""
      WITH $hnswGraphCtes,
      ${hnswSearchCtes("s1", 2, 1)},
      ${hnswSearchCtes("s2", 4, 2)},
      ${hnswSearchCtes("s3", 8, 3)}
      SELECT * FROM (${hnswTuneRow("s1", 2, 1)}
        UNION ALL${hnswTuneRow("s2", 4, 2)}
        UNION ALL${hnswTuneRow("s3", 8, 3)})
      ORDER BY beam_b""",
    // the recall CURVE: both sides ranked to depth 10 once; recalls at
    // k ∈ {1,5,10} are prefix intersections over the SAME ranked join
    // (a hit at k = ranked ≤ k on both sides), half-up integer ratios
    "llm_sim_recall_at_k" -> s"""
      WITH ${annRecallCtes(10)}
      SELECT t.pid,
             CAST(count(*) FILTER (WHERE t.rnk <= 1 AND a.rnk <= 1) AS BIGINT) AS n_hit_1,
             CAST(count(*) FILTER (WHERE t.rnk <= 5 AND a.rnk <= 5) AS BIGINT) AS n_hit_5,
             CAST(count(a.nid) AS BIGINT) AS n_hit_10,
             CAST(count(*) AS BIGINT) AS n_true_10,
             ${N.ratio("count(*) FILTER (WHERE t.rnk <= 1 AND a.rnk <= 1)",
                       "count(*) FILTER (WHERE t.rnk <= 1)", 4)} AS recall_at_1,
             ${N.ratio("count(*) FILTER (WHERE t.rnk <= 5 AND a.rnk <= 5)",
                       "count(*) FILTER (WHERE t.rnk <= 5)", 4)} AS recall_at_5,
             ${N.ratio("count(a.nid)", "count(*)", 4)} AS recall_at_10
      FROM truth t LEFT JOIN approx a ON t.pid = a.pid AND t.nid = a.nid
      GROUP BY t.pid ORDER BY t.pid""",

    // Reference-equivalent ETL under the oracle: DuckDB re-ingests the
    // SAME fixture CSVs (geoheader declared schema; e-file cell slice
    // c7/c8 for table B00001 with ''/'.' null coercion) and re-derives
    // the per-sumlevel rollup — the whole A3-A11 pipeline checked
    // value-for-value, not only by golden pin.
    // the Spark side derives every value from bytes that round-tripped
    // through the .shp/.dbf codec; the oracle recomputes them from the
    // nation dim directly — codec bugs surface as hash mismatches
    "ingest_tiger_shapefile" -> """
      SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
             n_name,
             CAST(5 AS BIGINT) AS num_points,
             CAST(4 * n_nationkey AS BIGINT) AS min_x,
             CAST(3 * n_regionkey AS BIGINT) AS min_y,
             CAST(4 * n_nationkey + 2 AS BIGINT) AS max_x,
             CAST(3 * n_regionkey + 2 AS BIGINT) AS max_y,
             CAST(n_nationkey * 1000 + n_regionkey AS BIGINT) AS pop
      FROM nation ORDER BY n_nationkey""",

    // WKT assembled from parsed .shp bytes on the Spark side; the oracle
    // rebuilds the identical POLYGON text arithmetically from nation —
    // geometry decode AND text assembly both under the gate
    "tiger_wkt_export" -> """
      SELECT CAST(n_nationkey AS BIGINT) AS gid,
             n_name AS name,
             CAST(n_nationkey * 1000 + n_regionkey AS BIGINT) AS pop,
             'POLYGON((' ||
               (4*n_nationkey)   || ' ' || (3*n_regionkey)   || ',' ||
               (4*n_nationkey+2) || ' ' || (3*n_regionkey)   || ',' ||
               (4*n_nationkey+2) || ' ' || (3*n_regionkey+2) || ',' ||
               (4*n_nationkey)   || ' ' || (3*n_regionkey+2) || ',' ||
               (4*n_nationkey)   || ' ' || (3*n_regionkey)   || '))' AS geom_wkt
      FROM nation ORDER BY gid""",

    // the Spark side runs a GENERIC even-odd ray cast over the decoded
    // ring arrays; the oracle exploits the known fixture geometry
    // (axis-aligned squares) via strict BETWEEN — the general algorithm
    // must agree with the closed form on every polygon. Points are
    // half-integers so boundary semantics cannot diverge.
    "tiger_point_in_polygon" -> """
      WITH p AS (
        SELECT c_custkey AS id,
               CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || 'tx'), 1, 15)) AS BIGINT) % 100 + 0.5 AS px,
               CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || 'ty'), 1, 15)) AS BIGINT) % 15 + 0.5 AS py
        FROM customer WHERE c_custkey < 3000),
      n AS (
        SELECT CAST(n_nationkey AS BIGINT) AS gid,
               4*n_nationkey AS x0, 3*n_regionkey AS y0
        FROM nation)
      SELECT gid,
             CAST(count(p.id) AS BIGINT) AS n_pts,
             CAST(coalesce(sum(p.id), 0) AS BIGINT) AS sum_ids
      FROM n LEFT JOIN p
        ON p.px > n.x0 AND p.px < n.x0 + 2
       AND p.py > n.y0 AND p.py < n.y0 + 2
      GROUP BY gid ORDER BY gid""",

    // read back out of live Postgres; values identical to the WKT
    // export — the COPY round-trip must be lossless
    "sink_tiger_postgres" -> """
      SELECT CAST(n_nationkey AS BIGINT) AS gid,
             n_name AS name,
             CAST(n_nationkey * 1000 + n_regionkey AS BIGINT) AS pop,
             'POLYGON((' ||
               (4*n_nationkey)   || ' ' || (3*n_regionkey)   || ',' ||
               (4*n_nationkey+2) || ' ' || (3*n_regionkey)   || ',' ||
               (4*n_nationkey+2) || ' ' || (3*n_regionkey+2) || ',' ||
               (4*n_nationkey)   || ' ' || (3*n_regionkey+2) || ',' ||
               (4*n_nationkey)   || ' ' || (3*n_regionkey)   || '))' AS geom_wkt
      FROM nation ORDER BY gid""",

    "ingest_census_csv" -> """
      WITH geo AS (
        SELECT stusab, sumlevel, logrecno
        FROM read_csv(['/root/repo/src/main/resources/acs/g20145xa.csv',
                       '/root/repo/src/main/resources/acs/g20145xb.csv'],
             header=false,
             columns={'fileid':'VARCHAR','stusab':'VARCHAR','sumlevel':'VARCHAR',
                      'component':'VARCHAR','logrecno':'INTEGER','geoid':'VARCHAR','name':'VARCHAR'})),
      e AS (
        SELECT c3 AS stusab, CAST(c6 AS INTEGER) AS logrecno,
               CAST(nullif(nullif(c7, ''), '.') AS DOUBLE) AS b00001001,
               CAST(nullif(nullif(c8, ''), '.') AS DOUBLE) AS b00001002
        FROM read_csv(['/root/repo/src/main/resources/acs/e20145xa0001000.txt',
                       '/root/repo/src/main/resources/acs/e20145xb0001000.txt'],
             header=false, all_varchar=true,
             columns={'c1':'VARCHAR','c2':'VARCHAR','c3':'VARCHAR','c4':'VARCHAR','c5':'VARCHAR',
                      'c6':'VARCHAR','c7':'VARCHAR','c8':'VARCHAR','c9':'VARCHAR','c10':'VARCHAR','c11':'VARCHAR'}))
      SELECT sumlevel,
             count(*) AS n_geo,
             sum(b00001001) AS sum_total,
             sum(b00001002) AS sum_male
      FROM e JOIN geo ON e.stusab = geo.stusab AND e.logrecno = geo.logrecno
      GROUP BY sumlevel ORDER BY sumlevel""",

    "llm_hash_embedding" -> """
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE doc_id < 2000),
      hb AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(w), 1, 2)) AS INT) % 64 AS b,
               CASE WHEN CAST(('0x' || substr(md5(w), 3, 1)) AS INT) % 2 = 0
                    THEN 1 ELSE -1 END AS sg
        FROM tok),
      vec AS (SELECT doc_id, b, sum(sg) AS v FROM hb GROUP BY doc_id, b)
      SELECT doc_id,
             CAST(count_if(v <> 0) AS BIGINT) AS nz_dims,
             CAST(sum(abs(v)) AS BIGINT) AS l1,
             CAST(sum(v) AS BIGINT) AS net
      FROM vec GROUP BY doc_id ORDER BY doc_id""",

    // argmax assignment + within-cell pairs, double-accumulated dots on
    // unit-norm vectors — deterministic tie-break (d desc, cell asc)
    "llm_semdedup" -> """
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      c AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 16),
      sc AS (SELECT e.vec_id, c.cell, list_dot_product(e.v, c.cv) AS d
             FROM e CROSS JOIN c),
      a AS (SELECT vec_id, cell FROM (
              SELECT vec_id, cell,
                     row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell) AS rk
              FROM sc) WHERE rk = 1),
      av AS (SELECT a.vec_id, a.cell, e.v FROM a JOIN e USING (vec_id)),
      p AS (SELECT x.cell, round(list_dot_product(x.v, y.v), 4) AS cos
            FROM av x JOIN av y ON x.cell = y.cell AND x.vec_id < y.vec_id)
      SELECT cell, count(*) AS n_pairs,
             CAST(count_if(cos >= 0.30) AS BIGINT) AS n_dups,
             max(cos) AS max_cos
      FROM p GROUP BY cell ORDER BY cell""",

    // same pair/rollup mirror as llm_semdedup but the centroid budget is
    // data-derived — greatest(16, ceil(sqrt(n))), the 16 floor matching
    // Ivf.NCells — and the assignment is the engine's TWO-LEVEL
    // quantizer: coarse reps = first greatest(4, ceil(sqrt(k))) vectors;
    // centroid→coarse and vector→coarse argmax, then the exact argmax
    // over only the coarse group's centroids. Identical (d DESC, id ASC)
    // tie rule at every level.
    "llm_semdedup_adaptive" -> """
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      nc AS (SELECT greatest(16, CAST(ceil(sqrt(count(*))) AS BIGINT)) AS k FROM e),
      ncc AS (SELECT k, greatest(4, CAST(ceil(sqrt(k)) AS BIGINT)) AS kc FROM nc),
      r AS (SELECT vec_id AS crs, v AS rv FROM e WHERE vec_id < (SELECT kc FROM ncc)),
      c AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < (SELECT k FROM ncc)),
      c2 AS (SELECT crs, cell, cv FROM (
              SELECT r.crs, c.cell, c.cv,
                     row_number() OVER (PARTITION BY c.cell
                       ORDER BY list_dot_product(c.cv, r.rv) DESC, r.crs) AS rk
              FROM c CROSS JOIN r) WHERE rk = 1),
      vc AS (SELECT vec_id, v, crs FROM (
              SELECT e.vec_id, e.v, r.crs,
                     row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY list_dot_product(e.v, r.rv) DESC, r.crs) AS rk
              FROM e CROSS JOIN r) WHERE rk = 1),
      a AS (SELECT vec_id, cell FROM (
              SELECT vc.vec_id, c2.cell,
                     row_number() OVER (PARTITION BY vc.vec_id
                       ORDER BY list_dot_product(vc.v, c2.cv) DESC, c2.cell) AS rk
              FROM vc JOIN c2 USING (crs)) WHERE rk = 1),
      av AS (SELECT a.vec_id, a.cell, e.v FROM a JOIN e USING (vec_id)),
      p AS (SELECT x.cell, round(list_dot_product(x.v, y.v), 4) AS cos
            FROM av x JOIN av y ON x.cell = y.cell AND x.vec_id < y.vec_id)
      SELECT cell, count(*) AS n_pairs,
             CAST(count_if(cos >= 0.30) AS BIGINT) AS n_dups,
             max(cos) AS max_cos
      FROM p GROUP BY cell ORDER BY cell""",

    // same md5-nibble split rule as llm_hash_split; same substr gram
    // expansion as llm_ngram_novelty
    "llm_split_overlap" -> s"""
      WITH sp AS (
        SELECT text,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c','d') THEN 'val'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('e','f') THEN 'test'
                    ELSE 'train' END AS split
        FROM documents),
      grams AS (
        SELECT DISTINCT split, unnest([substr(text, CAST(i AS INT), 8)
                                       FOR i IN range(1, greatest(length(text)-7, 1)+1)]) AS g
        FROM sp),
      ov AS (
        SELECT a.split AS split_a, b.split AS split_b, count(*) AS n_overlap
        FROM grams a JOIN grams b USING (g)
        WHERE a.split <> b.split GROUP BY 1, 2),
      sz AS (SELECT split AS split_b, count(*) AS n_b_grams FROM grams GROUP BY 1)
      SELECT split_a, split_b, n_b_grams, n_overlap,
             ${N.ratio("n_overlap", "n_b_grams", 4)} AS contamination
      FROM ov JOIN sz USING (split_b) ORDER BY split_a, split_b""",

    "llm_ngram_novelty" -> s"""
      WITH grams AS (
        SELECT doc_id, lang, unnest([substr(text, CAST(i AS INT), 8)
                                     FOR i IN range(1, greatest(length(text)-7, 1)+1)]) AS g
        FROM documents WHERE doc_id % 10 <= 1),
      train AS (SELECT DISTINCT g FROM grams WHERE doc_id % 10 = 1),
      test AS (SELECT DISTINCT lang, g FROM grams WHERE doc_id % 10 = 0),
      novel AS (
        SELECT lang, count(*) AS n_novel FROM test
        WHERE g NOT IN (SELECT g FROM train) GROUP BY lang),
      tot AS (SELECT lang, count(*) AS n_test FROM test GROUP BY lang)
      SELECT tot.lang, tot.n_test,
             CAST(coalesce(novel.n_novel, 0) AS BIGINT) AS n_novel,
             ${N.ratio("coalesce(novel.n_novel, 0)", "tot.n_test", 4)} AS novelty
      FROM tot LEFT JOIN novel USING (lang) ORDER BY lang""",

    // the variable/EXECUTE IMMEDIATE machinery constant-folds — static mirror
    // compound-script control flow runs driver-side; the loop's fixed
    // point (threshold 42.0 = 10 + 4 rounds × 8) constant-folds into
    // the static mirror
    "sql_scripting" -> """
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem WHERE l_quantity > 42.0
      GROUP BY l_returnflag ORDER BY l_returnflag""",

    "sql_session_variable" -> """
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem WHERE l_quantity > 45.0
      GROUP BY l_returnflag ORDER BY l_returnflag""",

    // pipe syntax is sugar — classic-form mirror
    "sql_pipe_syntax" -> """
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem WHERE l_quantity > 45
      GROUP BY l_returnflag ORDER BY l_returnflag""",

    "sql_tvf_range" -> """
      SELECT r.range AS bucket, count(*) AS n, CAST(sum(t.x) AS BIGINT) AS sum_x
      FROM range(0, 8) r, LATERAL unnest(range(r.range * 3, r.range * 3 + 3)) t(x)
      GROUP BY r.range ORDER BY bucket""",

    // every codec row must equal the direct-parquet aggregate
    "sink_codec_roundtrip" -> """
      WITH agg AS (
        SELECT count(*) AS n,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey % 4 = 0)
      SELECT c.codec, agg.n, agg.cents
      FROM (VALUES ('gzip'), ('snappy'), ('zstd')) c(codec) CROSS JOIN agg
      ORDER BY c.codec""",

    "source_text_roundtrip" -> """
      SELECT substr(text, 1, 1) AS c1,
             count(*) AS n,
             CAST(sum(length(text)) AS BIGINT) AS total_chars,
             count(DISTINCT length(text)) AS n_lengths
      FROM documents WHERE doc_id % 5 = 0
      GROUP BY c1 ORDER BY c1""",

    "agg_pivot_multi" -> """
      SELECT o_orderpriority,
             CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS f_n,
             CAST(coalesce(sum(CASE WHEN o_orderstatus = 'F'
                    THEN CAST(round(o_totalprice * 100) AS BIGINT) END), 0) AS BIGINT) AS f_cents,
             CAST(count_if(o_orderstatus = 'O') AS BIGINT) AS o_n,
             CAST(coalesce(sum(CASE WHEN o_orderstatus = 'O'
                    THEN CAST(round(o_totalprice * 100) AS BIGINT) END), 0) AS BIGINT) AS o_cents
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "sink_partitioned_parquet" -> """
      SELECT CAST(ts AS DATE) AS day, event_type,
             count(*) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
      FROM events
      WHERE CAST(ts AS DATE) BETWEEN '2024-01-02' AND '2024-01-04'
      GROUP BY day, event_type ORDER BY day, event_type""",

    "source_csv_roundtrip" -> """
      SELECT c_mktsegment, count(*) AS n,
             CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents,
             count(DISTINCT c_nationkey) AS n_nations
      FROM customer
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "llm_bpe_pair_counts" -> """
      WITH w AS (
        SELECT unnest(string_split(text, ' ')) AS w
        FROM documents WHERE doc_id < 4000),
      p AS (
        SELECT substr(w, CAST(i AS INT), 2) AS pair
        FROM w, LATERAL unnest(range(1, greatest(length(w) - 1, 0) + 1)) t(i)
        WHERE length(w) >= 2)
      SELECT pair, count(*) AS n FROM p
      GROUP BY pair ORDER BY n DESC, pair LIMIT 20""",

    "stream_left_outer_join" -> s"""
      WITH c AS (SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'),
           p AS (SELECT user_id AS p_user, ts AS p_ts, value FROM events WHERE event_type = 'purchase')
      SELECT c.user_id % 10 AS user_decile,
             count(*) AS n_rows,
             count(p.p_ts) AS n_converted,
             CAST(sum(CASE WHEN p.p_ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unconverted,
             ${N.sumMoney("value")} AS attributed_value
      FROM c LEFT JOIN p ON c.user_id = p.p_user
        AND p.p_ts >= c.click_ts AND p.p_ts <= c.click_ts + INTERVAL 30 MINUTE
      GROUP BY c.user_id % 10 ORDER BY user_decile""",

    // oracle sees the parquet-side aggregate; the Spark side returns the
    // same rows ROUND-TRIPPED through a JDBC write+read, so any type or
    // identifier mangling in the sink path breaks the hash
    "sink_postgres" -> """
      SELECT r_name, n_name,
             count(*) AS n_suppliers,
             round(sum(CAST(round(s_acctbal * 100) AS BIGINT)) / 100.0, 2) AS total_bal
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name""",

    // Same aggregate as sink_postgres, but the Spark side's rows have
    // round-tripped through a LIVE PostgreSQL 15 (COPY in, COPY out) —
    // a hash match here proves the values survived PG's storage and
    // text I/O bit-for-bit.
    "sink_postgres_copy" -> """
      SELECT r_name, n_name,
             count(*) AS n_suppliers,
             round(sum(CAST(round(s_acctbal * 100) AS BIGINT)) / 100.0, 2) AS total_bal
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name""",

    // the SQL UDF is inlined by Spark's analyzer; the oracle states the
    // inlined exact-decimal body directly
    "sql_create_function" -> """
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(
               CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               - CAST(round(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(3,2)) * 100, 0) AS BIGINT)
               + CAST(round(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_tax AS DECIMAL(3,2)) * 100, 0) AS BIGINT)
             ) AS BIGINT) AS net_cents
      FROM lineitem
      GROUP BY l_returnflag ORDER BY l_returnflag""",

    "dq_schema_profile" -> """
      SELECT * FROM (
        SELECT 'o_orderkey' AS col_name, count(*) - count(o_orderkey) AS n_nulls,
               count(DISTINCT o_orderkey) AS n_distinct,
               CAST(min(o_orderkey) AS VARCHAR) AS min_val, CAST(max(o_orderkey) AS VARCHAR) AS max_val
        FROM orders
        UNION ALL
        SELECT 'o_custkey', count(*) - count(o_custkey), count(DISTINCT o_custkey),
               CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', count(*) - count(o_orderstatus), count(DISTINCT o_orderstatus),
               min(o_orderstatus), max(o_orderstatus)
        FROM orders
        UNION ALL
        SELECT 'o_totalprice', count(*) - count(o_totalprice), count(DISTINCT o_totalprice),
               CAST(CAST(min(o_totalprice) AS DECIMAL(12,2)) AS VARCHAR),
               CAST(CAST(max(o_totalprice) AS DECIMAL(12,2)) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_orderdate', count(*) - count(o_orderdate),
               count(DISTINCT CAST(o_orderdate AS DATE)),
               CAST(min(CAST(o_orderdate AS DATE)) AS VARCHAR),
               CAST(max(CAST(o_orderdate AS DATE)) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', count(*) - count(o_orderpriority), count(DISTINCT o_orderpriority),
               min(o_orderpriority), max(o_orderpriority)
        FROM orders)
      ORDER BY col_name""",

    "dq_anomaly_zscore" -> """
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, count(*) AS n_events
        FROM events GROUP BY CAST(ts AS DATE))
      SELECT day, n_events,
             round((n_events - avg(n_events) OVER ()) / stddev_samp(n_events) OVER (), 2) AS z,
             abs(round((n_events - avg(n_events) OVER ()) / stddev_samp(n_events) OVER (), 2)) >= 1.5 AS is_anomaly
      FROM daily ORDER BY day""",

    "event_cohort_retention" -> """
      WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events
                 WHERE event_type = 'purchase'),
      cohort AS (SELECT user_id, min(d) AS c0 FROM e GROUP BY user_id)
      SELECT CAST(date_trunc('week', c0) AS DATE) AS cohort_week,
             datediff('day', c0, d) // 7 AS age_weeks,
             count(DISTINCT e.user_id) AS n_users
      FROM e JOIN cohort USING (user_id)
      GROUP BY 1, 2 ORDER BY cohort_week, age_weeks""",

    // retention's revenue twin: frozen week-0 denominator, running sum
    // per cohort, half-up ratio to 2dp dollars
    "event_cohort_ltv" -> s"""
      WITH e AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'),
      cohort AS (SELECT user_id, min(d) AS c0 FROM e GROUP BY user_id),
      lab AS (
        SELECT CAST(date_trunc('week', c0) AS DATE) AS cohort_week,
               datediff('day', c0, d) // 7 AS age_weeks, e.user_id, e.cents
        FROM e JOIN cohort USING (user_id)),
      sz AS (SELECT cohort_week, CAST(count(DISTINCT user_id) AS BIGINT) AS cohort_size
             FROM lab WHERE age_weeks = 0 GROUP BY 1),
      cen AS (SELECT cohort_week, CAST(age_weeks AS BIGINT) AS age_weeks,
                     CAST(sum(cents) AS BIGINT) AS week_cents
              FROM lab GROUP BY 1, 2),
      cum AS (SELECT *, CAST(sum(week_cents) OVER (PARTITION BY cohort_week
                ORDER BY age_weeks ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_cents FROM cen)
      SELECT cum.cohort_week, cum.age_weeks, cum.week_cents, cum.cum_cents,
             sz.cohort_size,
             ${N.ratio("cum.cum_cents", "sz.cohort_size * 100", 2)} AS ltv_per_user
      FROM cum JOIN sz USING (cohort_week)
      ORDER BY cohort_week, age_weeks""",

    // bottom-k by md5(orderkey): reproducible uniform sample, exact
    // aggregates on both the sample and the population
    "agg_sample_bottomk" -> """
      WITH o AS (
        SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               md5(CAST(o_orderkey AS VARCHAR)) AS hk
        FROM orders),
      s AS (SELECT * FROM o ORDER BY hk, o_orderkey LIMIT 100),
      pop AS (SELECT CAST(count(*) AS BIGINT) AS pop_n,
                     CAST(sum(cents) AS BIGINT) AS pop_sum_cents FROM o)
      SELECT CAST(count(*) AS BIGINT) AS n_sample,
             CAST(sum(o_orderkey) AS BIGINT) AS sample_keys_sum,
             CAST(sum(cents) AS BIGINT) AS sample_sum_cents,
             pop.pop_n, pop.pop_sum_cents,
             CAST(sum(cents) // count(*) AS BIGINT) AS sample_avg_cents,
             CAST(pop.pop_sum_cents // pop.pop_n AS BIGINT) AS pop_avg_cents
      FROM s CROSS JOIN pop GROUP BY pop.pop_n, pop.pop_sum_cents""",

    // four censuses off one scan; modal language by (count DESC, lang),
    // value-census median, half-up ratios
    "llm_dataset_card" -> s"""
      WITH d AS (
        SELECT source, lang, n_chars, md5(text) AS h FROM documents),
      base AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               CAST(count(DISTINCT h) AS BIGINT) AS n_uniq,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(count(*) FILTER (WHERE n_chars < 100) AS BIGINT) AS n_short
        FROM d GROUP BY 1),
      tl AS (
        SELECT source, lang AS top_lang FROM (
          SELECT source, lang,
                 row_number() OVER (PARTITION BY source
                   ORDER BY count(*) DESC, lang) AS rn
          FROM d GROUP BY source, lang) WHERE rn = 1),
      lc AS (SELECT source, n_chars, CAST(count(*) AS BIGINT) AS cnt FROM d GROUP BY 1, 2),
      med AS (
        SELECT source, CAST(min(CASE WHEN cw * 2 >= tot THEN n_chars END) AS BIGINT) AS median_chars
        FROM (SELECT source, n_chars,
                     sum(cnt) OVER (PARTITION BY source ORDER BY n_chars
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
                     sum(cnt) OVER (PARTITION BY source) AS tot
              FROM lc)
        GROUP BY 1)
      SELECT base.source, base.n_docs, base.total_chars,
             CAST(base.total_chars // base.n_docs AS BIGINT) AS mean_chars,
             med.median_chars, base.n_langs, tl.top_lang,
             ${N.ratio("base.n_docs - base.n_uniq", "base.n_docs", 4)} AS dup_rate,
             ${N.ratio("base.n_short", "base.n_docs", 4)} AS short_share
      FROM base JOIN tl USING (source) JOIN med USING (source)
      ORDER BY source""",

    // the minhash band machinery verbatim, read out as the candidate
    // graph's clamped degree histogram + global pair count
    "llm_dup_graph_degree" -> """
      WITH wd AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
        FROM documents WHERE doc_id < 2000),
      sh AS (
        SELECT doc_id,
               CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                    ELSE list_distinct(list_transform(range(1, len(w) - 1), i ->
                         array_to_string(w[i:i+2], ' '))) END AS shs
        FROM wd),
      hs AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT) & 2147483647 AS h
        FROM (SELECT doc_id, unnest(shs) AS g FROM sh)),
      perm AS (
        SELECT i,
               1 + (1664525 * (i + 1) + 1013904223) % 2147483646 AS a,
               (22695477 * (i + 1) + 1) % 2147483647 AS b
        FROM range(64) t(i)),
      sig AS (
        SELECT doc_id, i, min((a * h + b) % 2147483647) AS v
        FROM hs CROSS JOIN perm GROUP BY doc_id, i),
      bands AS (
        SELECT doc_id, i // 4 AS band,
               string_agg(CAST(v AS VARCHAR), ',' ORDER BY i) AS bkey
        FROM sig GROUP BY doc_id, i // 4),
      cand AS (
        SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
        WHERE a.doc_id < b.doc_id),
      deg AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS deg FROM (
          SELECT da AS doc_id FROM cand UNION ALL SELECT db AS doc_id FROM cand)
        GROUP BY 1),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs_total FROM cand)
      SELECT least(deg, 20) AS deg_bucket, CAST(count(*) AS BIGINT) AS n_nodes,
             tot.n_pairs_total
      FROM deg CROSS JOIN tot GROUP BY 1, 3 ORDER BY deg_bucket""",

    // integer-exact PageRank, three unrolled rounds — same 1e-6-unit
    // arithmetic as the Spark loop, so the hashes match bit-for-bit
    "graph_pagerank" -> """
      WITH docs AS (
        SELECT doc_id AS node, source, n_chars // 100 AS blk
        FROM documents WHERE doc_id < 1200),
      edges AS (
        SELECT a.node AS u, b.node AS v
        FROM docs a JOIN docs b USING (source, blk)
        WHERE a.node <> b.node),
      deg AS (SELECT u, count(*) AS deg FROM edges GROUP BY u),
      r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM docs),
      c1 AS (SELECT e.v AS node, CAST(sum(r.r // d.deg) AS BIGINT) AS sc
             FROM edges e JOIN r0 r ON r.node = e.u JOIN deg d ON d.u = e.u GROUP BY e.v),
      r1 AS (SELECT docs.node, CAST(150000 + (850 * coalesce(c1.sc, 0)) // 1000 AS BIGINT) AS r
             FROM docs LEFT JOIN c1 ON c1.node = docs.node),
      c2 AS (SELECT e.v AS node, CAST(sum(r.r // d.deg) AS BIGINT) AS sc
             FROM edges e JOIN r1 r ON r.node = e.u JOIN deg d ON d.u = e.u GROUP BY e.v),
      r2 AS (SELECT docs.node, CAST(150000 + (850 * coalesce(c2.sc, 0)) // 1000 AS BIGINT) AS r
             FROM docs LEFT JOIN c2 ON c2.node = docs.node),
      c3 AS (SELECT e.v AS node, CAST(sum(r.r // d.deg) AS BIGINT) AS sc
             FROM edges e JOIN r2 r ON r.node = e.u JOIN deg d ON d.u = e.u GROUP BY e.v),
      r3 AS (SELECT docs.node, CAST(150000 + (850 * coalesce(c3.sc, 0)) // 1000 AS BIGINT) AS r
             FROM docs LEFT JOIN c3 ON c3.node = docs.node)
      SELECT r3.node, coalesce(deg.deg, 0) AS n_neighbors, r3.r AS rank_micro
      FROM r3 LEFT JOIN deg ON deg.u = r3.node
      ORDER BY rank_micro DESC, node LIMIT 25""",

    "llm_dup_ngram_coverage" -> s"""
      WITH wd AS (
        SELECT doc_id, source, string_split(text, ' ') AS w
        FROM documents WHERE doc_id < 800),
      gs AS (
        SELECT DISTINCT doc_id, source,
               array_to_string(w[CAST(i AS INT):CAST(i AS INT)+7], ' ') AS g
        FROM wd, LATERAL unnest(range(1, greatest(len(w) - 7, 1) + 1)) t(i)),
      g AS (
        SELECT doc_id, source,
               CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) AS gh
        FROM gs),
      pop AS (SELECT gh, count(DISTINCT doc_id) AS nd FROM g GROUP BY gh),
      perdoc AS (
        SELECT g.doc_id, g.source, count(*) AS n_grams,
               CAST(sum(CASE WHEN pop.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
        FROM g JOIN pop ON g.gh = pop.gh
        GROUP BY g.doc_id, g.source)
      SELECT source, count(*) AS n_docs,
             CAST(sum(n_grams) AS BIGINT) AS total_grams,
             CAST(sum(n_shared) AS BIGINT) AS shared_grams,
             ${N.ratio("sum(n_shared)", "sum(n_grams)", 4)} AS dup_frac
      FROM perdoc GROUP BY source ORDER BY source""",

    "ts_gap_fill_interpolate" -> """
      WITH daily AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        FROM events WHERE user_id < 12 AND event_type = 'purchase' GROUP BY 1, 2),
      cal AS (
        SELECT user_id, CAST(unnest(generate_series(min(day), max(day), INTERVAL 1 DAY)) AS DATE) AS day
        FROM daily GROUP BY user_id),
      j AS (
        SELECT c.user_id, c.day, d.cents,
          last_value(d.cents IGNORE NULLS) OVER wb AS pc,
          last_value(CASE WHEN d.cents IS NOT NULL THEN c.day END IGNORE NULLS) OVER wb AS pd,
          first_value(d.cents IGNORE NULLS) OVER wf AS nc,
          first_value(CASE WHEN d.cents IS NOT NULL THEN c.day END IGNORE NULLS) OVER wf AS nd
        FROM cal c LEFT JOIN daily d USING (user_id, day)
        WINDOW wb AS (PARTITION BY c.user_id ORDER BY c.day),
               wf AS (PARTITION BY c.user_id ORDER BY c.day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      SELECT user_id, day, cents IS NULL AS is_interpolated,
        CAST(coalesce(cents,
          pc + CAST(sign(nc - pc) AS BIGINT) *
               ((abs(nc - pc) * date_diff('day', pd, day)) // date_diff('day', pd, nd))
        ) AS DOUBLE) / 100 AS value_filled
      FROM j ORDER BY user_id, day""",

    "ts_resample_ohlc" -> """
      WITH e AS (
        SELECT event_type, date_trunc('hour', ts) AS hour, ts, event_id,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        FROM events WHERE ts < TIMESTAMP '2024-01-04'),
      r AS (
        SELECT *,
          row_number() OVER (PARTITION BY event_type, hour ORDER BY ts, event_id) AS rn_o,
          row_number() OVER (PARTITION BY event_type, hour ORDER BY ts DESC, event_id DESC) AS rn_c
        FROM e)
      SELECT event_type, hour, count(*) AS n_events,
        CAST(max(CASE WHEN rn_o = 1 THEN cents END) AS DOUBLE) / 100 AS open,
        CAST(max(cents) AS DOUBLE) / 100 AS high,
        CAST(min(cents) AS DOUBLE) / 100 AS low,
        CAST(max(CASE WHEN rn_c = 1 THEN cents END) AS DOUBLE) / 100 AS close
      FROM r GROUP BY 1, 2 ORDER BY 1, 2""",

    "graph_triangle_count" -> """
      WITH docs AS (SELECT doc_id, source, lang, n_chars FROM documents WHERE doc_id < 1200),
      blocks AS (
        SELECT doc_id AS u, concat_ws('|', 's', source, CAST(n_chars // 100 AS VARCHAR)) AS bk FROM docs
        UNION ALL
        SELECT doc_id AS u, concat_ws('|', 'l', lang, CAST(n_chars // 50 AS VARCHAR)) AS bk FROM docs),
      edges AS (
        SELECT DISTINCT a.u AS u, b.u AS v
        FROM blocks a JOIN blocks b USING (bk) WHERE a.u < b.u),
      wedges AS (SELECT a.u AS x, a.v AS y, b.v AS z FROM edges a JOIN edges b ON a.v = b.u),
      tri AS (SELECT x, y, z FROM wedges w JOIN edges c ON w.x = c.u AND w.z = c.v),
      corners AS (
        SELECT x AS node FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri)
      SELECT node, count(*) AS n_triangles FROM corners GROUP BY 1
      ORDER BY n_triangles DESC, node LIMIT 25""",

    // min-label fixpoint ≡ transitive reachability to the minimum
    // member — the recursive CTE IS the fixpoint the salted Spark loop
    // converges to (same mirror shape as llm_dedup_components)
    "graph_components" -> """
      WITH docs AS (SELECT doc_id, source, lang, n_chars FROM documents WHERE doc_id < 1200),
      blocks AS (
        SELECT doc_id AS u, concat_ws('|', 's', source, CAST(n_chars // 100 AS VARCHAR)) AS bk FROM docs
        UNION ALL
        SELECT doc_id AS u, concat_ws('|', 'l', lang, CAST(n_chars // 50 AS VARCHAR)) AS bk FROM docs),
      edges0 AS (
        SELECT DISTINCT a.u AS u, b.u AS v
        FROM blocks a JOIN blocks b USING (bk) WHERE a.u < b.u),
      e AS (SELECT u AS s, v AS d FROM edges0 UNION SELECT v, u FROM edges0),
      nodes AS (SELECT DISTINCT s AS n FROM e),
      r AS (
        WITH RECURSIVE reach(n, m) AS (
          SELECT n, n FROM nodes
          UNION
          SELECT e.s, reach.m FROM e JOIN reach ON e.d = reach.n)
        SELECT n, min(m) AS component FROM reach GROUP BY n)
      SELECT component, count(*) AS n_nodes, CAST(max(n) AS BIGINT) AS max_node
      FROM r GROUP BY 1 ORDER BY 1""",

    "graph_bfs_hops" -> """
      WITH docs AS (SELECT doc_id, source, lang, n_chars FROM documents WHERE doc_id < 1200),
      blocks AS (
        SELECT doc_id AS u, concat_ws('|', 's', source, CAST(n_chars // 100 AS VARCHAR)) AS bk FROM docs
        UNION ALL
        SELECT doc_id AS u, concat_ws('|', 'l', lang, CAST(n_chars // 50 AS VARCHAR)) AS bk FROM docs),
      edges AS (
        SELECT DISTINCT a.u AS u, b.u AS v
        FROM blocks a JOIN blocks b USING (bk) WHERE a.u < b.u),
      adj AS (SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges),
      nodes AS (SELECT DISTINCT u AS node FROM adj),
      r0 AS (SELECT node, CAST(0 AS BIGINT) AS hop FROM nodes WHERE node % 101 = 0),
      r1 AS (SELECT node, min(hop) AS hop FROM (
        SELECT node, hop FROM r0
        UNION ALL SELECT a.v AS node, r.hop + 1 AS hop FROM adj a JOIN r0 r ON a.u = r.node) GROUP BY 1),
      r2 AS (SELECT node, min(hop) AS hop FROM (
        SELECT node, hop FROM r1
        UNION ALL SELECT a.v AS node, r.hop + 1 AS hop FROM adj a JOIN r1 r ON a.u = r.node) GROUP BY 1),
      r3 AS (SELECT node, min(hop) AS hop FROM (
        SELECT node, hop FROM r2
        UNION ALL SELECT a.v AS node, r.hop + 1 AS hop FROM adj a JOIN r2 r ON a.u = r.node) GROUP BY 1)
      SELECT coalesce(r.hop, -1) AS hops, count(*) AS n_nodes
      FROM nodes n LEFT JOIN r3 r ON n.node = r.node
      GROUP BY 1 ORDER BY 1""",

    "dq_fk_orphans" -> """
      WITH c1 AS (
        SELECT 'orders.custkey->customer' AS fk_check, count(*) AS n_child_rows,
               count(*) FILTER (WHERE hit IS NULL) AS n_orphans,
               count(DISTINCT CASE WHEN hit IS NULL THEN k END) AS n_orphan_keys
        FROM (SELECT o_custkey AS k FROM orders) c
        LEFT JOIN (SELECT DISTINCT c_custkey AS k, 1 AS hit FROM customer) p USING (k)),
      c2 AS (
        SELECT 'lineitem.orderkey->orders' AS fk_check, count(*) AS n_child_rows,
               count(*) FILTER (WHERE hit IS NULL) AS n_orphans,
               count(DISTINCT CASE WHEN hit IS NULL THEN k END) AS n_orphan_keys
        FROM (SELECT l_orderkey AS k FROM lineitem) c
        LEFT JOIN (SELECT DISTINCT o_orderkey AS k, 1 AS hit FROM orders) p USING (k)),
      c3 AS (
        SELECT 'lineitem.partkey->part' AS fk_check, count(*) AS n_child_rows,
               count(*) FILTER (WHERE hit IS NULL) AS n_orphans,
               count(DISTINCT CASE WHEN hit IS NULL THEN k END) AS n_orphan_keys
        FROM (SELECT l_partkey AS k FROM lineitem) c
        LEFT JOIN (SELECT DISTINCT p_partkey AS k, 1 AS hit FROM part) p USING (k)),
      c4 AS (
        SELECT 'lineitem.suppkey->supplier' AS fk_check, count(*) AS n_child_rows,
               count(*) FILTER (WHERE hit IS NULL) AS n_orphans,
               count(DISTINCT CASE WHEN hit IS NULL THEN k END) AS n_orphan_keys
        FROM (SELECT l_suppkey AS k FROM lineitem) c
        LEFT JOIN (SELECT DISTINCT s_suppkey AS k, 1 AS hit FROM supplier) p USING (k))
      SELECT * FROM c1 UNION ALL SELECT * FROM c2
      UNION ALL SELECT * FROM c3 UNION ALL SELECT * FROM c4
      ORDER BY fk_check""",

    "dq_value_rules" -> s"""
      WITH a AS (
        SELECT count(*) AS n_rows,
          count(*) FILTER (WHERE o_orderdate >= TIMESTAMP '2000-01-01') AS v_date,
          count(*) FILTER (WHERE o_custkey IS NULL) AS v_null,
          count(*) FILTER (WHERE o_totalprice > 400000.0) AS v_p400,
          count(*) FILTER (WHERE o_totalprice <= 0.0) AS v_nonpos,
          count(*) FILTER (WHERE o_orderstatus NOT IN ('O', 'F', 'P')) AS v_status
        FROM orders),
      u AS (
        SELECT 'date_after_1999' AS rule_name, v_date AS n_violations, n_rows FROM a
        UNION ALL SELECT 'null_custkey', v_null, n_rows FROM a
        UNION ALL SELECT 'price_gt_400k', v_p400, n_rows FROM a
        UNION ALL SELECT 'price_nonpositive', v_nonpos, n_rows FROM a
        UNION ALL SELECT 'status_unknown', v_status, n_rows FROM a)
      SELECT rule_name, n_violations,
             ${N.ratio("n_violations", "n_rows", 4)} AS violation_rate
      FROM u ORDER BY rule_name""",

    "agg_weighted_median" -> """
      WITH li AS (
        SELECT l_returnflag,
               CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS pc,
               CAST(l_quantity AS BIGINT) AS q
        FROM lineitem),
      w AS (
        SELECT l_returnflag, pc, q,
          SUM(q) OVER (PARTITION BY l_returnflag ORDER BY pc) AS cw,
          SUM(q) OVER (PARTITION BY l_returnflag) AS tw
        FROM li)
      SELECT l_returnflag, CAST(min(pc) AS DOUBLE) / 100 AS weighted_median,
             CAST(max(tw) AS BIGINT) AS total_weight
      FROM w WHERE cw * 2 >= tw GROUP BY 1 ORDER BY 1""",

    "agg_heavy_hitters" -> """
      WITH src AS (
        SELECT 10000 // (1 + (CAST(('0x' || substr(md5(
                 CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)
               ), 1, 15)) AS BIGINT) % 10000)) AS hk
        FROM lineitem),
      tot AS (SELECT count(*) AS n FROM src)
      SELECT hk, CAST(count(*) AS BIGINT) AS cnt,
             CAST(count(*) * 10000 // n AS BIGINT) AS bp
      FROM src, tot
      GROUP BY hk, n
      HAVING count(*) * 100 > n
      ORDER BY cnt DESC, hk""",

    "sink_bucketed_join" -> """
      SELECT c_mktsegment,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""",

    "ts_ewma" -> """
      WITH RECURSIVE daily AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        FROM events WHERE user_id < 12 AND event_type = 'purchase' GROUP BY 1, 2),
      r AS (
        SELECT user_id, day, cents,
               row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
        FROM daily),
      e AS (
        SELECT user_id, day, cents, rn, cents AS ew
        FROM r WHERE rn = 1
        UNION ALL
        SELECT r.user_id, r.day, r.cents, r.rn,
               (r.cents + 3 * e.ew) // 4
        FROM r JOIN e ON r.user_id = e.user_id AND r.rn = e.rn + 1)
      SELECT user_id, day, cents, CAST(ew AS DOUBLE) / 100 AS ewma
      FROM e ORDER BY user_id, day""",

    "ts_rolling_quantile" -> """
      WITH daily AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        FROM events WHERE user_id < 12 AND event_type = 'purchase' GROUP BY 1, 2)
      SELECT user_id, day, cents,
             round(quantile_cont(cents, 0.5) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) / 100, 4) AS roll_med
      FROM daily ORDER BY user_id, day""",

    "ts_interval_merge" -> """
      WITH iv AS (
        SELECT user_id, event_id, ts AS s0,
               ts + (CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) % 180) * INTERVAL 1 MINUTE AS e0
        FROM events WHERE user_id < 8 AND event_type = 'click'),
      m AS (
        SELECT user_id, s0, e0,
               max(e0) OVER (PARTITION BY user_id ORDER BY s0, e0, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        FROM iv),
      f AS (
        SELECT user_id, s0, e0,
               CASE WHEN pm IS NULL OR s0 > pm THEN 1 ELSE 0 END AS ni
        FROM m),
      g AS (
        SELECT user_id, s0, e0,
               SUM(ni) OVER (PARTITION BY user_id ORDER BY s0, e0 ROWS UNBOUNDED PRECEDING) AS island
        FROM f)
      SELECT user_id, min(s0) AS s, max(e0) AS e,
             CAST(count(*) AS BIGINT) AS n_merged
      FROM g GROUP BY user_id, island ORDER BY user_id, s""",

    "geo_grid_distance_join" -> """
      WITH p AS (
        SELECT c_custkey AS id,
               CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || 'x'), 1, 15)) AS BIGINT) % 500 AS x,
               CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || 'y'), 1, 15)) AS BIGINT) % 500 AS y
        FROM customer WHERE c_custkey < 3000)
      SELECT a.id AS id_a, b.id AS id_b,
             CAST((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS BIGINT) AS d2
      FROM p a JOIN p b ON a.id < b.id
      WHERE (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 625
      ORDER BY id_a, id_b""",

    // radius-bounded k-NN: the grid candidate join is exact under the
    // R=40 Euclidean bound, so the oracle brute-forces the same bound
    "geo_knn_join" -> """
      WITH p AS (
        SELECT c_custkey AS id,
               CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || 'x'), 1, 15)) AS BIGINT) % 500 AS x,
               CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || 'y'), 1, 15)) AS BIGINT) % 500 AS y
        FROM customer WHERE c_custkey < 3000),
      c AS (
        SELECT a.id AS qid, b.id AS nid,
               CAST((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS BIGINT) AS d2
        FROM p a JOIN p b ON b.id <> a.id
        WHERE a.id % 7 = 0
          AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 1600)
      SELECT qid, nid, d2, CAST(rk AS BIGINT) AS rk FROM (
        SELECT qid, nid, d2,
               row_number() OVER (PARTITION BY qid ORDER BY d2, nid) AS rk
        FROM c)
      WHERE rk <= 3 ORDER BY qid, rk""",

    "geo_bbox_contain" -> """
      WITH p AS (
        SELECT c_custkey AS id,
               CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || 'x'), 1, 15)) AS BIGINT) % 500 AS x,
               CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || 'y'), 1, 15)) AS BIGINT) % 500 AS y
        FROM customer WHERE c_custkey < 3000),
      r AS (
        SELECT n_nationkey AS rid,
               (n_nationkey * 137) % 500 AS cxr, (n_nationkey * 211) % 500 AS cyr,
               60 + (n_nationkey % 4) * 20 AS hw
        FROM nation)
      SELECT rid,
             CAST(count(p.id) AS BIGINT) AS n_pts,
             CAST(coalesce(sum(p.id), 0) AS BIGINT) AS sum_ids
      FROM r LEFT JOIN p
        ON p.x BETWEEN r.cxr - r.hw AND r.cxr + r.hw
       AND p.y BETWEEN r.cyr - r.hw AND r.cyr + r.hw
      GROUP BY rid ORDER BY rid""",

    // same signature arithmetic as llm_dedup_minhash; band join crosses
    // the even/odd corpus split instead of self-joining
    "llm_dedup_cross_corpus" -> """
      WITH wd AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
        FROM documents),
      sh AS (
        SELECT doc_id,
               CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                    ELSE list_distinct(list_transform(range(1, len(w) - 1), i ->
                         array_to_string(w[i:i+2], ' '))) END AS shs
        FROM wd),
      hs AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT) & 2147483647 AS h
        FROM (SELECT doc_id, unnest(shs) AS g FROM sh)),
      perm AS (
        SELECT i,
               1 + (1664525 * (i + 1) + 1013904223) % 2147483646 AS a,
               (22695477 * (i + 1) + 1) % 2147483647 AS b
        FROM range(64) t(i)),
      sig AS (
        SELECT doc_id, i, min((a * h + b) % 2147483647) AS v
        FROM hs CROSS JOIN perm GROUP BY doc_id, i),
      bands AS (
        SELECT doc_id, i // 4 AS band,
               string_agg(CAST(v AS VARCHAR), ',' ORDER BY i) AS bkey
        FROM sig GROUP BY doc_id, i // 4),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
        WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1),
      sigv AS (SELECT doc_id, list(v ORDER BY i) AS sig FROM sig GROUP BY doc_id),
      m AS (
        SELECT c.doc_a, c.doc_b,
               len(list_filter(range(1, 65), j -> sa.sig[j] = sb.sig[j])) AS m
        FROM cand c
        JOIN sigv sa ON sa.doc_id = c.doc_a
        JOIN sigv sb ON sb.doc_id = c.doc_b)
      SELECT doc_b, CAST(count(DISTINCT doc_a) AS BIGINT) AS n_ref_dups,
             CAST(max(m) AS BIGINT) AS best_match
      FROM m WHERE m >= 13
      GROUP BY doc_b ORDER BY doc_b""",

    "llm_zipf_fit" -> """
      WITH w AS (
        SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
        FROM documents),
      f AS (SELECT w, count(*) AS cnt FROM w GROUP BY w ORDER BY cnt DESC, w LIMIT 100),
      r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, w) AS rank FROM f)
      SELECT round(regr_slope(ln(cnt), ln(rank)), 4) AS slope,
             round(regr_intercept(ln(cnt), ln(rank)), 4) AS intercept,
             round(regr_r2(ln(cnt), ln(rank)), 4) AS r2,
             CAST(count(*) AS BIGINT) AS n_terms
      FROM r""",

    "agg_skew_kurtosis" -> """
      WITH a AS (
        SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(q) AS BIGINT) AS s1, CAST(sum(q*q) AS BIGINT) AS s2,
               CAST(sum(q*q*q) AS BIGINT) AS s3, CAST(sum(q*q*q*q) AS BIGINT) AS s4
        FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q FROM lineitem)
        GROUP BY l_returnflag),
      mo AS (
        SELECT l_returnflag, n,
               s1 / CAST(n AS DOUBLE) AS m,
               s2 / CAST(n AS DOUBLE) AS e2,
               s3 / CAST(n AS DOUBLE) AS e3,
               s4 / CAST(n AS DOUBLE) AS e4
        FROM a),
      cm AS (
        SELECT l_returnflag, n,
               e2 - m*m AS m2,
               e3 - 3.0*m*e2 + 2.0*m*m*m AS m3,
               e4 - 4.0*m*e3 + 6.0*m*m*e2 - 3.0*m*m*m*m AS m4
        FROM mo)
      SELECT l_returnflag, n,
             round(m3 / pow(m2, 1.5), 4) AS skew_pop,
             round(m4 / (m2 * m2) - 3.0, 4) AS kurt_excess
      FROM cm ORDER BY l_returnflag""",

    "agg_reaggregate_partials" -> """
      WITH daily AS (
        SELECT l_shipdate AS day,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS p_cents,
               CAST(count(*) AS BIGINT) AS p_n,
               CAST(min(CAST(l_quantity AS BIGINT)) AS BIGINT) AS p_min_q,
               CAST(max(CAST(l_quantity AS BIGINT)) AS BIGINT) AS p_max_q
        FROM lineitem GROUP BY 1)
      SELECT CAST(date_trunc('month', day) AS DATE) AS month,
             CAST(sum(p_cents) AS DOUBLE) / 100 AS revenue,
             CAST(sum(p_n) AS BIGINT) AS n_items,
             CAST(min(p_min_q) AS BIGINT) AS min_qty,
             CAST(max(p_max_q) AS BIGINT) AS max_qty,
             CAST(count(*) AS BIGINT) AS n_days
      FROM daily GROUP BY 1 ORDER BY 1""",

    "dim_scd2_build" -> """
      WITH obs AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority AS attr,
               lag(o_orderpriority) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS prev_attr
        FROM orders WHERE o_custkey < 300),
      chg AS (
        SELECT o_custkey, o_orderdate, o_orderkey, attr
        FROM obs WHERE prev_attr IS NULL OR attr <> prev_attr)
      SELECT o_custkey, attr, o_orderdate AS valid_from,
             lead(o_orderdate) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS valid_to,
             lead(o_orderdate) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) IS NULL AS is_current,
             o_orderkey AS obs_orderkey
      FROM chg ORDER BY o_custkey, valid_from, obs_orderkey""",

    "mm_mime_detect" -> """
      WITH mm AS (
        SELECT * FROM (VALUES
          (0, 'image/png'), (1, 'image/jpeg'), (2, 'image/gif'),
          (3, 'application/pdf'), (4, 'audio/wav'), (5, 'application/zip'),
          (6, 'application/octet-stream')) m(i, mime)),
      b AS (
        SELECT doc_id, CAST(doc_id % 7 AS INT) AS i,
               4 + octet_length(encode(text)) AS nb
        FROM documents WHERE doc_id < 2000)
      SELECT mime, CAST(count(*) AS BIGINT) AS n_blobs,
             CAST(sum(doc_id) AS BIGINT) AS sum_ids,
             CAST(sum(nb) AS BIGINT) AS sum_bytes
      FROM b JOIN mm ON b.i = mm.i
      GROUP BY mime ORDER BY mime""",

    "layout_zorder_zonemap" -> """
      WITH p AS (
        SELECT (l_partkey * 7919) % 1024 AS x, (l_suppkey * 104729) % 1024 AS y
        FROM lineitem),
      z AS (
        SELECT x, y,
          (((x >> 0) & 1) << 0) | (((y >> 0) & 1) << 1) |
          (((x >> 1) & 1) << 2) | (((y >> 1) & 1) << 3) |
          (((x >> 2) & 1) << 4) | (((y >> 2) & 1) << 5) |
          (((x >> 3) & 1) << 6) | (((y >> 3) & 1) << 7) |
          (((x >> 4) & 1) << 8) | (((y >> 4) & 1) << 9) |
          (((x >> 5) & 1) << 10) | (((y >> 5) & 1) << 11) |
          (((x >> 6) & 1) << 12) | (((y >> 6) & 1) << 13) |
          (((x >> 7) & 1) << 14) | (((y >> 7) & 1) << 15) |
          (((x >> 8) & 1) << 16) | (((y >> 8) & 1) << 17) |
          (((x >> 9) & 1) << 18) | (((y >> 9) & 1) << 19) AS z
        FROM p)
      SELECT z >> 16 AS bucket, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(min(x) AS BIGINT) AS x_min, CAST(max(x) AS BIGINT) AS x_max,
             CAST(min(y) AS BIGINT) AS y_min, CAST(max(y) AS BIGINT) AS y_max
      FROM z GROUP BY 1 ORDER BY 1""",

    "stream_dedup_bounded" -> """
      WITH h AS (
        SELECT user_id, event_type, date_trunc('hour', ts) AS hour,
               event_id, ts,
               row_number() OVER (PARTITION BY user_id, event_type, date_trunc('hour', ts)
                 ORDER BY ts, event_id) AS rn
        FROM events WHERE user_id < 40)
      SELECT user_id, event_type, hour,
             event_id AS first_event_id, epoch_us(ts) AS first_ts_us
      FROM h WHERE rn = 1
      ORDER BY user_id, event_type, hour""",

    "graph_label_propagation" -> """
      WITH docs AS (SELECT doc_id, source, lang, n_chars FROM documents WHERE doc_id < 1200),
      blocks AS (
        SELECT doc_id AS u, concat_ws('|', 's', source, CAST(n_chars // 100 AS VARCHAR)) AS bk FROM docs
        UNION ALL
        SELECT doc_id AS u, concat_ws('|', 'l', lang, CAST(n_chars // 50 AS VARCHAR)) AS bk FROM docs),
      edges AS (
        SELECT DISTINCT a.u AS u, b.u AS v
        FROM blocks a JOIN blocks b USING (bk) WHERE a.u < b.u),
      adj AS (SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges),
      l0 AS (SELECT DISTINCT u AS node, u AS label FROM adj),
      n1 AS (SELECT a.u AS node, l.label, count(*) AS c
             FROM adj a JOIN l0 l ON a.v = l.node GROUP BY 1, 2),
      l1 AS (SELECT node, label FROM (
               SELECT node, label, row_number() OVER (PARTITION BY node
                 ORDER BY c DESC, label) AS rn FROM n1) WHERE rn = 1),
      n2 AS (SELECT a.u AS node, l.label, count(*) AS c
             FROM adj a JOIN l1 l ON a.v = l.node GROUP BY 1, 2),
      l2 AS (SELECT node, label FROM (
               SELECT node, label, row_number() OVER (PARTITION BY node
                 ORDER BY c DESC, label) AS rn FROM n2) WHERE rn = 1),
      n3 AS (SELECT a.u AS node, l.label, count(*) AS c
             FROM adj a JOIN l2 l ON a.v = l.node GROUP BY 1, 2),
      l3 AS (SELECT node, label FROM (
               SELECT node, label, row_number() OVER (PARTITION BY node
                 ORDER BY c DESC, label) AS rn FROM n3) WHERE rn = 1)
      SELECT node, label FROM l3 ORDER BY node""",

    "llm_dedup_paragraph" -> """
      WITH ch AS (
        SELECT doc_id, generate_subscripts(cs, 1) - 1 AS pos, unnest(cs) AS chunk
        FROM (SELECT doc_id, string_split(text, '. ') AS cs FROM documents)),
      ne AS (
        SELECT doc_id, chunk,
               CAST(('0x' || substr(md5(chunk), 1, 15)) AS BIGINT) AS h,
               doc_id * 100000 + pos AS ord
        FROM ch WHERE chunk <> ''),
      f AS (SELECT h, min(ord) AS keep_ord FROM ne GROUP BY h)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
             CAST(count(*) FILTER (WHERE ord <> keep_ord) AS BIGINT) AS n_removed,
             CAST(coalesce(sum(length(chunk)) FILTER (WHERE ord <> keep_ord), 0) AS BIGINT) AS chars_removed
      FROM ne JOIN f USING (h)
      GROUP BY doc_id ORDER BY doc_id""",

    "source_jdbc_pushdown" -> """
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders
      WHERE o_custkey < 500 AND o_orderstatus = 'O' AND o_totalprice > 50000
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",

    "event_funnel_attribution" -> """
      WITH p AS (
        SELECT user_id, ts AS p_ts, event_id AS p_id
        FROM events WHERE user_id < 100 AND event_type = 'purchase'),
      c AS (
        SELECT user_id, ts AS c_ts, event_id AS c_id,
               'ch' || CAST(event_id % 4 AS VARCHAR) AS channel
        FROM events WHERE user_id < 100 AND event_type = 'click'),
      j AS (
        SELECT p.p_id, c.c_ts, c.c_id, c.channel
        FROM p JOIN c ON p.user_id = c.user_id
         AND c.c_ts <= p.p_ts AND c.c_ts > p.p_ts - INTERVAL 7 DAY),
      r AS (
        SELECT p_id, channel,
               row_number() OVER (PARTITION BY p_id ORDER BY c_ts, c_id) AS rn,
               count(*) OVER (PARTITION BY p_id) AS n
        FROM j)
      SELECT channel,
             CAST(count(*) AS BIGINT) AS n_touches,
             CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_first,
             CAST(count(*) FILTER (WHERE rn = n) AS BIGINT) AS n_last,
             CAST(sum(10000 // n + CASE WHEN rn <= 10000 % n THEN 1 ELSE 0 END) AS BIGINT) AS linear_bp
      FROM r GROUP BY channel ORDER BY channel""",

    // same journey CTEs as event_funnel_attribution; U-shaped credit
    // with the largest-remainder middle split (base 2000 // (n-2), the
    // remainder to the earliest middles), degenerate journeys 10000/5000
    "event_attribution_ushape" -> """
      WITH p AS (
        SELECT user_id, ts AS p_ts, event_id AS p_id
        FROM events WHERE user_id < 100 AND event_type = 'purchase'),
      c AS (
        SELECT user_id, ts AS c_ts, event_id AS c_id,
               'ch' || CAST(event_id % 4 AS VARCHAR) AS channel
        FROM events WHERE user_id < 100 AND event_type = 'click'),
      j AS (
        SELECT p.p_id, c.c_ts, c.c_id, c.channel
        FROM p JOIN c ON p.user_id = c.user_id
         AND c.c_ts <= p.p_ts AND c.c_ts > p.p_ts - INTERVAL 7 DAY),
      r AS (
        SELECT p_id, channel,
               row_number() OVER (PARTITION BY p_id ORDER BY c_ts, c_id) AS rn,
               count(*) OVER (PARTITION BY p_id) AS n
        FROM j)
      SELECT channel,
             CAST(count(*) AS BIGINT) AS n_touches,
             CAST(count(DISTINCT p_id) AS BIGINT) AS n_conversions,
             CAST(sum(CASE WHEN n = 1 THEN 10000
                           WHEN n = 2 THEN 5000
                           WHEN rn = 1 OR rn = n THEN 4000
                           ELSE 2000 // (n - 2) +
                                CASE WHEN rn - 1 <= 2000 % (n - 2) THEN 1 ELSE 0 END
                      END) AS BIGINT) AS ushape_bp
      FROM r GROUP BY channel ORDER BY channel""",

    // the disclosure-avoidance pass: primary cells under K=5, then one
    // complementary per lone-primary row/column margin — the smallest
    // surviving cell under (prim, n, key); published_n NULL when flagged
    "census_suppression" -> """
      WITH cells AS (
        SELECT n.n_name, c.c_mktsegment AS segment,
               CAST(count(*) AS BIGINT) AS n, count(*) < 5 AS prim
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2),
      m AS (
        SELECT *,
               CAST(count(*) FILTER (WHERE prim) OVER (PARTITION BY n_name) AS BIGINT) AS row_prims,
               CAST(count(*) FILTER (WHERE prim) OVER (PARTITION BY segment) AS BIGINT) AS col_prims,
               row_number() OVER (PARTITION BY n_name ORDER BY prim, n, segment) AS row_rnk,
               row_number() OVER (PARTITION BY segment ORDER BY prim, n, n_name) AS col_rnk
        FROM cells),
      f AS (
        SELECT n_name, segment, n,
               CASE WHEN prim THEN 'P'
                    WHEN row_prims = 1 AND row_rnk = 1 THEN 'C_ROW'
                    WHEN col_prims = 1 AND col_rnk = 1 THEN 'C_COL'
                    ELSE 'OK' END AS flag
        FROM m)
      SELECT n_name, segment,
             CASE WHEN flag = 'OK' THEN n END AS published_n, flag
      FROM f ORDER BY n_name, segment""",

    // exact counts first-class, estimates as verdict booleans (the
    // agg_hll_union convention); intersect bound anchored to the union
    "agg_hll_intersect" -> """
      WITH pr AS (
        SELECT o_orderpriority, o_custkey FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        GROUP BY 1, 2)
      SELECT
        CAST((SELECT count(*) FROM pr WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS n_exact_a,
        CAST((SELECT count(*) FROM pr WHERE o_orderpriority = '2-HIGH') AS BIGINT) AS n_exact_b,
        CAST((SELECT count(DISTINCT o_custkey) FROM pr) AS BIGINT) AS n_exact_union,
        CAST((SELECT count(*) FROM (SELECT o_custkey FROM pr GROUP BY 1 HAVING count(*) = 2)) AS BIGINT) AS n_exact_intersect,
        TRUE AS a_within_10pct, TRUE AS b_within_10pct,
        TRUE AS union_within_10pct, TRUE AS intersect_within_bound""",

    // deterministic fake PCM (ascii - 32 samples), 32-sample frames,
    // threshold 150000, gaps-and-islands segments
    "mm_audio_vad_plan" -> """
      WITH d AS (
        SELECT doc_id, text, length(text) AS len FROM documents
        WHERE doc_id < 500 AND length(text) >= 32),
      fr0 AS (
        SELECT doc_id, len // 32 AS nf, unnest(range(len // 32)) AS i, text
        FROM d),
      fr AS (
        SELECT doc_id, nf, i,
               CAST(list_sum(list_transform(
                 string_split(substr(text, CAST(i * 32 + 1 AS INT), 32), ''),
                 c -> (ord(c) - 32) * (ord(c) - 32))) AS BIGINT) AS energy
        FROM fr0),
      fs AS (SELECT *, energy > 150000 AS speech FROM fr),
      seg AS (
        SELECT doc_id, isl, CAST(count(*) AS BIGINT) AS seg_len
        FROM (SELECT doc_id, i,
                     i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS isl
              FROM fs WHERE speech)
        GROUP BY 1, 2),
      segagg AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,
               CAST(max(seg_len) AS BIGINT) AS longest_segment
        FROM seg GROUP BY 1)
      SELECT fs.doc_id, CAST(max(fs.nf) AS BIGINT) AS n_frames,
             CAST(count(*) FILTER (WHERE fs.speech) AS BIGINT) AS n_speech,
             CAST(coalesce(max(sa.n_segments), 0) AS BIGINT) AS n_segments,
             CAST(coalesce(max(sa.longest_segment), 0) AS BIGINT) AS longest_segment,
             CAST(sum(fs.energy) AS BIGINT) AS total_energy
      FROM fs LEFT JOIN segagg sa USING (doc_id)
      GROUP BY fs.doc_id ORDER BY fs.doc_id""",

    "agg_percentile_disc" -> """
      WITH li AS (
        SELECT l_returnflag,
               CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS pc
        FROM lineitem),
      w AS (
        SELECT l_returnflag, pc,
               count(*) OVER (PARTITION BY l_returnflag ORDER BY pc) AS cw,
               count(*) OVER (PARTITION BY l_returnflag) AS n
        FROM li)
      SELECT l_returnflag,
             CAST(min(CASE WHEN cw * 4 >= n THEN pc END) AS DOUBLE) / 100 AS p25,
             CAST(min(CASE WHEN cw * 2 >= n THEN pc END) AS DOUBLE) / 100 AS p50,
             CAST(min(CASE WHEN cw * 10 >= n * 9 THEN pc END) AS DOUBLE) / 100 AS p90,
             CAST(max(n) AS BIGINT) AS n_rows
      FROM w GROUP BY l_returnflag ORDER BY l_returnflag""",

    "geo_haversine" -> """
      WITH p AS (
        SELECT c_custkey AS id,
               (CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || 'x'), 1, 15)) AS BIGINT) % 500) * 0.36 - 90 AS lat,
               (CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || 'y'), 1, 15)) AS BIGINT) % 500) * 0.72 - 180 AS lon
        FROM customer WHERE c_custkey < 1000),
      q AS (
        SELECT id, lat, lon,
               lag(lat) OVER (ORDER BY id) AS plat,
               lag(lon) OVER (ORDER BY id) AS plon
        FROM p)
      SELECT id,
             CAST(round(2 * 6371.0 * asin(sqrt(
               sin(radians(lat - plat) / 2) * sin(radians(lat - plat) / 2) +
               cos(radians(plat)) * cos(radians(lat)) *
               sin(radians(lon - plon) / 2) * sin(radians(lon - plon) / 2))), 0) AS BIGINT) AS km_from_prev
      FROM q WHERE plat IS NOT NULL
      ORDER BY id""",

    "ts_seasonal_naive" -> s"""
      WITH daily AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        FROM events WHERE user_id < 12 AND event_type = 'purchase' GROUP BY 1, 2),
      f AS (
        SELECT user_id, cents,
               lag(cents, 7) OVER (PARTITION BY user_id ORDER BY day) AS fc
        FROM daily)
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_forecasts,
             ${N.ratio("sum(abs(cents - fc))", "count(*) * 100", 4)} AS mae_dollars
      FROM f WHERE fc IS NOT NULL
      GROUP BY user_id ORDER BY user_id""",

    // digits from exact integer cents; expectation computed with the
    // same log10 expression the engine uses (values sit far from 4-dp
    // rounding boundaries, so a libm ulp cannot flip the verdict)
    "dq_benford" -> s"""
      WITH d AS (
        SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
        FROM orders),
      g AS (SELECT digit, count(*) AS n_obs FROM d GROUP BY 1),
      tt AS (SELECT sum(n_obs) AS n_total FROM g)
      SELECT digit, n_obs,
             ${N.ratio("n_obs", "(SELECT n_total FROM tt)", 4)} AS obs_freq,
             round(log10(1.0 + 1.0 / digit), 4) AS exp_freq,
             round(abs(${N.ratio("n_obs", "(SELECT n_total FROM tt)", 4)} - round(log10(1.0 + 1.0 / digit), 4)), 4) AS abs_dev
      FROM g ORDER BY digit""",

    // one-sample chi-square GOF vs the Benford ppm table (exact integer
    // constants summing to 10^6); terms are (10^6·O − n·ppm)²/(n·ppm)
    // in HUGEINT (DECIMAL(38,0) on the Spark side), the verdict is the
    // floored-integer ≥ ⌈crit·10⁶⌉ test — no float anywhere
    "dq_benford_gof" -> """
      WITH d AS (
        SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
        FROM orders),
      g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM d GROUP BY 1),
      tt AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_total FROM g),
      e(digit, ppm) AS (VALUES (1, 301030), (2, 176091), (3, 124939), (4, 96910),
                        (5, 79181), (6, 66947), (7, 57992), (8, 51153), (9, 45757)),
      scored AS (
        SELECT g.digit, g.n_obs, tt.n_total,
               CAST(tt.n_total * e.ppm AS BIGINT) AS exp_micro,
               CAST((CAST(1000000 AS HUGEINT) * g.n_obs - CAST(tt.n_total AS HUGEINT) * e.ppm)
                    * (CAST(1000000 AS HUGEINT) * g.n_obs - CAST(tt.n_total AS HUGEINT) * e.ppm)
                    // (CAST(tt.n_total AS HUGEINT) * e.ppm) AS BIGINT) AS term_micro
        FROM g, tt, e WHERE e.digit = g.digit),
      chi AS (SELECT CAST(sum(term_micro) AS BIGINT) AS chi2_micro FROM scored)
      SELECT digit, n_obs, n_total, exp_micro, term_micro, chi.chi2_micro,
             CAST(8 AS BIGINT) AS df,
             chi.chi2_micro >= 15507314 AS benford_reject
      FROM scored, chi ORDER BY digit""",

    "dq_freshness" -> """
      WITH g AS (SELECT max(ts) AS g_latest FROM events),
      pt AS (
        SELECT event_type, max(ts) AS latest, CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1),
      ld AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_last_day
        FROM events, g WHERE ts > g_latest - INTERVAL 24 HOUR GROUP BY 1)
      SELECT pt.event_type, pt.latest,
             (epoch_us(g.g_latest) - epoch_us(pt.latest)) // 60000000 AS lag_minutes,
             pt.n_events, coalesce(ld.n_last_day, 0) AS n_last_day
      FROM pt CROSS JOIN g LEFT JOIN ld ON pt.event_type = ld.event_type
      ORDER BY pt.event_type""",

    "event_pattern_funnel" -> """
      WITH ev AS (SELECT user_id, event_type, ts FROM events WHERE user_id < 200),
      v AS (SELECT user_id, min(ts) AS v_ts FROM ev WHERE event_type = 'view' GROUP BY 1),
      c AS (
        SELECT e.user_id, v.v_ts, min(e.ts) AS c_ts
        FROM ev e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.v_ts
          AND e.ts <= v.v_ts + INTERVAL 48 HOUR
        GROUP BY 1, 2),
      p AS (
        SELECT e.user_id, c.v_ts, c.c_ts, min(e.ts) AS p_ts
        FROM ev e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
          AND e.ts <= c.c_ts + INTERVAL 48 HOUR
        GROUP BY 1, 2, 3)
      SELECT user_id, v_ts, c_ts, p_ts,
             (epoch_us(p_ts) - epoch_us(v_ts)) // 60000000 AS mins_to_convert
      FROM p ORDER BY user_id""",

    "llm_dedup_containment" -> s"""
      WITH d AS (
        SELECT doc_id, source,
               list_distinct([array_to_string(w[CAST(i AS INT):CAST(i AS INT)+2], ' ')
                              FOR i IN range(1, greatest(len(w)-2, 1)+1)]) AS sh
        FROM (SELECT doc_id, source, string_split(text, ' ') AS w
              FROM documents WHERE doc_id < 2000))
      SELECT doc_a, doc_b, ${N.ratio("inter", "mn", 4)} AS containment FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               len(list_intersect(a.sh, b.sh)) AS inter,
               least(len(a.sh), len(b.sh)) AS mn
        FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id)
      WHERE ${N.ratio("inter", "mn", 4)} >= 0.1
      ORDER BY doc_a, doc_b""",

    "ts_cusum_changepoint" -> """
      WITH daily AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        FROM events WHERE user_id < 12 AND event_type = 'purchase' GROUP BY 1, 2),
      w AS (
        SELECT user_id, day, cents,
               count(*) OVER (PARTITION BY user_id) AS n,
               sum(cents) OVER (PARTITION BY user_id) AS total
        FROM daily),
      cu AS (
        SELECT user_id, day, n,
               sum(cents * n - total) OVER (PARTITION BY user_id ORDER BY day) AS cusum
        FROM w),
      r AS (
        SELECT user_id, n, day, abs(cusum) AS ac,
               row_number() OVER (PARTITION BY user_id ORDER BY abs(cusum) DESC, day) AS rn
        FROM cu)
      SELECT user_id, CAST(n AS BIGINT) AS n_days, day AS cp_day,
             CAST(ac AS BIGINT) AS max_abs_cusum
      FROM r WHERE rn = 1 ORDER BY user_id""",

    "graph_degree_stats" -> """
      WITH docs AS (SELECT doc_id, source, lang, n_chars FROM documents WHERE doc_id < 1200),
      blocks AS (
        SELECT doc_id AS u, concat_ws('|', 's', source, CAST(n_chars // 100 AS VARCHAR)) AS bk FROM docs
        UNION ALL
        SELECT doc_id AS u, concat_ws('|', 'l', lang, CAST(n_chars // 50 AS VARCHAR)) AS bk FROM docs),
      edges AS (
        SELECT DISTINCT a.u AS u, b.u AS v
        FROM blocks a JOIN blocks b USING (bk) WHERE a.u < b.u),
      adj AS (SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges),
      d1 AS (SELECT u, count(*) AS deg FROM adj GROUP BY u),
      nm AS (SELECT a.u, sum(d.deg) AS nbr_deg_sum FROM adj a JOIN d1 d ON a.v = d.u GROUP BY a.u)
      SELECT d1.deg, CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(sum(nm.nbr_deg_sum) AS BIGINT) AS nbr_deg_mass
      FROM d1 JOIN nm ON d1.u = nm.u
      GROUP BY d1.deg ORDER BY d1.deg""",

    "source_csv_permissive" -> """
      WITH c AS (SELECT * FROM customer WHERE c_custkey < 2000)
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(*) FILTER (WHERE c_custkey % 10 = 0) AS BIGINT) AS n_corrupt,
             CAST(count(*) FILTER (WHERE c_custkey % 10 <> 0) AS BIGINT) AS n_good,
             CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                  FILTER (WHERE c_custkey % 10 <> 0) AS BIGINT) AS good_cents,
             CAST(max(c_custkey) FILTER (WHERE c_custkey % 10 <> 0) AS BIGINT) AS max_good_key
      FROM c""",

    "census_moe_cv" -> """
      WITH c AS (
        SELECT n_name, c_mktsegment,
               CAST(round((c_acctbal + 1000) * 100) AS BIGINT) AS cents
        FROM customer JOIN nation ON c_nationkey = n_nationkey),
      a AS (
        SELECT n_name, c_mktsegment, CAST(count(*) AS BIGINT) AS n_cust,
               sum(cents) AS estC,
               sum(CAST(cents AS HUGEINT) * cents) AS m2C
        FROM c GROUP BY 1, 2),
      m AS (
        SELECT n_name, c_mktsegment, n_cust,
               CAST(estC AS DOUBLE) / 100.0 AS est,
               (sqrt(CAST(m2C AS DOUBLE) / 10000.0) / 1.645)
                 / (CAST(estC AS DOUBLE) / 100.0) * 100 AS cv
        FROM a)
      SELECT n_name, c_mktsegment, n_cust,
             round(est, 2) AS estimate, round(cv, 4) AS cv_pct,
             CASE WHEN cv < 15 THEN 'high' WHEN cv < 30 THEN 'medium'
                  ELSE 'low' END AS reliability
      FROM m ORDER BY n_name, c_mktsegment""",

    "census_moe_sig" -> """
      WITH c AS (
        SELECT n_name, CAST(round((c_acctbal + 1000) * 100) AS BIGINT) AS cents
        FROM customer JOIN nation ON c_nationkey = n_nationkey),
      a AS (
        SELECT n_name, sum(cents) AS estC,
               sum(CAST(cents AS HUGEINT) * cents) AS m2C
        FROM c GROUP BY 1),
      p AS (
        SELECT n_name, estC, m2C,
               lag(n_name) OVER (ORDER BY n_name) AS p_name,
               lag(estC) OVER (ORDER BY n_name) AS p_estC,
               lag(m2C) OVER (ORDER BY n_name) AS p_m2C
        FROM a),
      z AS (
        SELECT p_name AS nation_a, n_name AS nation_b,
               CAST(estC AS DOUBLE) / 100.0 - CAST(p_estC AS DOUBLE) / 100.0 AS diff,
               abs(CAST(estC AS DOUBLE) / 100.0 - CAST(p_estC AS DOUBLE) / 100.0)
                 / sqrt((CAST(m2C AS DOUBLE) + CAST(p_m2C AS DOUBLE)) / 1000000.0) AS zv
        FROM p WHERE p_name IS NOT NULL)
      SELECT nation_a, nation_b, round(diff, 2) AS diff, round(zv, 4) AS z,
             zv > 1.645 AS significant_90
      FROM z ORDER BY nation_b""",

    "llm_mixture_resample" -> """
      WITH st AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
      w AS (SELECT source, n_docs,
                   sqrt(CAST(n_docs AS DOUBLE)) / n_docs AS r FROM st),
      p AS (SELECT source, n_docs,
                   CAST(floor(r / max(r) OVER () * 10000) AS BIGINT) AS p_bp FROM w),
      d AS (SELECT doc_id, source,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-mix'), 1, 15)) AS BIGINT) % 10000 AS u
            FROM documents)
      SELECT p.source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(max(p.p_bp) AS BIGINT) AS p_bp,
             CAST(count(*) FILTER (WHERE d.u < p.p_bp) AS BIGINT) AS n_kept
      FROM d JOIN p ON d.source = p.source
      GROUP BY 1 ORDER BY 1""",

    // gap rule: epoch µs difference, identical lag/sum windows, tie-broken
    // by event_id (unique) so both engines label identically
    "event_sessionize" -> s"""
      WITH e AS (
        SELECT user_id, event_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events),
      f AS (
        SELECT user_id, event_id, ts,
               CASE WHEN prev_ts IS NULL
                      OR epoch_us(ts) - epoch_us(prev_ts) > 28800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM e),
      g AS (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
        FROM f),
      sess AS (
        SELECT user_id, session_id, count(*) AS n_events,
               min(ts) AS s_start, max(ts) AS s_end
        FROM g GROUP BY 1, 2)
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
             CAST(sum(n_events) AS BIGINT) AS n_events,
             ${N.ratio("sum(n_events)", "count(*)", 2)} AS avg_events,
             max(epoch_us(s_end) - epoch_us(s_start)) // 60000000 AS max_span_min
      FROM sess GROUP BY 1 ORDER BY user_id""",

    // integer-cent Holt recursion — DuckDB // and Scala / both truncate
    // toward zero, so the negative trend divisions agree exactly
    "ts_holt_linear" -> """
      WITH RECURSIVE daily AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        FROM events WHERE user_id < 12 AND event_type = 'purchase' GROUP BY 1, 2),
      r AS (
        SELECT user_id, day, cents,
               row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
        FROM daily),
      h AS (
        SELECT user_id, day, cents, rn, cents AS l, CAST(0 AS BIGINT) AS b
        FROM r WHERE rn = 1
        UNION ALL
        SELECT r.user_id, r.day, r.cents, r.rn,
               (r.cents + h.l + h.b) // 2,
               (((r.cents + h.l + h.b) // 2) - h.l + h.b) // 2
        FROM r JOIN h ON r.user_id = h.user_id AND r.rn = h.rn + 1)
      SELECT user_id, day, cents,
             CAST(l AS DOUBLE) / 100 AS level,
             CAST(b AS DOUBLE) / 100 AS trend,
             CAST(l + b AS DOUBLE) / 100 AS forecast
      FROM h ORDER BY user_id, day""",

    // same md5 point derivation as geo_grid_distance_join; quadkey digits
    // are pure integer div/mod; ROLLUP nulls mark the zoom level
    "geo_tile_rollup" -> """
      WITH pts AS (
        SELECT c_custkey AS id,
               CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || 'x'), 1, 15)) AS BIGINT) % 500 AS x,
               CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || 'y'), 1, 15)) AS BIGINT) % 500 AS y
        FROM customer WHERE c_custkey < 3000),
      q AS (SELECT id, x // 64 AS qx, y // 64 AS qy FROM pts),
      dg AS (
        SELECT id,
               (qy // 4) * 2 + (qx // 4) AS d1,
               ((qy // 2) % 2) * 2 + ((qx // 2) % 2) AS d2,
               (qy % 2) * 2 + (qx % 2) AS d3
        FROM q)
      SELECT CASE WHEN d3 IS NOT NULL THEN 3 WHEN d2 IS NOT NULL THEN 2
                  WHEN d1 IS NOT NULL THEN 1 ELSE 0 END AS zoom,
             concat_ws('', d1, d2, d3) AS quadkey,
             CAST(count(*) AS BIGINT) AS n_pts, CAST(sum(id) AS BIGINT) AS sum_ids
      FROM dg GROUP BY ROLLUP (d1, d2, d3)
      ORDER BY zoom, quadkey""",

    // positional 40-gram spans via struct unnest (range() can't be
    // lateral in DuckDB 1.0); identical md5-60-bit join key as the engine
    "llm_dup_span" -> s"""
      WITH raw AS (
        SELECT doc_id,
               unnest([{'pos': CAST(i AS INT),
                        'gh': CAST(('0x' || substr(md5(substr(text, CAST(i AS INT), 40)), 1, 15)) AS BIGINT)}
                       FOR i IN range(1, greatest(length(text) - 39, 0) + 1)]) AS u
        FROM documents),
      g AS (SELECT doc_id, u.pos AS pos, u.gh AS gh FROM raw),
      d AS (SELECT gh FROM g GROUP BY gh HAVING min(doc_id) <> max(doc_id)),
      f AS (SELECT doc_id, pos FROM g WHERE gh IN (SELECT gh FROM d)),
      i AS (SELECT doc_id, pos,
                   pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
            FROM f),
      runs AS (SELECT doc_id, isl, count(*) AS run FROM i GROUP BY 1, 2),
      p AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_runs,
                   CAST(sum(run) AS BIGINT) AS n_dup_grams,
                   CAST(max(run) AS BIGINT) AS max_run
            FROM runs GROUP BY 1),
      sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM g GROUP BY 1)
      SELECT p.doc_id, sz.n_grams, p.n_dup_grams, p.n_runs,
             p.max_run + 39 AS max_span_chars,
             ${N.ratio("n_dup_grams", "n_grams", 4)} AS dup_frac
      FROM p JOIN sz USING (doc_id) ORDER BY p.doc_id""",

    // quintiles under a (value, user_id) TOTAL order — ntile is then
    // deterministic in both engines; segment rules mirror the CASE chain
    "event_rfm" -> """
      WITH p AS (
        SELECT user_id, ts, CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'),
      u AS (
        SELECT user_id, max(ts) AS last_ts, CAST(count(*) AS BIGINT) AS f,
               CAST(sum(cents) AS BIGINT) AS m_cents
        FROM p GROUP BY 1),
      g AS (SELECT max(ts) AS g_latest FROM p),
      s AS (
        SELECT user_id,
               (epoch_us(g_latest) - epoch_us(last_ts)) // 86400000000 AS r_days,
               f, m_cents
        FROM u CROSS JOIN g),
      q AS (
        SELECT user_id, r_days, f, m_cents,
               CAST(ntile(5) OVER (ORDER BY r_days DESC, user_id DESC) AS INT) AS r_q,
               CAST(ntile(5) OVER (ORDER BY f ASC, user_id ASC) AS INT) AS f_q,
               CAST(ntile(5) OVER (ORDER BY m_cents ASC, user_id ASC) AS INT) AS m_q
        FROM s)
      SELECT user_id, r_days, f, CAST(m_cents AS DOUBLE) / 100 AS monetary,
             r_q, f_q, m_q,
             CASE WHEN r_q >= 4 AND f_q >= 4 AND m_q >= 4 THEN 'champion'
                  WHEN f_q >= 4 AND m_q >= 3 THEN 'loyal'
                  WHEN r_q <= 2 AND f_q >= 4 THEN 'at_risk'
                  WHEN r_q >= 4 AND f_q <= 2 THEN 'new'
                  ELSE 'regular' END AS segment
      FROM q ORDER BY user_id""",

    // centered 7-day MA (full windows only), weekday profile, residual —
    // all integer-cent floor/truncating division, identical both engines
    "ts_seasonal_decompose" -> """
      WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      t AS (
        SELECT day, cents,
               CASE WHEN count(*) OVER w = 7
                    THEN sum(cents) OVER w // 7 END AS trend_cents,
               CAST(date_part('isodow', day) - 1 AS INT) AS wd
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      d AS (SELECT *, cents - trend_cents AS detrended FROM t),
      sea AS (
        SELECT wd, CAST(sum(detrended) // count(*) AS BIGINT) AS seasonal_cents
        FROM d WHERE detrended IS NOT NULL GROUP BY 1)
      SELECT d.day, d.wd, d.cents, d.trend_cents,
             CASE WHEN d.trend_cents IS NOT NULL THEN sea.seasonal_cents END AS seasonal_cents,
             d.detrended - sea.seasonal_cents AS residual_cents
      FROM d LEFT JOIN sea USING (wd) ORDER BY d.day""",

    // same two-blocking edge CTE as graph_triangle_count; wedge join on
    // the shared neighbor + degree join = neighbor-set Jaccard
    "graph_jaccard_neighbors" -> s"""
      WITH docs AS (SELECT doc_id, source, lang, n_chars FROM documents WHERE doc_id < 1200),
      blocks AS (
        SELECT doc_id AS u, concat_ws('|', 's', source, CAST(n_chars // 100 AS VARCHAR)) AS bk FROM docs
        UNION ALL
        SELECT doc_id AS u, concat_ws('|', 'l', lang, CAST(n_chars // 50 AS VARCHAR)) AS bk FROM docs),
      edges AS (
        SELECT DISTINCT a.u AS u, b.u AS v
        FROM blocks a JOIN blocks b USING (bk) WHERE a.u < b.u),
      adj AS (SELECT u AS a, v AS n FROM edges UNION ALL SELECT v AS a, u AS n FROM edges),
      deg AS (SELECT a, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY 1),
      co AS (
        SELECT x.a AS a, y.a AS b, CAST(count(*) AS BIGINT) AS n_common
        FROM adj x JOIN adj y ON x.n = y.n WHERE x.a < y.a
        GROUP BY 1, 2 HAVING count(*) >= 2)
      SELECT c.a, c.b, da.deg AS deg_a, db.deg AS deg_b, c.n_common,
             ${N.ratio("n_common", "da.deg + db.deg - c.n_common", 4)} AS jaccard
      FROM co c JOIN deg da ON c.a = da.a JOIN deg db ON c.b = db.a
      ORDER BY jaccard DESC, c.a, c.b LIMIT 50""",

    // n-scaled deviations keep the co-moments in exact BIGINT; the
    // rn-difference self-join is the SQL form of the 7-lag window pass
    "ts_autocorrelation" -> s"""
      WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      idx AS (
        SELECT cents, row_number() OVER (ORDER BY day) AS rn,
               count(*) OVER () AS n, sum(cents) OVER () AS total
        FROM daily),
      d AS (SELECT rn, CAST(cents * n - total AS BIGINT) AS d FROM idx),
      den AS (SELECT CAST(sum(d * d) AS BIGINT) AS den FROM d),
      ks AS (SELECT CAST(unnest(range(1, 8)) AS INT) AS k),
      pairs AS (
        SELECT ks.k, a.d * b.d AS prod
        FROM ks, d a, d b WHERE a.rn = b.rn + ks.k),
      num AS (
        SELECT k, CAST(sum(prod) AS BIGINT) AS num, CAST(count(*) AS BIGINT) AS n_pairs
        FROM pairs GROUP BY 1)
      SELECT k, n_pairs,
             (CASE WHEN num < 0 THEN -1.0 ELSE 1.0 END) *
               ${N.ratio("abs(num)", "(SELECT den FROM den)", 4)} AS acf
      FROM num ORDER BY k""",

    // the lead window runs over the unique (ts, event_id) total order,
    // so the successor relation is identical in both engines
    "event_markov_chain" -> s"""
      WITH tr AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        FROM events),
      c AS (
        SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        FROM tr WHERE to_type IS NOT NULL GROUP BY 1, 2),
      tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from FROM c GROUP BY 1)
      SELECT c.from_type, c.to_type, c.n, tot.n_from,
             ${N.ratio("c.n", "tot.n_from", 4)} AS p
      FROM c JOIN tot USING (from_type)
      ORDER BY c.from_type, c.to_type""",

    // per-line exact-cent net (the repo's standard decimal recipe),
    // header-vs-detail diff in BIGINT cents end-to-end
    "dq_reconcile_totals" -> """
      WITH l AS (
        SELECT l_orderkey AS o_orderkey,
               CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                    - CAST(round(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(3,2)) * 100, 0) AS BIGINT)
                    + CAST(round(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_tax AS DECIMAL(3,2)) * 100, 0) AS BIGINT)) AS BIGINT) AS line_cents
        FROM lineitem GROUP BY 1),
      j AS (
        SELECT o.o_orderstatus, l.line_cents,
               CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) - l.line_cents AS diff
        FROM orders o LEFT JOIN l USING (o_orderkey))
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(count(line_cents) AS BIGINT) AS n_with_lines,
             CAST(count(*) FILTER (WHERE diff = 0) AS BIGINT) AS n_exact,
             max(abs(diff)) AS max_abs_diff_cents,
             CAST(sum(abs(diff)) AS BIGINT) // NULLIF(count(line_cents), 0) AS mean_abs_diff_cents
      FROM j GROUP BY 1 ORDER BY o_orderstatus""",

    // parquet-side truth of the binary round-trip: if any byte diverges
    // in transit the engine's verdict counts fall below count(*)
    "source_binaryfile" -> """
      SELECT CAST(count(*) AS BIGINT) AS n_files,
             CAST(count(*) AS BIGINT) AS n_len_ok,
             CAST(count(*) AS BIGINT) AS n_content_ok,
             CAST(sum(strlen(text)) AS BIGINT) AS total_bytes
      FROM documents WHERE doc_id < 100""",

    // shares are the exact half-up 6-decimal ratios of both engines;
    // the gap subtracts two bit-identical doubles
    "dq_distribution_drift" -> s"""
      WITH cells AS (
        SELECT event_type,
               CAST(count_if(user_id % 2 = 0) AS BIGINT) AS n_a,
               CAST(count_if(user_id % 2 = 1) AS BIGINT) AS n_b
        FROM events GROUP BY 1),
      tot AS (SELECT CAST(sum(n_a) AS BIGINT) AS tot_a,
                     CAST(sum(n_b) AS BIGINT) AS tot_b FROM cells)
      SELECT event_type, n_a, n_b,
             ${N.ratio("n_a", "tot_a", 6)} AS share_a,
             ${N.ratio("n_b", "tot_b", 6)} AS share_b,
             abs(${N.ratio("n_a", "tot_a", 6)} - ${N.ratio("n_b", "tot_b", 6)}) AS share_gap
      FROM cells, tot ORDER BY event_type""",

    // distinct (user, day) first, then the 7-day fan-out re-distinct —
    // identical set algebra in both engines
    "event_active_users" -> s"""
      WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY 1),
      wau AS (
        SELECT day, CAST(count(*) AS BIGINT) AS wau FROM (
          SELECT DISTINCT ud.day + CAST(i.i AS INTEGER) AS day, ud.user_id
          FROM ud, (SELECT unnest(range(0, 7)) AS i) i)
        GROUP BY 1)
      SELECT dau.day, dau.dau, wau.wau,
             ${N.ratio("dau.dau", "wau.wau", 4)} AS stickiness
      FROM dau JOIN wau USING (day) ORDER BY dau.day""",

    // Kaplan–Meier: the survival products multiply left-to-right in
    // lifetime order in BOTH engines (Spark's array fold, this
    // recursive CTE), so the doubles are bit-identical — each step is
    // one exact IEEE divide, subtract, multiply in the same sequence
    "event_survival_km" -> """
      WITH RECURSIVE e AS (
        SELECT user_id, CAST(ts AS DATE) AS d FROM events),
      cut AS (SELECT max(d) - 7 AS dcut FROM e),
      u AS (
        SELECT datediff('day', min(d), max(d)) AS dur,
               max(d) >= (SELECT dcut FROM cut) AS censored
        FROM e GROUP BY user_id),
      c AS (
        SELECT dur, CAST(count(*) AS BIGINT) AS total,
               CAST(count(*) FILTER (WHERE NOT censored) AS BIGINT) AS deaths
        FROM u GROUP BY dur),
      r AS (
        SELECT dur, total, deaths,
               CAST(sum(total) OVER (ORDER BY dur DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_risk,
               row_number() OVER (ORDER BY dur) AS rn
        FROM c),
      rec AS (
        SELECT rn, dur, total, deaths, n_risk,
               CAST(1.0 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - CAST(deaths AS DOUBLE) / CAST(n_risk AS DOUBLE)) AS survival
        FROM r WHERE rn = 1
        UNION ALL
        SELECT r.rn, r.dur, r.total, r.deaths, r.n_risk,
               rec.survival * (CAST(1.0 AS DOUBLE) - CAST(r.deaths AS DOUBLE) / CAST(r.n_risk AS DOUBLE))
        FROM r JOIN rec ON r.rn = rec.rn + 1)
      SELECT dur AS dur_days, total, deaths, n_risk, survival
      FROM rec ORDER BY dur_days""",

    // +1 at start, −1 the day after the inclusive end; running sum over
    // the unique day axis (default window frame agrees in both engines)
    "ts_interval_sweep" -> """
      WITH ends AS (
        SELECT l_orderkey AS o_orderkey, max(CAST(l_shipdate AS DATE)) AS ship_end
        FROM lineitem GROUP BY 1),
      spans AS (
        SELECT CAST(o.o_orderdate AS DATE) AS start_day,
               greatest(CAST(o.o_orderdate AS DATE), e.ship_end) AS end_day
        FROM orders o JOIN ends e USING (o_orderkey)),
      deltas AS (
        SELECT day, CAST(sum(d) AS BIGINT) AS net FROM (
          SELECT start_day AS day, 1 AS d FROM spans
          UNION ALL
          SELECT end_day + 1 AS day, -1 AS d FROM spans)
        GROUP BY 1),
      open_d AS (
        SELECT day, CAST(sum(net) OVER (ORDER BY day) AS BIGINT) AS open_eod
        FROM deltas)
      SELECT CAST(date_trunc('month', day) AS DATE) AS month,
             max(open_eod) AS peak_open,
             arg_max(open_eod, day) AS month_end_open,
             CAST(count(*) AS BIGINT) AS n_delta_days
      FROM open_d GROUP BY 1 ORDER BY month""",

    // three chained peel CTEs — same bounded-round convention as the
    // pagerank/LPA/BFS mirrors over the same two-blocking edge set
    "graph_k_core" -> """
      WITH docs AS (SELECT doc_id, source, lang, n_chars FROM documents WHERE doc_id < 1200),
      blocks AS (
        SELECT doc_id AS u, concat_ws('|', 's', source, CAST(n_chars // 100 AS VARCHAR)) AS bk FROM docs
        UNION ALL
        SELECT doc_id AS u, concat_ws('|', 'l', lang, CAST(n_chars // 50 AS VARCHAR)) AS bk FROM docs),
      edges0 AS (
        SELECT DISTINCT a.u AS u, b.u AS v
        FROM blocks a JOIN blocks b USING (bk) WHERE a.u < b.u),
      e0 AS (SELECT u, v FROM edges0 UNION ALL SELECT v, u FROM edges0),
      a1 AS (SELECT u FROM e0 GROUP BY u HAVING count(*) >= 3),
      e1 AS (SELECT e0.u, e0.v FROM e0
             JOIN a1 x ON e0.u = x.u JOIN a1 y ON e0.v = y.u),
      a2 AS (SELECT u FROM e1 GROUP BY u HAVING count(*) >= 3),
      e2 AS (SELECT e1.u, e1.v FROM e1
             JOIN a2 x ON e1.u = x.u JOIN a2 y ON e1.v = y.u),
      a3 AS (SELECT u FROM e2 GROUP BY u HAVING count(*) >= 3),
      e3 AS (SELECT e2.u, e2.v FROM e2
             JOIN a3 x ON e2.u = x.u JOIN a3 y ON e2.v = y.u)
      SELECT u AS node, CAST(count(*) AS BIGINT) AS core_deg
      FROM e3 GROUP BY 1 ORDER BY core_deg DESC, node LIMIT 50""",

    // identical bigram census + marginals; lift is the same scaled
    // BIGINT ratio (monotone in PMI), so the top-50 ranking matches
    "llm_pmi_collocations" -> s"""
      WITH b AS (
        SELECT unnest(list_transform(range(1, len(w)),
                      i -> {'w1': w[i], 'w2': w[i+1]})) AS p
        FROM (SELECT string_split(text, ' ') AS w FROM documents WHERE doc_id < 2000)),
      c AS (SELECT p.w1 AS w1, p.w2 AS w2, CAST(count(*) AS BIGINT) AS n_pair
            FROM b GROUP BY 1, 2),
      l AS (SELECT w1, CAST(sum(n_pair) AS BIGINT) AS n_left FROM c GROUP BY 1),
      r AS (SELECT w2, CAST(sum(n_pair) AS BIGINT) AS n_right FROM c GROUP BY 1),
      tot AS (SELECT CAST(sum(n_pair) AS BIGINT) AS n_total FROM c)
      SELECT c.w1, c.w2, c.n_pair, l.n_left, r.n_right,
             ${N.ratio("c.n_pair * tot.n_total", "l.n_left * r.n_right", 4)} AS lift
      FROM c JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN tot
      WHERE c.n_pair >= 5
      ORDER BY lift DESC, c.n_pair DESC, c.w1, c.w2 LIMIT 50""",

    // same (ts, event_id) total order as event_markov_chain; the
    // default RANGE frame groups gap ties identically in both engines
    "event_interarrival" -> """
      WITH g AS (
        SELECT event_type,
               (epoch_us(ts) - lag(epoch_us(ts))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id)) // 1000000 AS gap_s
        FROM events),
      f AS (SELECT event_type, CAST(gap_s AS BIGINT) AS gap_s FROM g WHERE gap_s IS NOT NULL),
      c AS (SELECT event_type, gap_s,
                   count(*) OVER (PARTITION BY event_type ORDER BY gap_s) AS cw,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM f)
      SELECT event_type,
             CAST(max(n) AS BIGINT) AS n_gaps,
             min(gap_s) AS min_s,
             min(CASE WHEN cw * 2 >= n THEN gap_s END) AS p50_s,
             min(CASE WHEN cw * 10 >= n * 9 THEN gap_s END) AS p90_s,
             max(gap_s) AS max_s,
             CAST(sum(gap_s) // count(*) AS BIGINT) AS mean_s
      FROM c GROUP BY event_type ORDER BY event_type""",

    // identical integer-cent floor-division bucketing; top bucket
    // open-ended via least()
    "agg_histogram" -> s"""
      WITH h AS (
        SELECT least(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) // 5000000, 10) AS bucket,
               CAST(count(*) AS BIGINT) AS n_orders,
               min(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS min_cents,
               max(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS max_cents
        FROM orders GROUP BY 1),
      tot AS (SELECT CAST(sum(n_orders) AS BIGINT) AS n_total FROM h)
      SELECT bucket, bucket * 50000 AS lo_dollars, n_orders, min_cents, max_cents,
             ${N.ratio("n_orders", "tot.n_total", 4)} AS share
      FROM h CROSS JOIN tot ORDER BY bucket""",

    // dense 20x20 cells (>= 4 points), 8-neighborhood reachability to
    // the minimum cell id — recursive CTE mirror of the component
    // fixpoint, same convention as graph_components
    "geo_grid_dbscan" -> """
      WITH p AS (
        SELECT c_custkey AS id,
               CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || 'x'), 1, 15)) AS BIGINT) % 500 AS x,
               CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || 'y'), 1, 15)) AS BIGINT) % 500 AS y
        FROM customer WHERE c_custkey < 3000),
      dense AS (
        SELECT x // 20 AS cx, y // 20 AS cy, CAST(count(*) AS BIGINT) AS n_pts
        FROM p GROUP BY 1, 2 HAVING count(*) >= 4),
      e AS (
        SELECT a.cx * 1000 + a.cy AS s, b.cx * 1000 + b.cy AS d
        FROM dense a JOIN dense b
          ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1),
      r AS (
        WITH RECURSIVE reach(n, m) AS (
          SELECT s, s FROM e
          UNION
          SELECT e.s, reach.m FROM e JOIN reach ON e.d = reach.n)
        SELECT n, min(m) AS label FROM reach GROUP BY n)
      SELECT r.label AS cluster,
             CAST(count(*) AS BIGINT) AS n_cells,
             CAST(sum(dense.n_pts) AS BIGINT) AS n_points,
             min(dense.cx) AS cx_min, max(dense.cx) AS cx_max,
             min(dense.cy) AS cy_min, max(dense.cy) AS cy_max
      FROM r JOIN dense ON dense.cx * 1000 + dense.cy = r.n
      GROUP BY 1 ORDER BY cluster""",

    // both snapshots from ONE conditional-sum pass; append-only shipping
    // means 'removed' cannot occur (its absence is the audit)
    "dim_snapshot_compare" -> """
      WITH snap AS (
        SELECT l_orderkey AS o_orderkey,
               CAST(sum(CASE WHEN CAST(l_shipdate AS DATE) <= DATE '1998-01-01'
                        THEN CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS v_old,
               CAST(sum(CASE WHEN CAST(l_shipdate AS DATE) <= DATE '2000-01-01'
                        THEN CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS v_new
        FROM lineitem GROUP BY 1),
      d AS (
        SELECT o.o_orderstatus,
               CASE WHEN s.o_orderkey IS NULL THEN 'absent'
                    WHEN s.v_old = 0 AND s.v_new = 0 THEN 'absent'
                    WHEN s.v_old = 0 THEN 'added'
                    WHEN s.v_old = s.v_new THEN 'unchanged'
                    ELSE 'changed' END AS change_class,
               coalesce(s.v_new - s.v_old, 0) AS delta_cents
        FROM orders o LEFT JOIN snap s USING (o_orderkey))
      SELECT o_orderstatus, change_class,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(delta_cents) AS BIGINT) AS delta_cents,
             max(delta_cents) AS max_delta_cents
      FROM d GROUP BY 1, 2 ORDER BY o_orderstatus, change_class""",

    // path = first five event types under the unique (ts, event_id)
    // total order; list slice and join are identical in both engines
    "event_top_paths" -> s"""
      WITH p AS (
        SELECT array_to_string(
                 (list(event_type ORDER BY ts, event_id))[1:5], '>') AS path
        FROM events GROUP BY user_id),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM p),
      c AS (SELECT path, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1)
      SELECT c.path, c.n,
             contains(c.path, 'purchase') AS has_purchase,
             ${N.ratio("c.n", "tot.n_users", 4)} AS user_share
      FROM c CROSS JOIN tot
      ORDER BY c.n DESC, c.path LIMIT 20""",

    "sql_groupby_all" -> """
      SELECT o_orderstatus, o_orderpriority,
             count(*) AS n,
             CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
      FROM orders
      GROUP BY ALL
      ORDER BY ALL""",

    // expected union recomputed from the source table: even ids = old
    // generation (no n_chars), odd = new — a mergeSchema read that
    // mis-nulls or drops the evolved column hash-fails
    "source_schema_merge" -> """
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count_if(doc_id % 2 = 0) AS BIGINT) AS n_pre_evolution,
             CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars ELSE 0 END) AS BIGINT) AS chars_post
      FROM documents WHERE doc_id < 3000
      GROUP BY 1 ORDER BY lang""",

    // same cumulative-count discrete quartiles as event_interarrival;
    // fences floor-divide 1.5*IQR identically in both engines
    "dq_outlier_iqr" -> """
      WITH b AS (
        SELECT event_type, CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
        FROM events),
      q AS (
        SELECT event_type,
               min(CASE WHEN cw * 4 >= n THEN c END) AS q1_cents,
               min(CASE WHEN cw * 4 >= n * 3 THEN c END) AS q3_cents
        FROM (SELECT event_type, c,
                     count(*) OVER (PARTITION BY event_type ORDER BY c) AS cw,
                     count(*) OVER (PARTITION BY event_type) AS n
              FROM b)
        GROUP BY 1),
      f AS (
        SELECT event_type, q1_cents, q3_cents,
               q1_cents - ((q3_cents - q1_cents) * 3) // 2 AS lo_fence,
               q3_cents + ((q3_cents - q1_cents) * 3) // 2 AS hi_fence
        FROM q)
      SELECT b.event_type,
             max(f.q1_cents) AS q1_cents, max(f.q3_cents) AS q3_cents,
             max(f.lo_fence) AS lo_fence, max(f.hi_fence) AS hi_fence,
             CAST(count_if(b.c < f.lo_fence) AS BIGINT) AS n_below,
             CAST(count_if(b.c > f.hi_fence) AS BIGINT) AS n_above,
             CAST(count(*) AS BIGINT) AS n
      FROM b JOIN f USING (event_type)
      GROUP BY 1 ORDER BY b.event_type""",

    // identical distinct-2gram set algebra; micro recall is the ratio
    // of sums, so aggregation order cannot drift it
    "llm_rouge_recall" -> s"""
      WITH g AS (
        SELECT DISTINCT doc_id, lang,
               unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS g
        FROM (SELECT doc_id, lang, string_split(text, ' ') AS w
              FROM documents WHERE doc_id < 500)),
      cand AS (SELECT doc_id, lang, g FROM g WHERE doc_id < 250),
      ref AS (SELECT doc_id - 250 AS doc_id, g FROM g WHERE doc_id >= 250),
      refn AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ref FROM ref GROUP BY 1),
      ovl AS (SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
              FROM cand c JOIN ref r ON c.doc_id = r.doc_id AND c.g = r.g
              GROUP BY 1),
      langs AS (SELECT DISTINCT doc_id, lang FROM cand)
      SELECT l.lang,
             CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(coalesce(o.n_overlap, 0)) AS BIGINT) AS sum_overlap,
             CAST(sum(rn.n_ref) AS BIGINT) AS sum_ref,
             ${N.ratio("sum(coalesce(o.n_overlap, 0))", "sum(rn.n_ref)", 4)} AS micro_recall
      FROM langs l JOIN refn rn USING (doc_id) LEFT JOIN ovl o USING (doc_id)
      GROUP BY 1 ORDER BY l.lang""",

    // daily rollup first; slopes truncate identically (both engines'
    // integer division truncates toward zero); discrete median
    "ts_theil_sen" -> """
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      d AS (SELECT cents, row_number() OVER (ORDER BY day) AS i FROM daily),
      s AS (
        SELECT CAST((b.cents - a.cents) * 1000000 // (b.i - a.i) AS BIGINT) AS slope_micro
        FROM d a JOIN d b ON b.i > a.i),
      c AS (SELECT slope_micro,
                   count(*) OVER (ORDER BY slope_micro) AS cw,
                   count(*) OVER () AS n
            FROM s)
      SELECT CAST(max(n) AS BIGINT) AS n_pairs,
             min(slope_micro) AS min_slope_micro,
             min(CASE WHEN cw * 2 >= n THEN slope_micro END) AS median_slope_micro,
             max(slope_micro) AS max_slope_micro
      FROM c""",

    // dim_scd2_build's history re-derived, then the half-open
    // point-in-time resolution and per-attr rollup
    "join_scd2_asof" -> """
      WITH obs AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority AS attr,
               lag(o_orderpriority) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS prev_attr
        FROM orders WHERE o_custkey < 300),
      chg AS (
        SELECT o_custkey, o_orderdate, o_orderkey, attr
        FROM obs WHERE prev_attr IS NULL OR attr <> prev_attr),
      dim AS (
        SELECT o_custkey, attr, o_orderdate AS valid_from,
               lead(o_orderdate) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS valid_to
        FROM chg),
      f AS (
        SELECT o_custkey, o_orderdate,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        FROM orders WHERE o_custkey < 300)
      SELECT d.attr,
             CAST(count(*) AS BIGINT) AS n_facts,
             CAST(count(DISTINCT f.o_custkey) AS BIGINT) AS n_keys,
             CAST(sum(f.cents) AS BIGINT) AS cents
      FROM f JOIN dim d
        ON f.o_custkey = d.o_custkey
       AND f.o_orderdate >= d.valid_from
       AND (d.valid_to IS NULL OR f.o_orderdate < d.valid_to)
      GROUP BY 1 ORDER BY d.attr""",

    // deterministic (count desc, user) decile ranks on the aggregated
    // user dimension; exact share ratios
    "event_concentration" -> s"""
      WITH pu AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
                  FROM events GROUP BY 1),
      d AS (SELECT n_events,
                   CAST(ntile(10) OVER (ORDER BY n_events DESC, user_id) AS INT) AS decile
            FROM pu),
      tot AS (SELECT CAST(sum(n_events) AS BIGINT) AS n_total FROM d)
      SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(n_events) AS BIGINT) AS n_events,
             ${N.ratio("sum(n_events)", "tot.n_total", 4)} AS event_share
      FROM d CROSS JOIN tot GROUP BY decile, tot.n_total ORDER BY decile""",

    // per-char census via positional substr expansion; exact
    // Gini-Simpson ratio (n^2 - sum c^2) / n^2
    "llm_char_diversity" -> s"""
      WITH ch AS (
        SELECT doc_id,
               unnest(list_transform(range(1, length(text) + 1),
                      i -> substr(text, CAST(i AS INT), 1))) AS ch
        FROM documents WHERE doc_id < 1000),
      c AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
            FROM ch WHERE ch <> '' GROUP BY 1, 2),
      a AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars,
                   CAST(count(*) AS BIGINT) AS n_distinct_chars,
                   CAST(sum(c * c) AS BIGINT) AS sum_c2
            FROM c GROUP BY 1)
      SELECT doc_id, n_chars, n_distinct_chars,
             ${N.ratio("n_chars * n_chars - sum_c2", "n_chars * n_chars", 4)} AS gini_simpson
      FROM a ORDER BY doc_id""",

    // ISO (isoyear, week) rollup; lag + signed half-up growth ratio
    "ts_week_over_week" -> s"""
      WITH wk AS (
        SELECT CAST(date_part('isoyear', ts) AS INT) AS iso_year,
               CAST(date_part('week', ts) AS INT) AS iso_week,
               CAST(count(*) AS BIGINT) AS n_purchases,
               CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      l AS (
        SELECT *, lag(cents) OVER (ORDER BY iso_year, iso_week) AS prev_cents
        FROM wk)
      SELECT iso_year, iso_week, n_purchases, cents,
             cents - prev_cents AS delta_cents,
             CASE WHEN prev_cents IS NULL THEN NULL
                  ELSE (CASE WHEN cents < prev_cents THEN -1.0 ELSE 1.0 END) *
                       ${N.ratio("abs(cents - prev_cents)", "prev_cents", 4)} END AS wow_growth
      FROM l ORDER BY iso_year, iso_week""",

    // the SFS sort-scan under STANDARD (non-strict) dominance: the
    // (price desc, date desc, key) prefix holds every ≥-priced row, so
    // a row survives iff its date strictly exceeds the prefix's running
    // max date — price-tied rows with older dates are dominated too
    "agg_skyline_2d" -> """
      WITH o AS (
        SELECT o_orderstatus, o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
               CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d_day
        FROM orders),
      w AS (
        SELECT *, max(d_day) OVER (PARTITION BY o_orderstatus
                 ORDER BY cents DESC, d_day DESC, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mp
        FROM o)
      SELECT o_orderstatus, o_orderkey,
             CAST(cents AS DOUBLE) / 100 AS totalprice,
             d_day AS order_epoch_day
      FROM w WHERE mp IS NULL OR d_day > mp
      ORDER BY o_orderstatus, o_orderkey""",

    // identical md5 draw, nibble shard, and position-weighted order
    // checksum — any order divergence hash-fails
    "llm_epoch_shuffle" -> """
      WITH pe AS (
        SELECT CAST(e.e AS BIGINT) AS epoch, d.doc_id,
               md5('epoch' || CAST(e.e AS VARCHAR) || '|' || CAST(d.doc_id AS VARCHAR)) AS draw
        FROM documents d CROSS JOIN (SELECT unnest([0, 1]) AS e) e),
      sh AS (
        SELECT epoch, doc_id, draw,
               CAST(('0x' || substr(draw, 1, 1)) AS BIGINT) AS shard,
               CAST(row_number() OVER (
                 PARTITION BY epoch, CAST(('0x' || substr(draw, 1, 1)) AS BIGINT)
                 ORDER BY draw) AS BIGINT) AS pos
        FROM pe)
      SELECT epoch, shard,
             CAST(count(*) AS BIGINT) AS n_docs,
             arg_min(doc_id, draw) AS first_doc,
             arg_max(doc_id, draw) AS last_doc,
             CAST(sum(pos * doc_id) AS BIGINT) AS order_checksum
      FROM sh GROUP BY 1, 2 ORDER BY epoch, shard""",

    // DuckDB has no AES; the gate holds through the roundtrip and
    // ECB-determinism invariants, which the mirror states exactly
    "fn_crypto_roundtrip" -> """
      SELECT o_orderstatus,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_roundtrip_ok,
             CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_distinct_cipher,
             CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_distinct_plain
      FROM orders WHERE o_orderkey < 4000
      GROUP BY 1 ORDER BY o_orderstatus""",

    "sql_identifier" -> """
      SELECT o_orderstatus, count(*) AS n,
             CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    // identical md5-slice stub decode (images only) + the same integer
    // fit/letterbox/patch arithmetic
    "mm_resize_plan" -> """
      WITH m AS (
        SELECT doc_id, md5(text) AS hx
        FROM documents WHERE doc_id < 2000 AND doc_id % 3 = 0),
      d AS (
        SELECT doc_id,
               64 + CAST(('0x' || substr(hx, 1, 8)) AS BIGINT) % 1857 AS w,
               64 + CAST(('0x' || substr(hx, 9, 8)) AS BIGINT) % 1017 AS h
        FROM m),
      f AS (
        SELECT doc_id, w, h,
               CASE WHEN greatest(w, h) <= 224 THEN w
                    ELSE (w * 224) // greatest(w, h) END AS out_w,
               CASE WHEN greatest(w, h) <= 224 THEN h
                    ELSE (h * 224) // greatest(w, h) END AS out_h
        FROM d)
      SELECT doc_id, w, h, out_w, out_h,
             224 - out_w AS pad_x, 224 - out_h AS pad_y,
             ((out_w + 15) // 16) * ((out_h + 15) // 16) AS n_patches
      FROM f ORDER BY doc_id""",

    // type-7 interpolation on exact integer cents with dyadic
    // fractions — the one float op is IEEE-identical in both engines
    "agg_percentile_cont" -> """
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n_rows,
             quantile_cont(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT), 0.25) AS p25_cents,
             quantile_cont(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT), 0.5) AS p50_cents,
             quantile_cont(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT), 0.75) AS p75_cents
      FROM lineitem GROUP BY 1 ORDER BY l_returnflag""",

    // per-user horizon distances in exact epoch-us day arithmetic
    "event_lifecycle" -> s"""
      WITH pu AS (
        SELECT user_id, max(ts) AS last_ts, min(ts) AS first_ts,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1),
      h AS (SELECT max(last_ts) AS h FROM pu),
      c AS (
        SELECT user_id, n_events,
               (epoch_us(last_ts) - epoch_us(first_ts)) // 86400000000 AS span_days,
               CASE WHEN (epoch_us(h.h) - epoch_us(last_ts)) // 86400000000 < 7 THEN 'active'
                    WHEN (epoch_us(h.h) - epoch_us(last_ts)) // 86400000000 < 14 THEN 'lapsing'
                    ELSE 'churned' END AS state
        FROM pu CROSS JOIN h)
      SELECT state, CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(n_events) AS BIGINT) AS n_events,
             ${N.avgInt("span_days", 2)} AS avg_span_days
      FROM c GROUP BY 1 ORDER BY state""",

    // same bounded-probe mirror as llm_sim_cosine_topk plus the
    // different-label filter and negative-label join
    "llm_hard_negatives" -> """
      WITH n AS (
        SELECT vec_id, embedding, label,
               sqrt((SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                     FROM unnest(embedding) AS u(x))) AS nrm
        FROM embeddings),
      p AS (SELECT vec_id AS pid, embedding AS pe, nrm AS pnorm, label AS probe_label
            FROM n WHERE vec_id < 10),
      pairs AS (
        SELECT p.pid, p.probe_label, c.vec_id AS nid, c.label AS neg_label,
               round((SELECT sum(a * b) FROM (
                        SELECT CAST(unnest(p.pe) AS DOUBLE) AS a,
                               CAST(unnest(c.embedding) AS DOUBLE) AS b))
                     / (p.pnorm * c.nrm), 4) AS cos
        FROM p CROSS JOIN n c
        WHERE c.vec_id <> p.pid AND c.label <> p.probe_label)
      SELECT pid, probe_label, rnk, nid, neg_label, cos FROM (
        SELECT pid, probe_label, nid, neg_label, cos,
               row_number() OVER (PARTITION BY pid ORDER BY cos DESC, nid) AS rnk
        FROM pairs)
      WHERE rnk <= 5 ORDER BY pid, rnk""",

    // running max + rank-encoded earliest-trough arg-max; exact cents
    "ts_max_drawdown" -> s"""
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      d AS (
        SELECT day, cents,
               CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn,
               CAST(max(cents) OVER (ORDER BY day) AS BIGINT) AS peak
        FROM daily),
      x AS (SELECT day, rn, peak, peak - cents AS dd FROM d),
      a AS (
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               max(dd) AS max_dd_cents,
               arg_max(day, dd * 100000 + (100000 - rn)) AS trough_day,
               arg_max(peak, dd * 100000 + (100000 - rn)) AS peak_cents
        FROM x)
      SELECT n_days, max_dd_cents, trough_day, peak_cents,
             ${N.ratio("max_dd_cents", "peak_cents", 4)} AS dd_ratio
      FROM a""",

    // the oracle uses the simple global-lag form; the engine's
    // two-level bucketed form must agree on every adjacent pair
    "dq_sequence_gaps" -> """
      WITH k AS (SELECT DISTINCT o_orderkey AS k FROM orders),
      d AS (SELECT k, lag(k) OVER (ORDER BY k) AS p FROM k),
      g AS (
        SELECT CAST(count_if(k - p > 1) AS BIGINT) AS n_gaps,
               CAST(coalesce(max(CASE WHEN k - p > 1 THEN k - p - 1 END), 0) AS BIGINT) AS max_gap_len,
               CAST(coalesce(sum(CASE WHEN k - p > 1 THEN k - p - 1 END), 0) AS BIGINT) AS missing_total
        FROM d WHERE p IS NOT NULL),
      t AS (SELECT CAST(count(*) AS BIGINT) AS n_keys, min(k) AS key_min, max(k) AS key_max FROM k)
      SELECT t.n_keys, t.key_min, t.key_max, g.n_gaps, g.missing_total, g.max_gap_len
      FROM t CROSS JOIN g""",

    // same LPA 3-round chain as graph_label_propagation, extended with
    // the per-community in-edge/degree censuses; signed half-up ratio
    "graph_modularity" -> s"""
      WITH docs AS (SELECT doc_id, source, lang, n_chars FROM documents WHERE doc_id < 1200),
      blocks AS (
        SELECT doc_id AS u, concat_ws('|', 's', source, CAST(n_chars // 100 AS VARCHAR)) AS bk FROM docs
        UNION ALL
        SELECT doc_id AS u, concat_ws('|', 'l', lang, CAST(n_chars // 50 AS VARCHAR)) AS bk FROM docs),
      edges AS (
        SELECT DISTINCT a.u AS u, b.u AS v
        FROM blocks a JOIN blocks b USING (bk) WHERE a.u < b.u),
      adj AS (SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges),
      l0 AS (SELECT DISTINCT u AS node, u AS label FROM adj),
      n1 AS (SELECT a.u AS node, l.label, count(*) AS c
             FROM adj a JOIN l0 l ON a.v = l.node GROUP BY 1, 2),
      l1 AS (SELECT node, label FROM (
               SELECT node, label, row_number() OVER (PARTITION BY node
                 ORDER BY c DESC, label) AS rn FROM n1) WHERE rn = 1),
      n2 AS (SELECT a.u AS node, l.label, count(*) AS c
             FROM adj a JOIN l1 l ON a.v = l.node GROUP BY 1, 2),
      l2 AS (SELECT node, label FROM (
               SELECT node, label, row_number() OVER (PARTITION BY node
                 ORDER BY c DESC, label) AS rn FROM n2) WHERE rn = 1),
      n3 AS (SELECT a.u AS node, l.label, count(*) AS c
             FROM adj a JOIN l2 l ON a.v = l.node GROUP BY 1, 2),
      l3 AS (SELECT node, label FROM (
               SELECT node, label, row_number() OVER (PARTITION BY node
                 ORDER BY c DESC, label) AS rn FROM n3) WHERE rn = 1),
      wl AS (SELECT a.u, a.v, lu.label AS lu, lv.label AS lv
             FROM adj a JOIN l3 lu ON a.u = lu.node JOIN l3 lv ON a.v = lv.node),
      twom AS (SELECT CAST(count(*) AS BIGINT) AS twom FROM wl),
      inc AS (SELECT lu AS community, CAST(count(*) AS BIGINT) AS in_edges
              FROM wl WHERE lu = lv GROUP BY 1),
      degc AS (SELECT lu AS community, CAST(count(*) AS BIGINT) AS deg_sum FROM wl GROUP BY 1),
      nodc AS (SELECT label AS community, CAST(count(*) AS BIGINT) AS n_nodes FROM l3 GROUP BY 1)
      SELECT n.community, n.n_nodes, coalesce(i.in_edges, 0) AS in_edges, d.deg_sum,
             (CASE WHEN t.twom * coalesce(i.in_edges, 0) - d.deg_sum * d.deg_sum < 0
                   THEN -1.0 ELSE 1.0 END) *
               ${N.ratio("abs(t.twom * coalesce(i.in_edges, 0) - d.deg_sum * d.deg_sum)",
                 "t.twom * t.twom", 6)} AS q_contrib
      FROM nodc n JOIN degc d USING (community)
      LEFT JOIN inc i USING (community) CROSS JOIN twom t
      ORDER BY n.community""",

    // same LPA 3-round chain, extended with the one-sweep Louvain
    // local-move gain: ΔQ·2m² = 2m·(k_ic − k_icur) − k_i·(tot_c −
    // tot_cur + k_i), all BIGINT; argmax (gain DESC, c ASC), moved
    // nodes only (CTE chain shared with graph_louvain_apply)
    "graph_louvain_one_level" -> s"""
      WITH $louvainCtes
      SELECT node, cur AS from_community, c AS to_community,
             deg AS k_i, k_icur, k_ic AS k_to, CAST(gain_scaled AS BIGINT) AS gain_scaled
      FROM (SELECT *, row_number() OVER (PARTITION BY node
              ORDER BY gain_scaled DESC, c) AS rn FROM g)
      WHERE rn = 1 AND gain_scaled > 0
      ORDER BY node""",

    // the sweep APPLIED: post-move labels, then the exact modularity
    // numerator Q·(2m)² = 2m·Σin_c − Σd_c² for both partitions — the
    // integer comparison IS the modularity comparison (same (2m)²
    // denominator), so no ratio ever materializes
    "graph_louvain_apply" -> s"""
      WITH $louvainCtes,
      moves AS (
        SELECT node, c AS to_c
        FROM (SELECT *, row_number() OVER (PARTITION BY node
                ORDER BY gain_scaled DESC, c) AS rn FROM g)
        WHERE rn = 1 AND gain_scaled > 0),
      newlab AS (
        SELECT l.node, coalesce(m.to_c, l.label) AS label
        FROM l3 l LEFT JOIN moves m USING (node)),
      cens_b AS (
        SELECT lu.label AS community, CAST(count(*) AS BIGINT) AS deg_sum,
               CAST(count(*) FILTER (WHERE lu.label = lv.label) AS BIGINT) AS in_edges
        FROM adj a JOIN l3 lu ON a.u = lu.node JOIN l3 lv ON a.v = lv.node
        GROUP BY 1),
      cens_a AS (
        SELECT lu.label AS community, CAST(count(*) AS BIGINT) AS deg_sum,
               CAST(count(*) FILTER (WHERE lu.label = lv.label) AS BIGINT) AS in_edges
        FROM adj a JOIN newlab lu ON a.u = lu.node JOIN newlab lv ON a.v = lv.node
        GROUP BY 1),
      qb AS (SELECT CAST(sum(deg_sum) AS BIGINT) AS twom,
                    CAST(sum(deg_sum) * sum(in_edges) - sum(deg_sum * deg_sum) AS BIGINT) AS q_before_num
             FROM cens_b),
      qa AS (SELECT CAST(sum(deg_sum) * sum(in_edges) - sum(deg_sum * deg_sum) AS BIGINT) AS q_after_num
             FROM cens_a)
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM moves) AS n_moved,
             qb.twom, qb.q_before_num, qa.q_after_num,
             qa.q_after_num > qb.q_before_num AS improved
      FROM qb CROSS JOIN qa""",

    // the fixpoint unroll: 4 sweeps computed unconditionally, then the
    // engine's stopping rule applied RELATIONALLY — sweep k is in the
    // trace iff every earlier sweep (1..k-1) moved something (running
    // min over the preceding n_moved, sweep 0 excluded by fiat), and
    // converged = some included sweep moved nothing
    "graph_louvain_converged" -> s"""
      WITH $louvainCtes,
      q0 AS (
        SELECT CAST(sum(deg_sum) * sum(in_edges) - sum(deg_sum * deg_sum) AS BIGINT) AS q
        FROM (SELECT lu.label AS community, CAST(count(*) AS BIGINT) AS deg_sum,
                     CAST(count(*) FILTER (WHERE lu.label = lv.label) AS BIGINT) AS in_edges
              FROM adj a JOIN l3 lu ON a.u = lu.node JOIN l3 lv ON a.v = lv.node
              GROUP BY 1)),
      ${(1 to 4).map(louvainSweep).mkString(",\n      ")},
      sweeps AS (
        SELECT 0 AS sweep, CAST(0 AS BIGINT) AS n_moved, (SELECT q FROM q0) AS q_num
        UNION ALL SELECT 1, (SELECT CAST(count(*) AS BIGINT) FROM moves1), (SELECT q FROM q1)
        UNION ALL SELECT 2, (SELECT CAST(count(*) AS BIGINT) FROM moves2), (SELECT q FROM q2)
        UNION ALL SELECT 3, (SELECT CAST(count(*) AS BIGINT) FROM moves3), (SELECT q FROM q3)
        UNION ALL SELECT 4, (SELECT CAST(count(*) AS BIGINT) FROM moves4), (SELECT q FROM q4)),
      filt AS (
        SELECT *, min(CASE WHEN sweep = 0 THEN NULL ELSE n_moved END)
          OVER (ORDER BY sweep ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_min
        FROM sweeps),
      inc AS (
        SELECT sweep, n_moved, q_num FROM filt
        WHERE sweep = 0 OR prev_min IS NULL OR prev_min > 0)
      SELECT CAST(sweep AS BIGINT) AS sweep, n_moved,
             (SELECT twom FROM twom) AS twom, q_num,
             (SELECT coalesce(bool_or(sweep > 0 AND n_moved = 0), FALSE) FROM inc) AS converged
      FROM inc ORDER BY sweep""",

    // level 1 = the converged unroll verbatim; contraction reads lab4
    // unconditionally (zero-move sweeps are fixpoints of the sweep
    // operator, so lab4 IS the terminal labeling whether the engine
    // exited early or not); level 2 = 4 weighted sweeps on the
    // contracted graph, the engine's stopping rule applied relationally
    // PER LEVEL
    "graph_louvain_two_level" -> s"""
      WITH $louvainCtes,
      q0 AS (
        SELECT CAST(sum(deg_sum) * sum(in_edges) - sum(deg_sum * deg_sum) AS BIGINT) AS q
        FROM (SELECT lu.label AS community, CAST(count(*) AS BIGINT) AS deg_sum,
                     CAST(count(*) FILTER (WHERE lu.label = lv.label) AS BIGINT) AS in_edges
              FROM adj a JOIN l3 lu ON a.u = lu.node JOIN l3 lv ON a.v = lv.node
              GROUP BY 1)),
      ${(1 to 4).map(louvainSweep).mkString(",\n      ")},
      cadj AS MATERIALIZED (
        SELECT lu.label AS u, lv.label AS v, CAST(count(*) AS BIGINT) AS w
        FROM adj a JOIN lab4 lu ON a.u = lu.node JOIN lab4 lv ON a.v = lv.node
        GROUP BY 1, 2),
      cdeg AS MATERIALIZED (
        SELECT u AS node, CAST(sum(w) AS BIGINT) AS deg FROM cadj GROUP BY 1),
      cl0 AS (SELECT node, node AS label FROM cdeg),
      cq0 AS (
        SELECT CAST(sum(deg_sum) * sum(in_w) - sum(deg_sum * deg_sum) AS BIGINT) AS q
        FROM (SELECT lu.label AS community, CAST(sum(a.w) AS BIGINT) AS deg_sum,
                     CAST(coalesce(sum(a.w) FILTER (WHERE lu.label = lv.label), 0) AS BIGINT) AS in_w
              FROM cadj a JOIN cl0 lu ON a.u = lu.node JOIN cl0 lv ON a.v = lv.node
              GROUP BY 1)),
      ${(1 to 4).map(louvainWeightedSweep).mkString(",\n      ")},
      sweeps AS (
        SELECT 1 AS level, 0 AS sweep, CAST(0 AS BIGINT) AS n_moved, (SELECT q FROM q0) AS q_num
        UNION ALL SELECT 1, 1, (SELECT CAST(count(*) AS BIGINT) FROM moves1), (SELECT q FROM q1)
        UNION ALL SELECT 1, 2, (SELECT CAST(count(*) AS BIGINT) FROM moves2), (SELECT q FROM q2)
        UNION ALL SELECT 1, 3, (SELECT CAST(count(*) AS BIGINT) FROM moves3), (SELECT q FROM q3)
        UNION ALL SELECT 1, 4, (SELECT CAST(count(*) AS BIGINT) FROM moves4), (SELECT q FROM q4)
        UNION ALL SELECT 2, 0, CAST(0 AS BIGINT), (SELECT q FROM cq0)
        UNION ALL SELECT 2, 1, (SELECT CAST(count(*) AS BIGINT) FROM cmoves1), (SELECT q FROM cq1)
        UNION ALL SELECT 2, 2, (SELECT CAST(count(*) AS BIGINT) FROM cmoves2), (SELECT q FROM cq2)
        UNION ALL SELECT 2, 3, (SELECT CAST(count(*) AS BIGINT) FROM cmoves3), (SELECT q FROM cq3)
        UNION ALL SELECT 2, 4, (SELECT CAST(count(*) AS BIGINT) FROM cmoves4), (SELECT q FROM cq4)),
      filt AS (
        SELECT *, min(CASE WHEN sweep = 0 THEN NULL ELSE n_moved END)
          OVER (PARTITION BY level ORDER BY sweep
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_min
        FROM sweeps),
      inc AS (
        SELECT level, sweep, n_moved, q_num FROM filt
        WHERE sweep = 0 OR prev_min IS NULL OR prev_min > 0)
      SELECT CAST(level AS BIGINT) AS level, CAST(sweep AS BIGINT) AS sweep, n_moved,
             (SELECT twom FROM twom) AS twom, q_num,
             coalesce(bool_or(sweep > 0 AND n_moved = 0)
               OVER (PARTITION BY level), FALSE) AS converged
      FROM inc ORDER BY level, sweep""",

    // full dendrogram: the two-level unroll continued — levels 3 and 4
    // are the SAME weighted-sweep chain on each further contraction
    // (prefixes d3/d4), computed unconditionally (contracted graphs are
    // community-sized) and then filtered by the ENGINE's stopping rule
    // applied relationally: a level's rows are included only if every
    // earlier contracted level moved at least once (zero moves = zero
    // Q gain exactly — the integer stopping rule), and within a level
    // the running prev_min rule keeps sweeps up to the first zero-move
    // one. Post-fixpoint sweep CTEs are provably no-ops (the labeling
    // is stationary), so the unconditional unroll costs nothing wrong.
    "graph_louvain_dendrogram" -> s"""
      WITH $louvainCtes,
      q0 AS (
        SELECT CAST(sum(deg_sum) * sum(in_edges) - sum(deg_sum * deg_sum) AS BIGINT) AS q
        FROM (SELECT lu.label AS community, CAST(count(*) AS BIGINT) AS deg_sum,
                     CAST(count(*) FILTER (WHERE lu.label = lv.label) AS BIGINT) AS in_edges
              FROM adj a JOIN l3 lu ON a.u = lu.node JOIN l3 lv ON a.v = lv.node
              GROUP BY 1)),
      ${(1 to 4).map(louvainSweep).mkString(",\n      ")},
      adjw AS (SELECT u, v, CAST(1 AS BIGINT) AS w FROM adj),
      ${louvainContractionCtes("c", "adjw", "lab4")},
      ${(1 to 4).map(r => louvainWeightedSweepP("c", r)).mkString(",\n      ")},
      ${louvainContractionCtes("d3", "cadj", "cl4")},
      ${(1 to 4).map(r => louvainWeightedSweepP("d3", r)).mkString(",\n      ")},
      ${louvainContractionCtes("d4", "d3adj", "d3l4")},
      ${(1 to 4).map(r => louvainWeightedSweepP("d4", r)).mkString(",\n      ")},
      sweeps AS (
        SELECT 1 AS level, 0 AS sweep, CAST(0 AS BIGINT) AS n_moved, (SELECT q FROM q0) AS q_num
        UNION ALL SELECT 1, 1, (SELECT CAST(count(*) AS BIGINT) FROM moves1), (SELECT q FROM q1)
        UNION ALL SELECT 1, 2, (SELECT CAST(count(*) AS BIGINT) FROM moves2), (SELECT q FROM q2)
        UNION ALL SELECT 1, 3, (SELECT CAST(count(*) AS BIGINT) FROM moves3), (SELECT q FROM q3)
        UNION ALL SELECT 1, 4, (SELECT CAST(count(*) AS BIGINT) FROM moves4), (SELECT q FROM q4)
        UNION ALL SELECT 2, 0, CAST(0 AS BIGINT), (SELECT q FROM cq0)
        UNION ALL SELECT 2, 1, (SELECT CAST(count(*) AS BIGINT) FROM cmoves1), (SELECT q FROM cq1)
        UNION ALL SELECT 2, 2, (SELECT CAST(count(*) AS BIGINT) FROM cmoves2), (SELECT q FROM cq2)
        UNION ALL SELECT 2, 3, (SELECT CAST(count(*) AS BIGINT) FROM cmoves3), (SELECT q FROM cq3)
        UNION ALL SELECT 2, 4, (SELECT CAST(count(*) AS BIGINT) FROM cmoves4), (SELECT q FROM cq4)
        UNION ALL SELECT 3, 0, CAST(0 AS BIGINT), (SELECT q FROM d3q0)
        UNION ALL SELECT 3, 1, (SELECT CAST(count(*) AS BIGINT) FROM d3moves1), (SELECT q FROM d3q1)
        UNION ALL SELECT 3, 2, (SELECT CAST(count(*) AS BIGINT) FROM d3moves2), (SELECT q FROM d3q2)
        UNION ALL SELECT 3, 3, (SELECT CAST(count(*) AS BIGINT) FROM d3moves3), (SELECT q FROM d3q3)
        UNION ALL SELECT 3, 4, (SELECT CAST(count(*) AS BIGINT) FROM d3moves4), (SELECT q FROM d3q4)
        UNION ALL SELECT 4, 0, CAST(0 AS BIGINT), (SELECT q FROM d4q0)
        UNION ALL SELECT 4, 1, (SELECT CAST(count(*) AS BIGINT) FROM d4moves1), (SELECT q FROM d4q1)
        UNION ALL SELECT 4, 2, (SELECT CAST(count(*) AS BIGINT) FROM d4moves2), (SELECT q FROM d4q2)
        UNION ALL SELECT 4, 3, (SELECT CAST(count(*) AS BIGINT) FROM d4moves3), (SELECT q FROM d4q3)
        UNION ALL SELECT 4, 4, (SELECT CAST(count(*) AS BIGINT) FROM d4moves4), (SELECT q FROM d4q4)),
      lvlmoves AS (
        SELECT level, CAST(sum(n_moved) AS BIGINT) AS mv FROM sweeps GROUP BY 1),
      filt AS (
        SELECT *, min(CASE WHEN sweep = 0 THEN NULL ELSE n_moved END)
          OVER (PARTITION BY level ORDER BY sweep
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_min
        FROM sweeps),
      inc AS (
        SELECT level, sweep, n_moved, q_num FROM filt
        WHERE (sweep = 0 OR prev_min IS NULL OR prev_min > 0)
          AND NOT EXISTS (
            SELECT 1 FROM lvlmoves m
            WHERE m.level > 1 AND m.level < filt.level AND m.mv = 0))
      SELECT CAST(level AS BIGINT) AS level, CAST(sweep AS BIGINT) AS sweep, n_moved,
             (SELECT twom FROM twom) AS twom, q_num,
             coalesce(bool_or(sweep > 0 AND n_moved = 0)
               OVER (PARTITION BY level), FALSE) AS converged
      FROM inc ORDER BY level, sweep""",

    // decompose chain re-derived, then exact n-scaled variance
    // numerators in HUGEINT; only the final ratio is float (round 6)
    "ts_seasonal_strength" -> """
      WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      t AS (
        SELECT day, cents,
               CASE WHEN count(*) OVER w = 7
                    THEN sum(cents) OVER w // 7 END AS trend_cents,
               CAST(date_part('isodow', day) - 1 AS INT) AS wd
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      d AS (SELECT *, cents - trend_cents AS detrended FROM t),
      sea AS (
        SELECT wd, CAST(sum(detrended) // count(*) AS BIGINT) AS seasonal_cents
        FROM d WHERE detrended IS NOT NULL GROUP BY 1),
      comp AS (
        SELECT d.detrended AS detr, d.detrended - sea.seasonal_cents AS res
        FROM d LEFT JOIN sea USING (wd) WHERE d.trend_cents IS NOT NULL),
      v AS (
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               count(*)::HUGEINT * sum(detr::HUGEINT * detr::HUGEINT)
                 - sum(detr::HUGEINT) * sum(detr::HUGEINT) AS vd,
               count(*)::HUGEINT * sum(res::HUGEINT * res::HUGEINT)
                 - sum(res::HUGEINT) * sum(res::HUGEINT) AS vr
        FROM comp)
      SELECT n_days,
             round(CAST(vr AS DOUBLE) / CAST(vd AS DOUBLE), 6) AS var_ratio,
             round(1.0 - CAST(vr AS DOUBLE) / CAST(vd AS DOUBLE), 6) AS strength
      FROM v""",

    // n²-scaled integer variance numerator — associative BIGINT sums,
    // full trailing windows only
    "ts_rolling_variance" -> """
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      w AS (
        SELECT day, cents,
               count(*) OVER w7 AS n7,
               CAST(sum(cents) OVER w7 AS BIGINT) AS sum7,
               CAST(sum(cents * cents) OVER w7 AS BIGINT) AS sumsq7
        FROM daily
        WINDOW w7 AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
      SELECT day, cents, sum7 // 7 AS mean7_cents,
             7 * sumsq7 - sum7 * sum7 AS var7_num
      FROM w WHERE n7 = 7 ORDER BY day""",

    // expectation recomputed from the construction rule: every 10th
    // order key is staged as a truncated JSON object
    "source_json_permissive" -> """
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count_if(o_orderkey % 10 = 0) AS BIGINT) AS n_corrupt,
             CAST(count_if(o_orderkey % 10 <> 0) AS BIGINT) AS n_good,
             CAST(sum(CASE WHEN o_orderkey % 10 <> 0
                      THEN CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) END) AS BIGINT) AS good_cents,
             max(CASE WHEN o_orderkey % 10 <> 0 THEN o_orderkey END) AS max_good_key
      FROM orders WHERE o_orderkey < 4000""",

    // exclusive-prefix byte sum per source; a doc belongs to the shard
    // its starting offset falls in (overfill-tolerant, both engines)
    "llm_shard_manifest" -> """
      WITH b AS (
        SELECT source, doc_id, CAST(strlen(text) AS BIGINT) AS bytes
        FROM documents),
      c AS (
        SELECT source, doc_id, bytes,
               coalesce(sum(bytes) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        FROM b)
      SELECT source, CAST(cum_before // 16384 AS BIGINT) AS shard,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(bytes) AS BIGINT) AS shard_bytes,
             min(doc_id) AS first_doc, max(doc_id) AS last_doc
      FROM c GROUP BY 1, 2 ORDER BY source, shard""",

    // same broadcast-argmax assignment mirror as llm_semdedup, then a
    // deterministic (count desc, label asc) majority per cell
    "llm_cluster_purity" -> s"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
      c AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 16),
      sc AS (SELECT e.vec_id, e.label, c.cell, list_dot_product(e.v, c.cv) AS d
             FROM e CROSS JOIN c),
      a AS (SELECT vec_id, label, cell FROM (
              SELECT vec_id, label, cell,
                     row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell) AS rk
              FROM sc) WHERE rk = 1),
      cen AS (SELECT cell, label, CAST(count(*) AS BIGINT) AS nl FROM a GROUP BY 1, 2),
      m AS (SELECT cell, label, nl,
                   row_number() OVER (PARTITION BY cell ORDER BY nl DESC, label) AS rk,
                   CAST(sum(nl) OVER (PARTITION BY cell) AS BIGINT) AS n_vecs
            FROM cen)
      SELECT cell, n_vecs, label AS majority_label, nl AS n_majority,
             ${N.ratio("nl", "n_vecs", 4)} AS purity
      FROM m WHERE rk = 1 ORDER BY cell""",

    // same two-blocking edge CTE as graph_components; exact integer
    // co-moments, the one sqrt left to the reader
    "graph_degree_mixing" -> """
      WITH docs AS (SELECT doc_id, source, lang, n_chars FROM documents WHERE doc_id < 1200),
      blocks AS (
        SELECT doc_id AS u, concat_ws('|', 's', source, CAST(n_chars // 100 AS VARCHAR)) AS bk FROM docs
        UNION ALL
        SELECT doc_id AS u, concat_ws('|', 'l', lang, CAST(n_chars // 50 AS VARCHAR)) AS bk FROM docs),
      edges0 AS (
        SELECT DISTINCT a.u AS u, b.u AS v
        FROM blocks a JOIN blocks b USING (bk) WHERE a.u < b.u),
      adj AS (SELECT u, v FROM edges0 UNION ALL SELECT v, u FROM edges0),
      deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY u)
      SELECT CAST(count(*) AS BIGINT) AS n_edges,
             CAST(sum(dx.deg) AS BIGINT) AS sum_x,
             CAST(sum(dy.deg) AS BIGINT) AS sum_y,
             CAST(sum(dx.deg * dy.deg) AS BIGINT) AS sum_xy,
             CAST(sum(dx.deg * dx.deg) AS BIGINT) AS sum_x2,
             CAST(sum(dy.deg * dy.deg) AS BIGINT) AS sum_y2
      FROM adj JOIN deg dx ON dx.u = adj.u JOIN deg dy ON dy.u = adj.v""",

    // transition-table + recursive pointer walk (the Viterbi form of
    // the sequential LTTB fold); identical BIGINT area arithmetic and
    // rank-encoded tiebreak
    "ts_lttb_downsample" -> """
      WITH RECURSIVE daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS v
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      d AS (SELECT day, v, row_number() OVER (ORDER BY day) AS i,
                   count(*) OVER () AS n
            FROM daily),
      pts AS (SELECT i, v, day, n,
                CASE WHEN i = 1 THEN CAST(0 AS BIGINT)
                     WHEN i = n THEN (n - 3) // 3 + 2
                     ELSE (i - 2) // 3 + 1 END AS b
              FROM d),
      kmax AS (SELECT max(b) - 1 AS K FROM pts),
      cent AS (SELECT b, CAST(sum(i) AS BIGINT) AS si, CAST(sum(v) AS BIGINT) AS sv,
                      CAST(count(*) AS BIGINT) AS m
               FROM pts GROUP BY b),
      trans AS (
        SELECT c.b AS k, p.i AS prev_i,
               max_by(c.i,
                 abs((c.i - p.i) * (nx.sv - nx.m * p.v) - (nx.si - nx.m * p.i) * (c.v - p.v))
                   * 100000 + (100000 - c.i)) AS sel_i
        FROM pts c
        JOIN pts p ON p.b = c.b - 1
        JOIN cent nx ON nx.b = c.b + 1
        WHERE c.b >= 1 AND c.b <= (SELECT K FROM kmax)
        GROUP BY c.b, p.i),
      walk(k, sel_i) AS (
        SELECT CAST(0 AS BIGINT), CAST(1 AS BIGINT)
        UNION ALL
        SELECT t.k, t.sel_i FROM walk w JOIN trans t ON t.k = w.k + 1 AND t.prev_i = w.sel_i
      )
      SELECT CAST(w.k AS BIGINT) AS k, p.i, p.day, p.v
      FROM walk w JOIN pts p ON p.i = w.sel_i
      UNION ALL
      SELECT CAST((SELECT max(b) FROM pts) AS BIGINT) AS k, i, day, v
      FROM pts WHERE i = n
      ORDER BY k""",

    // quota = B*n div N, leftovers to the largest remainders, nation-key
    // tiebreak — conserves B exactly in both engines
    "agg_largest_remainder" -> """
      WITH cnt AS (
        SELECT c.c_nationkey, n.n_name, CAST(count(*) AS BIGINT) AS n_cust
        FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1, 2),
      q AS (
        SELECT n_name, c_nationkey, n_cust,
               sum(n_cust) OVER () AS n_total,
               CAST(10000 * n_cust // sum(n_cust) OVER () AS BIGINT) AS quota
        FROM cnt),
      r AS (
        SELECT n_name, c_nationkey, n_cust, quota,
               CAST(10000 * n_cust - quota * n_total AS BIGINT) AS remainder,
               CAST(10000 - sum(quota) OVER () AS BIGINT) AS leftover,
               row_number() OVER (ORDER BY 10000 * n_cust - quota * n_total DESC, c_nationkey) AS rk
        FROM q)
      SELECT n_name, n_cust, quota, remainder,
             CAST(CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS extra,
             quota + CAST(CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS seats
      FROM r ORDER BY n_name""",

    // UTF8_LCASE modeled as lower() at every comparison point — the
    // collation's definition for the ASCII nation names; binary
    // distinctness and the case-insensitive contains probe stay inside
    // the lcase groups
    "fn_collation" -> """
      WITH mixed AS (
        SELECT n_name AS x FROM nation
        UNION ALL SELECT lower(n_name) FROM nation
        UNION ALL SELECT
          list_aggr(list_transform(string_split(lower(n_name), ' '),
            w -> upper(w[1]) || w[2:]), 'string_agg', ' ')
        FROM nation)
      SELECT lower(min(x)) AS name_lower,
             CAST(count(*) AS BIGINT) AS n_variants,
             CAST(count(DISTINCT x) AS BIGINT) AS n_distinct_binary,
             CAST(sum(CASE WHEN contains(lower(x), 'tion_1') THEN 1 ELSE 0 END) AS BIGINT)
               AS n_contains_probe
      FROM mixed GROUP BY lower(x) ORDER BY name_lower""",

    // same (ts, event_id) total order; the delete filter runs AFTER the
    // last-writer reduction so a tombstone only wins if truly last
    "stream_cdc_apply" -> """
      WITH c AS (
        SELECT user_id, event_type,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
               epoch_us(ts) AS us,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
               CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_changes
        FROM events)
      SELECT user_id, cents AS last_cents, us AS last_ts_us, n_changes
      FROM c WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id""",

    // the k<=4 truncation of the same 12-round h-index chain the
    // graph_core_full oracle unrolls (engine side shares
    // hIndexEstimates) — both engines histogram identical round-12
    // integers, converged or not
    "graph_core_decomposition" -> coreDecompSql,

    // Brandes from the %151 landmark sample, 4 forward sigma layers +
    // 3 backward dependency layers unrolled; the one ratio lands as the
    // per-term micro-floor div(sigma_v*(1e6+delta_w), sigma_w)
    "graph_betweenness_landmark" -> """
      WITH docs AS (SELECT doc_id, source, lang, n_chars FROM documents WHERE doc_id < 1200),
      blocks AS (
        SELECT doc_id AS u, concat_ws('|', 's', source, CAST(n_chars // 100 AS VARCHAR)) AS bk FROM docs
        UNION ALL
        SELECT doc_id AS u, concat_ws('|', 'l', lang, CAST(n_chars // 50 AS VARCHAR)) AS bk FROM docs),
      edges0 AS (
        SELECT DISTINCT a.u AS u, b.u AS v
        FROM blocks a JOIN blocks b USING (bk) WHERE a.u < b.u),
      adj AS MATERIALIZED (SELECT u, v FROM edges0 UNION ALL SELECT v, u FROM edges0),
      l0 AS (
        SELECT DISTINCT u AS node, u AS lmk, CAST(1 AS BIGINT) AS sigma
        FROM adj WHERE u % 151 = 0),
      l1 AS MATERIALIZED (
        SELECT a.v AS node, f.lmk, CAST(sum(f.sigma) AS BIGINT) AS sigma
        FROM adj a JOIN l0 f ON a.u = f.node
        WHERE NOT EXISTS (SELECT 1 FROM l0 r WHERE r.node = a.v AND r.lmk = f.lmk)
        GROUP BY 1, 2),
      l2 AS MATERIALIZED (
        SELECT a.v AS node, f.lmk, CAST(sum(f.sigma) AS BIGINT) AS sigma
        FROM adj a JOIN l1 f ON a.u = f.node
        WHERE NOT EXISTS (SELECT 1 FROM l0 r WHERE r.node = a.v AND r.lmk = f.lmk)
          AND NOT EXISTS (SELECT 1 FROM l1 r WHERE r.node = a.v AND r.lmk = f.lmk)
        GROUP BY 1, 2),
      l3 AS MATERIALIZED (
        SELECT a.v AS node, f.lmk, CAST(sum(f.sigma) AS BIGINT) AS sigma
        FROM adj a JOIN l2 f ON a.u = f.node
        WHERE NOT EXISTS (SELECT 1 FROM l0 r WHERE r.node = a.v AND r.lmk = f.lmk)
          AND NOT EXISTS (SELECT 1 FROM l1 r WHERE r.node = a.v AND r.lmk = f.lmk)
          AND NOT EXISTS (SELECT 1 FROM l2 r WHERE r.node = a.v AND r.lmk = f.lmk)
        GROUP BY 1, 2),
      l4 AS MATERIALIZED (
        SELECT a.v AS node, f.lmk, CAST(sum(f.sigma) AS BIGINT) AS sigma
        FROM adj a JOIN l3 f ON a.u = f.node
        WHERE NOT EXISTS (SELECT 1 FROM l0 r WHERE r.node = a.v AND r.lmk = f.lmk)
          AND NOT EXISTS (SELECT 1 FROM l1 r WHERE r.node = a.v AND r.lmk = f.lmk)
          AND NOT EXISTS (SELECT 1 FROM l2 r WHERE r.node = a.v AND r.lmk = f.lmk)
          AND NOT EXISTS (SELECT 1 FROM l3 r WHERE r.node = a.v AND r.lmk = f.lmk)
        GROUP BY 1, 2),
      d3 AS MATERIALIZED (
        SELECT c.node, c.lmk, CAST(coalesce(t.dm, 0) AS BIGINT) AS delta
        FROM l3 c LEFT JOIN (
          SELECT c.node, c.lmk,
                 sum((c.sigma * (1000000 + 0)) // w.sigma) AS dm
          FROM l3 c JOIN adj a ON a.u = c.node
          JOIN l4 w ON w.node = a.v AND w.lmk = c.lmk
          GROUP BY 1, 2) t ON t.node = c.node AND t.lmk = c.lmk),
      d2 AS MATERIALIZED (
        SELECT c.node, c.lmk, CAST(coalesce(t.dm, 0) AS BIGINT) AS delta
        FROM l2 c LEFT JOIN (
          SELECT c.node, c.lmk,
                 sum((c.sigma * (1000000 + w.delta)) // w.sigma) AS dm
          FROM l2 c JOIN adj a ON a.u = c.node
          JOIN (SELECT l3.node, l3.lmk, l3.sigma, d3.delta
                FROM l3 JOIN d3 ON d3.node = l3.node AND d3.lmk = l3.lmk) w
            ON w.node = a.v AND w.lmk = c.lmk
          GROUP BY 1, 2) t ON t.node = c.node AND t.lmk = c.lmk),
      d1 AS MATERIALIZED (
        SELECT c.node, c.lmk, CAST(coalesce(t.dm, 0) AS BIGINT) AS delta
        FROM l1 c LEFT JOIN (
          SELECT c.node, c.lmk,
                 sum((c.sigma * (1000000 + w.delta)) // w.sigma) AS dm
          FROM l1 c JOIN adj a ON a.u = c.node
          JOIN (SELECT l2.node, l2.lmk, l2.sigma, d2.delta
                FROM l2 JOIN d2 ON d2.node = l2.node AND d2.lmk = l2.lmk) w
            ON w.node = a.v AND w.lmk = c.lmk
          GROUP BY 1, 2) t ON t.node = c.node AND t.lmk = c.lmk),
      alldelta AS (
        SELECT node, lmk, delta FROM d1
        UNION ALL SELECT node, lmk, delta FROM d2
        UNION ALL SELECT node, lmk, delta FROM d3
        UNION ALL SELECT node, lmk, CAST(0 AS BIGINT) AS delta FROM l4)
      SELECT node, CAST(count(*) AS BIGINT) AS n_landmark_pairs,
             CAST(sum(delta) AS BIGINT) AS bt_micro
      FROM alldelta GROUP BY node
      ORDER BY bt_micro DESC, node LIMIT 25""",

    // brute-force all-pairs mirror — safe because the engine's 4x2-byte
    // band LSH is EXACT for the <=2-differing-blocks threshold
    // (pigeonhole: 2 diffs touch at most 2 bands, so 2 stay intact);
    // identical quantized-intensity arithmetic (ord == ascii)
    "mm_phash_dedup" -> """
      WITH d AS (
        SELECT doc_id, text, length(text) AS len FROM documents
        WHERE doc_id < 2000 AND length(text) >= 8),
      h AS (
        SELECT doc_id,
          (list_sum(list_transform(string_split(substr(text, 1 + (len * 0) // 8, (len * 1) // 8 - (len * 0) // 8), ''), c -> ord(c))) // 128) % 256 AS b0,
          (list_sum(list_transform(string_split(substr(text, 1 + (len * 1) // 8, (len * 2) // 8 - (len * 1) // 8), ''), c -> ord(c))) // 128) % 256 AS b1,
          (list_sum(list_transform(string_split(substr(text, 1 + (len * 2) // 8, (len * 3) // 8 - (len * 2) // 8), ''), c -> ord(c))) // 128) % 256 AS b2,
          (list_sum(list_transform(string_split(substr(text, 1 + (len * 3) // 8, (len * 4) // 8 - (len * 3) // 8), ''), c -> ord(c))) // 128) % 256 AS b3,
          (list_sum(list_transform(string_split(substr(text, 1 + (len * 4) // 8, (len * 5) // 8 - (len * 4) // 8), ''), c -> ord(c))) // 128) % 256 AS b4,
          (list_sum(list_transform(string_split(substr(text, 1 + (len * 5) // 8, (len * 6) // 8 - (len * 5) // 8), ''), c -> ord(c))) // 128) % 256 AS b5,
          (list_sum(list_transform(string_split(substr(text, 1 + (len * 6) // 8, (len * 7) // 8 - (len * 6) // 8), ''), c -> ord(c))) // 128) % 256 AS b6,
          (list_sum(list_transform(string_split(substr(text, 1 + (len * 7) // 8, (len * 8) // 8 - (len * 7) // 8), ''), c -> ord(c))) // 128) % 256 AS b7
        FROM d)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST((CASE WHEN a.b0 <> b.b0 THEN 1 ELSE 0 END) + (CASE WHEN a.b1 <> b.b1 THEN 1 ELSE 0 END) + (CASE WHEN a.b2 <> b.b2 THEN 1 ELSE 0 END) + (CASE WHEN a.b3 <> b.b3 THEN 1 ELSE 0 END) + (CASE WHEN a.b4 <> b.b4 THEN 1 ELSE 0 END) + (CASE WHEN a.b5 <> b.b5 THEN 1 ELSE 0 END) + (CASE WHEN a.b6 <> b.b6 THEN 1 ELSE 0 END) + (CASE WHEN a.b7 <> b.b7 THEN 1 ELSE 0 END) AS BIGINT) AS n_diff_blocks
      FROM h a JOIN h b ON a.doc_id < b.doc_id
      WHERE (CASE WHEN a.b0 <> b.b0 THEN 1 ELSE 0 END) + (CASE WHEN a.b1 <> b.b1 THEN 1 ELSE 0 END) + (CASE WHEN a.b2 <> b.b2 THEN 1 ELSE 0 END) + (CASE WHEN a.b3 <> b.b3 THEN 1 ELSE 0 END) + (CASE WHEN a.b4 <> b.b4 THEN 1 ELSE 0 END) + (CASE WHEN a.b5 <> b.b5 THEN 1 ELSE 0 END) + (CASE WHEN a.b6 <> b.b6 THEN 1 ELSE 0 END) + (CASE WHEN a.b7 <> b.b7 THEN 1 ELSE 0 END) <= 2
      ORDER BY n_diff_blocks, doc_a, doc_b LIMIT 100""",

    // identical integer recurrence; // truncates toward zero in DuckDB
    // exactly as Scala / does (probed: -7 // 2 = -3), so negative
    // innovations agree bit-for-bit
    // the same integer recurrence as the engine's sequential fold, as a
    // recursive CTE carrying the seven seasonal slots as columns; the
    // sequencing (l first, then b from the NEW l, then the slot from
    // the NEW l) is expressed by inlining the l-expression — // and
    // Scala / both truncate toward zero (probed: -7 // 2 = -3)
    "ts_holt_winters" -> {
      val sw = "(CASE (r.rn - 1) % 7 " +
        (0 until 7).map(k => s"WHEN $k THEN f.s$k").mkString(" ") + " END)"
      val lNew = s"(((r.cents - $sw) + f.l + f.b) // 2)"
      val sUpd = (0 until 7).map(k =>
        s"CASE WHEN (r.rn - 1) % 7 = $k THEN (f.s$k + (r.cents - $lNew)) // 2 ELSE f.s$k END")
        .mkString(",\n               ")
      s"""
      WITH RECURSIVE daily AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        FROM events WHERE user_id < 12 AND event_type = 'purchase' GROUP BY 1, 2),
      r AS (
        SELECT user_id, day, cents,
               row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
        FROM daily),
      f AS (
        SELECT user_id, day, cents, rn,
               CAST(0 AS BIGINT) AS innov, cents AS l, CAST(0 AS BIGINT) AS b,
               CAST(0 AS BIGINT) AS s0, CAST(0 AS BIGINT) AS s1, CAST(0 AS BIGINT) AS s2,
               CAST(0 AS BIGINT) AS s3, CAST(0 AS BIGINT) AS s4, CAST(0 AS BIGINT) AS s5,
               CAST(0 AS BIGINT) AS s6
        FROM r WHERE rn = 1
        UNION ALL
        SELECT r.user_id, r.day, r.cents, r.rn,
               r.cents - (f.l + f.b + $sw),
               $lNew,
               (f.b + ($lNew - f.l)) // 2,
               $sUpd
        FROM r JOIN f ON r.user_id = f.user_id AND r.rn = f.rn + 1)
      SELECT user_id, day, cents,
             CAST(innov AS DOUBLE) / 100 AS innovation,
             CAST(l AS DOUBLE) / 100 AS level,
             CAST(b AS DOUBLE) / 100 AS trend,
             CAST((CASE (rn - 1) % 7 ${(0 until 7).map(k => s"WHEN $k THEN s$k").mkString(" ")} END) AS DOUBLE) / 100 AS seasonal
      FROM f ORDER BY user_id, day"""
    },

    "ts_alpha_beta_filter" -> """
      WITH RECURSIVE daily AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        FROM events WHERE user_id < 12 AND event_type = 'purchase' GROUP BY 1, 2),
      r AS (
        SELECT user_id, day, cents,
               row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
        FROM daily),
      f AS (
        SELECT user_id, day, cents, rn,
               CAST(0 AS BIGINT) AS innov, cents AS l, CAST(0 AS BIGINT) AS b
        FROM r WHERE rn = 1
        UNION ALL
        SELECT r.user_id, r.day, r.cents, r.rn,
               r.cents - (f.l + f.b),
               (f.l + f.b) + (r.cents - (f.l + f.b)) // 2,
               f.b + (r.cents - (f.l + f.b)) // 4
        FROM r JOIN f ON r.user_id = f.user_id AND r.rn = f.rn + 1)
      SELECT user_id, day, cents,
             CAST(innov AS DOUBLE) / 100 AS innovation,
             CAST(l AS DOUBLE) / 100 AS level,
             CAST(b AS DOUBLE) / 100 AS trend
      FROM f ORDER BY user_id, day""",

    // identical integer steps: expected counts and per-cell terms are
    // floor divisions, so the chi-square units (and the critical-region
    // verdict) are exact in both engines
    "dq_chi_square" -> """
      WITH cells AS (
        SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n_obs
        FROM lineitem GROUP BY 1, 2),
      rt AS (SELECT l_returnflag, CAST(sum(n_obs) AS BIGINT) AS n_row FROM cells GROUP BY 1),
      ct AS (SELECT l_linestatus, CAST(sum(n_obs) AS BIGINT) AS n_col FROM cells GROUP BY 1),
      tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_total,
                     CAST(count(DISTINCT l_returnflag) AS BIGINT) AS nf,
                     CAST(count(DISTINCT l_linestatus) AS BIGINT) AS ns FROM cells),
      scored AS (
        SELECT c.l_returnflag, c.l_linestatus, c.n_obs, r.n_row, s.n_col, t.n_total,
               (r.n_row * s.n_col) // t.n_total AS e_cnt,
               ((c.n_obs - (r.n_row * s.n_col) // t.n_total) * (c.n_obs - (r.n_row * s.n_col) // t.n_total))
                 // greatest((r.n_row * s.n_col) // t.n_total, 1) AS term,
               (t.nf - 1) * (t.ns - 1) AS df
        FROM cells c JOIN rt r USING (l_returnflag) JOIN ct s USING (l_linestatus), tot t),
      chi AS (SELECT CAST(sum(term) AS BIGINT) AS chi2_units, max(df) AS df FROM scored)
      SELECT sc.l_returnflag, sc.l_linestatus, sc.n_obs, sc.n_row, sc.n_col,
             sc.n_total, sc.e_cnt, sc.term, ch.chi2_units, ch.df,
             ch.chi2_units >= (CASE WHEN ch.df = 1 THEN 4 WHEN ch.df = 2 THEN 6 ELSE 8 END) AS dependent
      FROM scored sc, chi ch ORDER BY sc.l_returnflag, sc.l_linestatus""",

    // the supremum and its arg-value live in exact integer numerators
    // over the common nA*nB denominator; the verdict's sqrt expression
    // is sequenced identically in both engines (sqrt is correctly
    // rounded IEEE everywhere), so the boolean is bit-stable
    "dq_ks_test" -> s"""
      WITH per AS (
        SELECT v, CAST(sum(isa) AS BIGINT) AS na,
               CAST(count(*) - sum(isa) AS BIGINT) AS nb
        FROM (
          SELECT CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS v, 1 AS isa FROM customer
          UNION ALL
          SELECT CAST(CAST(s_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS v, 0 AS isa FROM supplier)
        GROUP BY v),
      tot AS (SELECT CAST(sum(na) AS BIGINT) AS n_a, CAST(sum(nb) AS BIGINT) AS n_b FROM per),
      cum AS (
        SELECT v,
               CAST(sum(na) OVER (ORDER BY v) AS BIGINT) AS ca,
               CAST(sum(nb) OVER (ORDER BY v) AS BIGINT) AS cb
        FROM per),
      d AS (SELECT v, abs(ca * t.n_b - cb * t.n_a) AS dn FROM cum, tot t),
      m AS (SELECT max(dn) AS d_num FROM d),
      vat AS (SELECT min(v) AS v_at_cents FROM d, m WHERE d.dn = m.d_num)
      SELECT t.n_a, t.n_b, m.d_num, vat.v_at_cents,
             ${N.ratio("m.d_num", "t.n_a * t.n_b", 6)} AS d_stat,
             CAST(m.d_num AS DOUBLE) / CAST(t.n_a * t.n_b AS DOUBLE) >
               1.358 * sqrt(CAST(t.n_a + t.n_b AS DOUBLE) / CAST(t.n_a * t.n_b AS DOUBLE)) AS reject_05
      FROM tot t, m, vat""",

    // doubled midranks keep tie handling in pure integers; the
    // normal-approximation verdict is the same denominator-cleared
    // HUGEINT inequality pattern as event_ab_test
    "dq_mann_whitney" -> """
      WITH per AS (
        SELECT v, CAST(sum(isa) AS BIGINT) AS na,
               CAST(count(*) - sum(isa) AS BIGINT) AS nb
        FROM (
          SELECT CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS v, 1 AS isa FROM customer
          UNION ALL
          SELECT CAST(CAST(s_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS v, 0 AS isa FROM supplier)
        GROUP BY v),
      tot AS (SELECT CAST(sum(na) AS BIGINT) AS n_a, CAST(sum(nb) AS BIGINT) AS n_b FROM per),
      ranked AS (
        SELECT na,
               2 * coalesce(CAST(sum(na + nb) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
                 + na + nb + 1 AS mr2
        FROM per),
      agg AS (
        SELECT t.n_a, t.n_b, CAST(sum(na * mr2) AS BIGINT) AS r2_a
        FROM ranked, tot t GROUP BY 1, 2),
      u AS (SELECT n_a, n_b, r2_a, r2_a - n_a * (n_a + 1) AS u2_a FROM agg)
      SELECT n_a, n_b, r2_a, u2_a,
             2 * n_a * n_b - u2_a AS u2_b,
             (CAST(u2_a AS HUGEINT) - CAST(n_a AS HUGEINT) * n_b) *
             (CAST(u2_a AS HUGEINT) - CAST(n_a AS HUGEINT) * n_b) * 3 * 10000 >
             38416 * CAST(n_a AS HUGEINT) * n_b *
             (CAST(n_a AS HUGEINT) + n_b + 1) AS significant_05
      FROM u""",

    // the z-test inequality is denominator-cleared to pure HUGEINT
    // arithmetic (DECIMAL(38,0) on the Spark side) — no sqrt, no float
    "event_ab_test" -> s"""
      WITH exposed AS (
        SELECT user_id, min(ts) AS v_ts FROM events
        WHERE event_type = 'view' GROUP BY 1),
      conv AS (
        SELECT e.user_id FROM events e
        JOIN exposed x ON e.user_id = x.user_id AND e.ts >= x.v_ts
        WHERE e.event_type = 'purchase' GROUP BY e.user_id),
      census AS (
        SELECT x.user_id % 2 AS variant,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(count(c.user_id) AS BIGINT) AS n_converted
        FROM exposed x LEFT JOIN conv c ON x.user_id = c.user_id
        GROUP BY 1),
      wide AS (
        SELECT CAST(max(CASE WHEN variant = 0 THEN n_users END) AS BIGINT) AS n_a,
               CAST(max(CASE WHEN variant = 0 THEN n_converted END) AS BIGINT) AS c_a,
               CAST(max(CASE WHEN variant = 1 THEN n_users END) AS BIGINT) AS n_b,
               CAST(max(CASE WHEN variant = 1 THEN n_converted END) AS BIGINT) AS c_b
        FROM census)
      SELECT n_a, c_a, n_b, c_b,
             ${N.ratio("c_a", "n_a", 6)} AS rate_a,
             ${N.ratio("c_b", "n_b", 6)} AS rate_b,
             (CAST(c_a AS HUGEINT) * n_b - CAST(c_b AS HUGEINT) * n_a) *
             (CAST(c_a AS HUGEINT) * n_b - CAST(c_b AS HUGEINT) * n_a) *
             (CAST(n_a AS HUGEINT) + n_b) * 10000 >
             38416 * CAST(n_a AS HUGEINT) * n_b *
             (CAST(c_a AS HUGEINT) + c_b) *
             ((CAST(n_a AS HUGEINT) + n_b) - (CAST(c_a AS HUGEINT) + c_b))
               AS significant_05
      FROM wide""",

    // per-user firsts are keyed min-aggregates; the decile table runs
    // on the aggregated user dimension under the same deterministic
    // (lag, user) total order as the Spark ntile
    "event_conversion_lag" -> s"""
      WITH fc AS (
        SELECT user_id, min(ts) AS c_ts FROM events
        WHERE event_type = 'click' GROUP BY 1),
      conv AS (
        SELECT e.user_id,
               (epoch_us(min(e.ts)) - epoch_us(min(fc.c_ts))) // 1000000 AS lag_s
        FROM events e JOIN fc ON e.user_id = fc.user_id AND e.ts >= fc.c_ts
        WHERE e.event_type = 'purchase'
        GROUP BY e.user_id),
      tot AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM fc) AS n_clickers,
                     (SELECT CAST(count(*) AS BIGINT) FROM conv) AS n_converted),
      dec AS (SELECT user_id, lag_s,
                     CAST(ntile(10) OVER (ORDER BY lag_s, user_id) AS INT) AS decile
              FROM conv)
      SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
             CAST(min(lag_s) AS BIGINT) AS min_lag_s,
             CAST(max(lag_s) AS BIGINT) AS max_lag_s,
             ${N.avgInt("lag_s", 2)} AS avg_lag_s,
             ${N.ratio("t.n_converted", "t.n_clickers", 6)} AS convert_share
      FROM dec, tot t GROUP BY decile, t.n_converted, t.n_clickers
      ORDER BY decile""",

    // identical integer numerators per lag; DuckDB widens sum(BIGINT)
    // to HUGEINT so every product is cast back explicitly
    "ts_lead_lag" -> """
      WITH daily AS (
        SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i, x, y FROM (
          SELECT CAST(ts AS DATE) AS day,
                 CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS x,
                 CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS y
          FROM events GROUP BY 1)),
      lagged AS (
        SELECT l.lag, a.x, b.y
        FROM daily a, (SELECT unnest(range(-7, 8)) AS lag) l
        JOIN daily b ON b.i = a.i + l.lag)
      SELECT CAST(lag AS INT) AS lag, CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(count(*) * sum(CAST(x AS HUGEINT) * y) - sum(CAST(x AS HUGEINT)) * sum(CAST(y AS HUGEINT)) AS BIGINT) AS sxy_num,
             CAST(count(*) * sum(CAST(x AS HUGEINT) * x) - sum(CAST(x AS HUGEINT)) * sum(CAST(x AS HUGEINT)) AS BIGINT) AS sxx_num,
             CAST(count(*) * sum(CAST(y AS HUGEINT) * y) - sum(CAST(y AS HUGEINT)) * sum(CAST(y AS HUGEINT)) AS BIGINT) AS syy_num
      FROM lagged GROUP BY 1 ORDER BY lag""",

    // the sequential DP solved RELATIONALLY: anti-diagonal recursion —
    // cells at level d = i + j depend only on levels d-1 and d-2, so
    // the recursive term computes level d+1 and carries level d forward
    // one step (each iteration's working set holds exactly two levels);
    // all-integer costs make the two engines' answers bit-identical
    "ts_dtw_band" -> """
      WITH RECURSIVE s AS (
        SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i, x, y FROM (
          SELECT CAST(ts AS DATE) AS day,
                 CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS x,
                 CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS y
          FROM events GROUP BY 1)),
      nn AS (SELECT max(i) AS n FROM s),
      dp(d, i, cost, lvl) AS (
        SELECT CAST(2 AS BIGINT), CAST(1 AS BIGINT),
               CAST(abs(x - y) AS BIGINT), CAST(2 AS BIGINT)
        FROM s WHERE i = 1
        UNION ALL
        SELECT * FROM (
          WITH cur AS (SELECT * FROM dp),
          mx AS (SELECT max(d) AS d FROM cur)
          SELECT mx.d + 1 AS d, c.i AS i,
                 CAST(abs(sx.x - sy.y) AS BIGINT) + least(
                   coalesce((SELECT cost FROM cur p WHERE p.lvl = mx.d AND p.i = c.i - 1), 1000000000000000),
                   coalesce((SELECT cost FROM cur p WHERE p.lvl = mx.d AND p.i = c.i), 1000000000000000),
                   coalesce((SELECT cost FROM cur p WHERE p.lvl = mx.d - 1 AND p.i = c.i - 1), 1000000000000000)
                 ) AS cost, mx.d + 1 AS lvl
          FROM mx, nn, s c, s sx, s sy
          WHERE sx.i = c.i AND sy.i = mx.d + 1 - c.i
            AND abs(c.i - (mx.d + 1 - c.i)) <= 3
            AND mx.d + 1 - c.i BETWEEN 1 AND nn.n
          UNION ALL
          SELECT mx.d + 1 AS d, cur.i, cur.cost, cur.lvl
          FROM cur, mx, nn WHERE cur.lvl = mx.d AND mx.d < 2 * nn.n
        ) q WHERE q.d <= 2 * (SELECT n FROM nn)
      )
      SELECT nn.n AS n_days,
             (SELECT CAST(sum(abs(x - y)) AS BIGINT) FROM s) AS l1_same_day,
             (SELECT cost FROM dp, nn x WHERE dp.lvl = 2 * x.n AND dp.i = x.n LIMIT 1) AS dtw_band
      FROM nn""",

    // the band DP's anti-diagonal recursion (identical to ts_dtw_band)
    // MATERIALIZED into the full cell table, then a second recursive
    // CTE backtracks from (n,n) with the fixed diagonal ≻ up ≻ left
    // tie-break — the same deterministic predecessor choice the Spark
    // side's in-memory backtrack applies, so the two engines emit the
    // identical alignment path cell-for-cell
    "ts_dtw_path" -> """
      WITH RECURSIVE s AS (
        SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i, x, y FROM (
          SELECT CAST(ts AS DATE) AS day,
                 CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS x,
                 CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS y
          FROM events GROUP BY 1)),
      nn AS (SELECT max(i) AS n FROM s),
      dp(d, i, cost, lvl) AS (
        SELECT CAST(2 AS BIGINT), CAST(1 AS BIGINT),
               CAST(abs(x - y) AS BIGINT), CAST(2 AS BIGINT)
        FROM s WHERE i = 1
        UNION ALL
        SELECT * FROM (
          WITH cur AS (SELECT * FROM dp),
          mx AS (SELECT max(d) AS d FROM cur)
          SELECT mx.d + 1 AS d, c.i AS i,
                 CAST(abs(sx.x - sy.y) AS BIGINT) + least(
                   coalesce((SELECT cost FROM cur p WHERE p.lvl = mx.d AND p.i = c.i - 1), 1000000000000000),
                   coalesce((SELECT cost FROM cur p WHERE p.lvl = mx.d AND p.i = c.i), 1000000000000000),
                   coalesce((SELECT cost FROM cur p WHERE p.lvl = mx.d - 1 AND p.i = c.i - 1), 1000000000000000)
                 ) AS cost, mx.d + 1 AS lvl
          FROM mx, nn, s c, s sx, s sy
          WHERE sx.i = c.i AND sy.i = mx.d + 1 - c.i
            AND abs(c.i - (mx.d + 1 - c.i)) <= 3
            AND mx.d + 1 - c.i BETWEEN 1 AND nn.n
          UNION ALL
          SELECT mx.d + 1 AS d, cur.i, cur.cost, cur.lvl
          FROM cur, mx, nn WHERE cur.lvl = mx.d AND mx.d < 2 * nn.n
        ) q WHERE q.d <= 2 * (SELECT n FROM nn)
      ),
      cells AS MATERIALIZED (
        SELECT DISTINCT i, lvl - i AS j, cost FROM dp),
      bt(k, i, j) AS (
        SELECT CAST(0 AS BIGINT) AS k, x.n AS i, x.n AS j FROM nn x
        UNION ALL
        SELECT k + 1,
               CASE WHEN dg <= up AND dg <= lf THEN i - 1
                    WHEN up <= lf THEN i - 1
                    ELSE i END,
               CASE WHEN dg <= up AND dg <= lf THEN j - 1
                    WHEN up <= lf THEN j
                    ELSE j - 1 END
        FROM (
          -- LEFT JOINs, not correlated scalar subqueries: inside a
          -- recursive term DuckDB 1.0 silently yields NULL for a
          -- scalar subquery over a CTE derived from ANOTHER recursive
          -- CTE (probed; plain joins resolve correctly)
          SELECT t.k, t.i, t.j,
                 coalesce(dgc.cost, 1000000000000000) AS dg,
                 coalesce(upc.cost, 1000000000000000) AS up,
                 coalesce(lfc.cost, 1000000000000000) AS lf
          FROM bt t
          LEFT JOIN cells dgc ON dgc.i = t.i - 1 AND dgc.j = t.j - 1
          LEFT JOIN cells upc ON upc.i = t.i - 1 AND upc.j = t.j
          LEFT JOIN cells lfc ON lfc.i = t.i AND lfc.j = t.j - 1
          WHERE t.i > 1 OR t.j > 1))
      SELECT CAST((SELECT max(k) FROM bt) - t.k AS BIGINT) AS k,
             CAST(t.i AS BIGINT) AS i, CAST(t.j AS BIGINT) AS j,
             CAST(abs(sx.x - sy.y) AS BIGINT) AS cell_cost,
             CAST(c.cost AS BIGINT) AS path_cost
      FROM bt t, s sx, s sy, cells c
      WHERE sx.i = t.i AND sy.i = t.j AND c.i = t.i AND c.j = t.j
      ORDER BY k""",

    // the band test is the denominator-cleared integer comparison
    // (n*x - S)^2 > 4*(n*Q - S^2) in HUGEINT (DECIMAL(38,0) on the
    // Spark side) — no mean, no sigma, no float
    "ts_bollinger_breakout" -> """
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      w AS (
        SELECT day, cents,
               CAST(count(*) OVER win AS BIGINT) AS n_win,
               CAST(sum(cents) OVER win AS BIGINT) AS sum_w,
               sum(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) OVER win AS sumsq_w
        FROM daily
        WINDOW win AS (ORDER BY day ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
      SELECT day, cents, (sum_w // n_win) AS mean20_cents,
             (CAST(n_win AS HUGEINT) * cents - sum_w) > 0 AND
               (CAST(n_win AS HUGEINT) * cents - sum_w) * (CAST(n_win AS HUGEINT) * cents - sum_w)
                 > 4 * (CAST(n_win AS HUGEINT) * sumsq_w - CAST(sum_w AS HUGEINT) * sum_w) AS breakout_hi,
             (CAST(n_win AS HUGEINT) * cents - sum_w) < 0 AND
               (CAST(n_win AS HUGEINT) * cents - sum_w) * (CAST(n_win AS HUGEINT) * cents - sum_w)
                 > 4 * (CAST(n_win AS HUGEINT) * sumsq_w - CAST(sum_w AS HUGEINT) * sum_w) AS breakout_lo
      FROM w WHERE n_win = 20 ORDER BY day""",

    // concat-then-cut packing: shard = exclusive running bytes // budget
    // — the identical window in both engines; octet_length(encode())
    // mirrors Spark's octet_length over the utf-8 binary cast
    "mm_shard_pack" -> """
      WITH d AS (
        SELECT doc_id, source,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        FROM documents WHERE doc_id < 2000),
      cum AS (
        SELECT doc_id, source, n_bytes,
               coalesce(CAST(sum(n_bytes) OVER (
                 PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) // 65536 AS shard_id
        FROM d)
      SELECT source, shard_id, CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(n_bytes) AS BIGINT) AS shard_bytes,
             CAST(min(doc_id) AS BIGINT) AS min_doc,
             CAST(max(doc_id) AS BIGINT) AS max_doc
      FROM cum GROUP BY 1, 2 ORDER BY source, shard_id""",

    // unnormalized integer HITS: four join+sum half-steps over the
    // canonical directed edge set — identical integer values, so the
    // (authority, hub, node) order agrees bit-for-bit
    "graph_hits" -> """
      WITH docs AS (SELECT doc_id, source, lang, n_chars FROM documents WHERE doc_id < 1200),
      blocks AS (
        SELECT doc_id AS u, concat_ws('|', 's', source, CAST(n_chars // 100 AS VARCHAR)) AS bk FROM docs
        UNION ALL
        SELECT doc_id AS u, concat_ws('|', 'l', lang, CAST(n_chars // 50 AS VARCHAR)) AS bk FROM docs),
      edges AS (
        SELECT DISTINCT a.u AS u, b.u AS v
        FROM blocks a JOIN blocks b USING (bk) WHERE a.u < b.u),
      nodes AS (SELECT DISTINCT node FROM (
        SELECT u AS node FROM edges UNION ALL SELECT v FROM edges)),
      a1 AS (SELECT v, CAST(count(*) AS BIGINT) AS a FROM edges GROUP BY 1),
      h1 AS (SELECT u, CAST(sum(a) AS BIGINT) AS h FROM edges JOIN a1 USING (v) GROUP BY 1),
      a2 AS (SELECT v, CAST(sum(h) AS BIGINT) AS a FROM edges JOIN h1 USING (u) GROUP BY 1),
      h2 AS (SELECT u, CAST(sum(a) AS BIGINT) AS h FROM edges JOIN a2 USING (v) GROUP BY 1)
      SELECT n.node, coalesce(a2.a, 0) AS authority, coalesce(h2.h, 0) AS hub
      FROM nodes n LEFT JOIN a2 ON n.node = a2.v LEFT JOIN h2 ON n.node = h2.u
      ORDER BY authority DESC, hub DESC, n.node LIMIT 25""",

    // md5 as the seeded RNG: both engines hash the identical
    // walker:step:neighbor string, so the argmin walk is bit-identical;
    // the v tiebreak covers the (never-observed) equal-hash case
    "graph_random_walk" -> randomWalkSql,

    // the skip-gram (center, context) pair census over the SAME walks
    // — the DeepWalk training corpus itself (word2vec window ±2 over
    // each walk "sentence"); walker-keyed self-join over <=5-row walks
    "graph_walk_skipgram" -> walkSkipgramSql,

    // the p/q-biased (second-order) walk: each step re-weights the
    // candidate neighborhood by distance from the PREVIOUS node
    // (return 1, common-neighbor 4, distance-2 2 — the ×4-scaled
    // integers for p=4, q=2), then picks by exact integer inverse-CDF:
    // one md5 draw mod the total weight, first candidate in node order
    // whose cumulative weight exceeds it. Identical windows + integer
    // arithmetic on both engines → bit-identical walks.
    "graph_node2vec_biased" -> node2vecBiasedSql,

    // the node2vec training corpus proper: the same ±2-window skip-gram
    // pair census, over the BIASED walks
    "graph_node2vec_skipgram" -> node2vecSkipgramSql,

    // 4 unrolled multi-source BFS rounds (per (node, landmark) min),
    // then the integer harmonic fold — the same bounded-round
    // convention as graph_bfs_hops
    "graph_landmark_distance" -> """
      WITH docs AS (SELECT doc_id, source, lang, n_chars FROM documents WHERE doc_id < 1200),
      blocks AS (
        SELECT doc_id AS u, concat_ws('|', 's', source, CAST(n_chars // 100 AS VARCHAR)) AS bk FROM docs
        UNION ALL
        SELECT doc_id AS u, concat_ws('|', 'l', lang, CAST(n_chars // 50 AS VARCHAR)) AS bk FROM docs),
      edges AS (
        SELECT DISTINCT a.u AS u, b.u AS v
        FROM blocks a JOIN blocks b USING (bk) WHERE a.u < b.u),
      adj AS (SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges),
      nodes AS (SELECT DISTINCT u AS node FROM adj),
      r0 AS (SELECT node, node AS lm, CAST(0 AS BIGINT) AS dist FROM nodes WHERE node % 151 = 0),
      r1 AS (SELECT node, lm, min(dist) AS dist FROM (
        SELECT node, lm, dist FROM r0
        UNION ALL SELECT a.v AS node, r.lm, r.dist + 1 AS dist FROM adj a JOIN r0 r ON a.u = r.node) GROUP BY 1, 2),
      r2 AS (SELECT node, lm, min(dist) AS dist FROM (
        SELECT node, lm, dist FROM r1
        UNION ALL SELECT a.v AS node, r.lm, r.dist + 1 AS dist FROM adj a JOIN r1 r ON a.u = r.node) GROUP BY 1, 2),
      r3 AS (SELECT node, lm, min(dist) AS dist FROM (
        SELECT node, lm, dist FROM r2
        UNION ALL SELECT a.v AS node, r.lm, r.dist + 1 AS dist FROM adj a JOIN r2 r ON a.u = r.node) GROUP BY 1, 2),
      r4 AS (SELECT node, lm, min(dist) AS dist FROM (
        SELECT node, lm, dist FROM r3
        UNION ALL SELECT a.v AS node, r.lm, r.dist + 1 AS dist FROM adj a JOIN r3 r ON a.u = r.node) GROUP BY 1, 2)
      SELECT node, CAST(count(*) AS BIGINT) AS n_reached,
             CAST(sum(1000000 // dist) AS BIGINT) AS closeness_micro
      FROM r4 WHERE dist > 0 GROUP BY 1
      ORDER BY closeness_micro DESC, node LIMIT 25""",

    "graph_clustering_coeff" -> """
      WITH docs AS (SELECT doc_id, source, lang, n_chars FROM documents WHERE doc_id < 1200),
      blocks AS (
        SELECT doc_id AS u, concat_ws('|', 's', source, CAST(n_chars // 100 AS VARCHAR)) AS bk FROM docs
        UNION ALL
        SELECT doc_id AS u, concat_ws('|', 'l', lang, CAST(n_chars // 50 AS VARCHAR)) AS bk FROM docs),
      edges AS (
        SELECT DISTINCT a.u AS u, b.u AS v
        FROM blocks a JOIN blocks b USING (bk) WHERE a.u < b.u),
      adj AS (SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges),
      deg AS (SELECT u AS node, count(*) AS deg FROM adj GROUP BY u),
      wedges AS (SELECT a.u AS x, a.v AS y, b.v AS z FROM edges a JOIN edges b ON a.v = b.u),
      tri AS (SELECT x, y, z FROM wedges w JOIN edges c ON w.x = c.u AND w.z = c.v),
      corners AS (
        SELECT x AS node FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri),
      tpn AS (SELECT node, count(*) AS n_triangles FROM corners GROUP BY node)
      SELECT d.node, d.deg, CAST(coalesce(t.n_triangles, 0) AS BIGINT) AS n_triangles,
             CAST((coalesce(t.n_triangles, 0) * 2000000) // (d.deg * (d.deg - 1)) AS BIGINT) AS cc_micro
      FROM deg d LEFT JOIN tpn t USING (node) WHERE d.deg >= 2
      ORDER BY cc_micro DESC, deg DESC, node LIMIT 25""",

    "graph_adamic_adar" -> """
      WITH docs AS (SELECT doc_id, source, lang, n_chars FROM documents WHERE doc_id < 1200),
      blocks AS (
        SELECT doc_id AS u, concat_ws('|', 's', source, CAST(n_chars // 100 AS VARCHAR)) AS bk FROM docs
        UNION ALL
        SELECT doc_id AS u, concat_ws('|', 'l', lang, CAST(n_chars // 50 AS VARCHAR)) AS bk FROM docs),
      edges AS (
        SELECT DISTINCT a.u AS u, b.u AS v
        FROM blocks a JOIN blocks b USING (bk) WHERE a.u < b.u),
      adj AS (SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges),
      deg AS (SELECT u AS w, count(*) AS deg FROM adj GROUP BY u),
      cand AS (SELECT a.u AS w, a.v AS x, b.v AS z
               FROM adj a JOIN adj b ON a.u = b.u WHERE a.v < b.v),
      scored AS (
        SELECT x, z, count(*) AS n_common,
               CAST(sum(CAST(floor(1000000.0 / ln(d.deg)) AS BIGINT)) AS BIGINT) AS aa_micro
        FROM cand JOIN deg d ON d.w = cand.w GROUP BY x, z)
      SELECT s.x, s.z, s.n_common, s.aa_micro
      FROM scored s LEFT JOIN edges e ON s.x = e.u AND s.z = e.v
      WHERE e.u IS NULL
      ORDER BY aa_micro DESC, x, z LIMIT 25""",

    "graph_ppr" -> """
      WITH docs AS (
        SELECT doc_id AS node, source, n_chars // 100 AS blk
        FROM documents WHERE doc_id < 1200),
      edges AS (
        SELECT a.node AS u, b.node AS v
        FROM docs a JOIN docs b USING (source, blk)
        WHERE a.node <> b.node),
      deg AS (SELECT u, count(*) AS deg FROM edges GROUP BY u),
      r0 AS (SELECT node, CASE WHEN node % 101 = 0 THEN CAST(1000000 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS r FROM docs),
      c1 AS (SELECT e.v AS node, CAST(sum(r.r // d.deg) AS BIGINT) AS sc
             FROM edges e JOIN r0 r ON r.node = e.u JOIN deg d ON d.u = e.u GROUP BY e.v),
      r1 AS (SELECT docs.node, CAST((CASE WHEN docs.node % 101 = 0 THEN 150000 ELSE 0 END) + (850 * coalesce(c1.sc, 0)) // 1000 AS BIGINT) AS r
             FROM docs LEFT JOIN c1 ON c1.node = docs.node),
      c2 AS (SELECT e.v AS node, CAST(sum(r.r // d.deg) AS BIGINT) AS sc
             FROM edges e JOIN r1 r ON r.node = e.u JOIN deg d ON d.u = e.u GROUP BY e.v),
      r2 AS (SELECT docs.node, CAST((CASE WHEN docs.node % 101 = 0 THEN 150000 ELSE 0 END) + (850 * coalesce(c2.sc, 0)) // 1000 AS BIGINT) AS r
             FROM docs LEFT JOIN c2 ON c2.node = docs.node),
      c3 AS (SELECT e.v AS node, CAST(sum(r.r // d.deg) AS BIGINT) AS sc
             FROM edges e JOIN r2 r ON r.node = e.u JOIN deg d ON d.u = e.u GROUP BY e.v),
      r3 AS (SELECT docs.node, CAST((CASE WHEN docs.node % 101 = 0 THEN 150000 ELSE 0 END) + (850 * coalesce(c3.sc, 0)) // 1000 AS BIGINT) AS r
             FROM docs LEFT JOIN c3 ON c3.node = docs.node)
      SELECT r3.node, r3.node % 101 = 0 AS is_seed,
             coalesce(deg.deg, 0) AS n_neighbors, r3.r AS ppr_micro
      FROM r3 LEFT JOIN deg ON deg.u = r3.node
      WHERE r3.r > 0
      ORDER BY ppr_micro DESC, node LIMIT 25""",

    // Product quantization: per-subspace codebooks by the kmeans-oracle
    // pattern (quantized integer coordinates, exact integer distances,
    // (d2, cid) argmin, floor-averaged updates, 2 unrolled Lloyd
    // rounds), then ADC = per-probe 4×8 lookup table summed over the
    // encoded corpus — all BIGINT, value-for-value with the Spark path.
    "llm_sim_pq_topk" -> s"""
      WITH $pqAdcCtes
      SELECT pid, nid, adc_d2, CAST(rn AS BIGINT) AS rnk FROM (
        SELECT pid, nid, adc_d2,
               row_number() OVER (PARTITION BY pid ORDER BY adc_d2, nid) AS rn
        FROM adc) WHERE rn <= 5
      ORDER BY pid, rnk""",

    // PQ end-quality: the ADC top-5 graded against the brute-force
    // COSINE truth — the compression-loss readout (IVF's recall rows
    // measure cell pruning; this measures the quantizer itself)
    "llm_sim_pq_recall" -> s"""
      WITH $pqAdcCtes,
      pq AS (
        SELECT pid, nid FROM (
          SELECT pid, nid, row_number() OVER (PARTITION BY pid ORDER BY adc_d2, nid) AS rn
          FROM adc) WHERE rn <= 5),
      nrm2 AS (
        SELECT vec_id, embedding,
               sqrt((SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                     FROM unnest(embedding) AS u(x))) AS nrm
        FROM embeddings),
      pr AS (SELECT vec_id AS pid, embedding AS pe, nrm AS pnorm FROM nrm2 WHERE vec_id < 10),
      bfp AS (
        SELECT pr.pid AS pid, c.vec_id AS nid,
               round((SELECT sum(a * b) FROM (
                        SELECT CAST(unnest(pr.pe) AS DOUBLE) AS a,
                               CAST(unnest(c.embedding) AS DOUBLE) AS b))
                     / (pr.pnorm * c.nrm), 4) AS cos
        FROM pr CROSS JOIN nrm2 c WHERE c.vec_id <> pr.pid),
      tr AS (
        SELECT pid, nid FROM (
          SELECT pid, nid, row_number() OVER (PARTITION BY pid ORDER BY cos DESC, nid) AS rnk
          FROM bfp) WHERE rnk <= 5)
      SELECT tr.pid, CAST(count(*) AS BIGINT) AS n_true,
             CAST(count(pq.nid) AS BIGINT) AS n_hit,
             ${N.ratio("count(pq.nid)", "count(*)", 4)} AS recall_at_5
      FROM tr LEFT JOIN pq ON tr.pid = pq.pid AND tr.nid = pq.nid
      GROUP BY tr.pid ORDER BY tr.pid""",

    // Laplace-smoothed bigram LM: per-term floor to integer micro-nats
    // (ln of BIGINT is the same IEEE double both engines) makes the
    // corpus sum order-free; train decile doc_id%10=1, test decile 0.
    "llm_bigram_lm" -> """
      WITH bi AS (
        SELECT doc_id, lang, w[CAST(i AS INT)] AS w1, w[CAST(i AS INT) + 1] AS w2
        FROM (SELECT doc_id, lang, string_split(text, ' ') AS w
              FROM documents WHERE doc_id % 10 <= 1),
             LATERAL unnest(range(1, len(w))) t(i)),
      tr AS (SELECT * FROM bi WHERE doc_id % 10 = 1),
      c2 AS (SELECT w1, w2, count(*) AS c2 FROM tr GROUP BY w1, w2),
      c1 AS (SELECT w1, count(*) AS c1 FROM tr GROUP BY w1),
      v AS (SELECT count(DISTINCT wv) AS vsz FROM (
              SELECT w1 AS wv FROM tr UNION ALL SELECT w2 FROM tr)),
      sc AS (
        SELECT te.doc_id, te.lang,
               CAST(floor(1000000.0 *
                 (ln(CAST(coalesce(c1.c1, 0) + v.vsz AS DOUBLE)) -
                  ln(CAST(coalesce(c2.c2, 0) + 1 AS DOUBLE)))) AS BIGINT) AS nll
        FROM (SELECT * FROM bi WHERE doc_id % 10 = 0) te
        LEFT JOIN c2 ON c2.w1 = te.w1 AND c2.w2 = te.w2
        LEFT JOIN c1 ON c1.w1 = te.w1
        CROSS JOIN v)
      SELECT lang, count(DISTINCT doc_id) AS n_docs, count(*) AS n_bigrams,
             CAST(sum(nll) AS BIGINT) AS nll_micro_sum,
             CAST(sum(nll) // count(*) AS BIGINT) AS avg_nll_micro
      FROM sc GROUP BY lang ORDER BY lang""",

    // Band-tune S-curve: one 64-perm signature pass (the dedup_minhash
    // CTEs), four band layouts over it, truth = est-Jaccard ≥ 1/2
    // (≥32/64 matching components — provably inside the r=1 candidate
    // set by pigeonhole). Band keys here are the component-value
    // strings; the Spark side hashes the same slices (xxhash64), so
    // the candidate SETS agree exactly as in llm_dedup_minhash.
    "llm_minhash_band_tune" -> s"""
      WITH wd AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
        FROM documents WHERE doc_id < 2000),
      sh AS (
        SELECT doc_id,
               CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                    ELSE list_distinct(list_transform(range(1, len(w) - 1), i ->
                         array_to_string(w[i:i+2], ' '))) END AS shs
        FROM wd),
      hs AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT) & 2147483647 AS h
        FROM (SELECT doc_id, unnest(shs) AS g FROM sh)),
      perm AS (
        SELECT i,
               1 + (1664525 * (i + 1) + 1013904223) % 2147483646 AS a,
               (22695477 * (i + 1) + 1) % 2147483647 AS b
        FROM range(64) t(i)),
      sig AS (
        SELECT doc_id, i, min((a * h + b) % 2147483647) AS v
        FROM hs CROSS JOIN perm GROUP BY doc_id, i),
      cfg AS (SELECT unnest([1, 2, 4, 8]) AS r),
      bands AS (
        SELECT doc_id, r, i // r AS band,
               string_agg(CAST(v AS VARCHAR), ',' ORDER BY i) AS bkey
        FROM sig CROSS JOIN cfg GROUP BY doc_id, r, i // r),
      cand AS (
        SELECT DISTINCT a.r, a.doc_id AS da, b.doc_id AS db
        FROM bands a JOIN bands b ON a.r = b.r AND a.band = b.band AND a.bkey = b.bkey
        WHERE a.doc_id < b.doc_id),
      sigv AS (SELECT doc_id, list(v ORDER BY i) AS sig FROM sig GROUP BY doc_id),
      truth AS (
        SELECT c.da, c.db
        FROM (SELECT da, db FROM cand WHERE r = 1) c
        JOIN sigv sa ON sa.doc_id = c.da
        JOIN sigv sb ON sb.doc_id = c.db
        WHERE len(list_filter(range(1, 65), j -> sa.sig[j] = sb.sig[j])) >= 32),
      tc AS (SELECT count(*) AS n_truth FROM truth),
      per AS (
        SELECT cand.r, count(*) AS n_candidates,
               CAST(sum(CASE WHEN t.da IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
        FROM cand LEFT JOIN truth t ON t.da = cand.da AND t.db = cand.db
        GROUP BY cand.r)
      SELECT CAST(64 // r AS BIGINT) AS n_bands, CAST(r AS BIGINT) AS rows_per_band,
             n_candidates, n_hits, CAST(tc.n_truth AS BIGINT) AS n_truth,
             ${N.ratio("n_hits", "n_candidates", 4)} AS band_precision,
             ${N.ratio("n_hits", "tc.n_truth", 4)} AS band_recall
      FROM per CROSS JOIN tc ORDER BY rows_per_band""",

    // aspect-ratio bucketing: stub dims recomputed from md5 (the
    // mm_resize_plan mirror), ratio-nearest bucket by the exact integer
    // |⌊w·bh·10⁶/(h·bw)⌋ − 10⁶| criterion, rectangle fit + pad census
    "mm_aspect_bucket" -> """
      WITH m AS (
        SELECT doc_id, md5(text) AS hx
        FROM documents WHERE doc_id < 2000 AND doc_id % 3 = 0),
      d AS (
        SELECT doc_id,
               64 + CAST(('0x' || substr(hx, 1, 8)) AS BIGINT) % 1857 AS w,
               64 + CAST(('0x' || substr(hx, 9, 8)) AS BIGINT) % 1017 AS h
        FROM m),
      bk AS (SELECT CAST(bi AS BIGINT) AS bi, CAST(bw AS BIGINT) AS bw, CAST(bh AS BIGINT) AS bh
             FROM (VALUES (0, 512, 512), (1, 576, 448), (2, 448, 576),
                          (3, 640, 384), (4, 384, 640)) v(bi, bw, bh)),
      a AS (
        SELECT doc_id, w, h, bi, bw, bh,
               row_number() OVER (PARTITION BY doc_id
                 ORDER BY abs((w * bh * 1000000) // (h * bw) - 1000000), bi) AS rn
        FROM d CROSS JOIN bk),
      f AS (
        SELECT doc_id, bi, bw, bh,
               CASE WHEN w * bh >= h * bw THEN least(w, bw)
                    ELSE (w * least(h, bh)) // h END AS ow,
               CASE WHEN w * bh >= h * bw THEN (h * least(w, bw)) // w
                    ELSE least(h, bh) END AS oh
        FROM a WHERE rn = 1)
      SELECT bi AS bucket_id, bw AS bucket_w, bh AS bucket_h,
             count(*) AS n_images,
             CAST(sum(bw * bh - ow * oh) AS BIGINT) AS total_pad_px,
             CAST(sum(bw * bh - ow * oh) // count(*) AS BIGINT) AS avg_pad_px,
             CAST((count(*) + 31) // 32 AS BIGINT) AS n_batches
      FROM f GROUP BY bi, bw, bh ORDER BY bucket_id""",

    // median/MAD outliers: discrete medians via the cumulative-count
    // RANGE window (agg_percentile_disc formulation), signed micro-unit
    // deviation by toward-zero integer division (ts_theil_sen precedent)
    "ts_robust_zscore" -> """
      WITH e AS (
        SELECT event_id, event_type,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        FROM events),
      mw AS (
        SELECT event_type, cents,
               count(*) OVER (PARTITION BY event_type ORDER BY cents) AS cw,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM e),
      m AS (SELECT event_type, min(CASE WHEN cw * 2 >= n THEN cents END) AS med_cents
            FROM mw GROUP BY event_type),
      d AS (SELECT e.event_id, e.event_type, e.cents, m.med_cents,
                   abs(e.cents - m.med_cents) AS ad
            FROM e JOIN m USING (event_type)),
      aw AS (
        SELECT event_type, ad,
               count(*) OVER (PARTITION BY event_type ORDER BY ad) AS cwa,
               count(*) OVER (PARTITION BY event_type) AS na
        FROM d),
      md AS (SELECT event_type, min(CASE WHEN cwa * 2 >= na THEN ad END) AS mad_cents
             FROM aw GROUP BY event_type)
      SELECT d.event_id, d.event_type, d.cents, d.med_cents, md.mad_cents,
             CAST((d.cents - d.med_cents) * 1000000 // greatest(md.mad_cents, 1) AS BIGINT) AS dev_micro
      FROM d JOIN md USING (event_type)
      ORDER BY abs(dev_micro) DESC, event_id LIMIT 25""",

    // per-category c·ln(c) floors to BIGINT micro-nats BEFORE the sum;
    // H_micro = ⌊ln(n)·10⁶⌋ − S div n — one expression tree, both engines
    "dq_entropy_profile" -> s"""
      WITH cen AS (
        SELECT 'events.event_type' AS column_name, count(*) AS c FROM events GROUP BY event_type
        UNION ALL SELECT 'documents.lang', count(*) FROM documents GROUP BY lang
        UNION ALL SELECT 'documents.source', count(*) FROM documents GROUP BY source
        UNION ALL SELECT 'customer.c_mktsegment', count(*) FROM customer GROUP BY c_mktsegment),
      tt AS (
        SELECT column_name, c,
               CAST(floor(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) * 1000000.0) AS BIGINT) AS t
        FROM cen),
      g AS (
        SELECT column_name, CAST(sum(c) AS BIGINT) AS n_rows,
               CAST(count(*) AS BIGINT) AS n_distinct,
               CAST(max(c) AS BIGINT) AS top_count,
               CAST(sum(t) AS BIGINT) AS st
        FROM tt GROUP BY column_name),
      g2 AS (
        SELECT column_name, n_rows, n_distinct, top_count,
               CAST(floor(ln(CAST(n_rows AS DOUBLE)) * 1000000.0) AS BIGINT) - st // n_rows AS entropy_micro,
               CAST(floor(ln(CAST(n_distinct AS DOUBLE)) * 1000000.0) AS BIGINT) AS max_entropy_micro
        FROM g)
      SELECT column_name, n_rows, n_distinct, top_count,
             ${N.ratio("top_count", "n_rows", 4)} AS top_share,
             entropy_micro, max_entropy_micro,
             ${N.ratio("entropy_micro", "max_entropy_micro", 4)} AS norm_entropy
      FROM g2 ORDER BY column_name""",

    // banded matrix profile over the gap-filled hourly series: exact
    // BIGINT window distances, (d2, j) argmin, discord = largest nn
    // distance; the calendar bounds the all-pairs term (ts_theil_sen
    // convention)
    "ts_matrix_profile_discord" -> """
      WITH e AS (
        SELECT epoch_us(ts) // 3600000000 AS h,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'),
      hr AS (SELECT h, CAST(sum(cents) AS BIGINT) AS c FROM e GROUP BY h),
      b AS (SELECT min(h) AS h0, max(h) AS h1 FROM hr),
      cal AS (SELECT unnest(range(b.h0, b.h1 + 1)) AS h FROM b),
      ser AS (SELECT cal.h, coalesce(hr.c, 0) AS c FROM cal LEFT JOIN hr USING (h)),
      w AS (
        SELECT i, s.h - i AS k, s.c
        FROM ser s CROSS JOIN b,
             LATERAL unnest(range(greatest(s.h - 23, b.h0), least(s.h, b.h1 - 23) + 1)) t(i)),
      d2 AS (
        SELECT a.i, bb.j, CAST(sum((a.c - bb.c) * (a.c - bb.c)) AS BIGINT) AS d2
        FROM w a JOIN (SELECT i AS j, k, c FROM w) bb ON a.k = bb.k
        WHERE abs(a.i - bb.j) >= 12
        GROUP BY a.i, bb.j),
      prof AS (
        SELECT i, j, d2, row_number() OVER (PARTITION BY i ORDER BY d2, j) AS rn
        FROM d2)
      SELECT i AS win_hour, j AS nn_hour, d2 AS nn_d2
      FROM prof WHERE rn = 1
      ORDER BY nn_d2 DESC, win_hour LIMIT 25""",

    // three unrolled IPF passes (rows, cols, rows): weights in 1e-6
    // units, factors floor-divided at 1e12 scale, window marginal sums —
    // value-for-value with the Spark rake
    "census_ipf_raking" -> """
      WITH cust AS (
        SELECT n.n_name, c.c_mktsegment
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey),
      seed AS (SELECT n_name, c_mktsegment, count(*) AS n_seed FROM cust GROUP BY 1, 2),
      nt AS (SELECT count(*) AS n_cust FROM cust),
      sup AS (
        SELECT n.n_name, count(*) AS s_r
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey GROUP BY 1),
      st AS (SELECT count(*) AS s_tot
             FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey),
      rt AS (SELECT n_name, (nt.n_cust * s_r) // st.s_tot AS t_r
             FROM sup CROSS JOIN nt CROSS JOIN st),
      ords AS (
        SELECT c.c_mktsegment, count(*) AS o_seg
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey GROUP BY 1),
      ot AS (SELECT count(*) AS o_tot
             FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      ct AS (SELECT c_mktsegment, (nt.n_cust * o_seg) // ot.o_tot AS t_c
             FROM ords CROSS JOIN nt CROSS JOIN ot),
      w0 AS (
        SELECT seed.n_name, seed.c_mktsegment, seed.n_seed,
               seed.n_seed * 1000000 AS w,
               coalesce(rt.t_r, 0) AS t_r, coalesce(ct.t_c, 0) AS t_c
        FROM seed LEFT JOIN rt USING (n_name) LEFT JOIN ct USING (c_mktsegment)),
      r1 AS (
        SELECT n_name, c_mktsegment, n_seed, t_r, t_c,
               CASE WHEN ms = 0 THEN 0
                    ELSE (w * ((t_r * 1000000000000) // ms)) // 1000000 END AS w
        FROM (SELECT w0.*, sum(w) OVER (PARTITION BY n_name) AS ms FROM w0)),
      c1 AS (
        SELECT n_name, c_mktsegment, n_seed, t_r, t_c,
               CASE WHEN ms = 0 THEN 0
                    ELSE (w * ((t_c * 1000000000000) // ms)) // 1000000 END AS w
        FROM (SELECT r1.*, sum(w) OVER (PARTITION BY c_mktsegment) AS ms FROM r1)),
      r2 AS (
        SELECT n_name, c_mktsegment, n_seed,
               CASE WHEN ms = 0 THEN 0
                    ELSE (w * ((t_r * 1000000000000) // ms)) // 1000000 END AS w
        FROM (SELECT c1.*, sum(w) OVER (PARTITION BY n_name) AS ms FROM c1))
      SELECT n_name, c_mktsegment, CAST(n_seed AS BIGINT) AS n_seed,
             CAST(w AS BIGINT) AS w_final_micro
      FROM r2 ORDER BY n_name, c_mktsegment""",

    // 1 Hz frame sampling + md5-derived frame intensity (the Media stub
    // convention), cut on |Δintensity| > 96, running cut-count = shot id
    "mm_video_scene_cut" -> """
      WITH v AS (
        SELECT doc_id,
               25 * (1 + CAST(('0x' || substr(md5(text), 17, 8)) AS BIGINT) % 256) AS n_frames
        FROM documents WHERE doc_id < 600 AND doc_id % 3 = 2),
      fr AS (SELECT doc_id, CAST(unnest(range(0, n_frames, 25)) AS BIGINT) AS frame_idx FROM v),
      it AS (
        SELECT doc_id, frame_idx,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                 CAST(frame_idx AS VARCHAR) || ':scene'), 1, 8)) AS BIGINT) % 256 AS inten
        FROM fr),
      sc AS (
        SELECT doc_id, frame_idx,
               CASE WHEN prev IS NOT NULL AND abs(inten - prev) > 96 THEN 1 ELSE 0 END AS is_cut
        FROM (SELECT doc_id, frame_idx, inten,
                     lag(inten) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev
              FROM it)),
      sid AS (
        SELECT doc_id, frame_idx, is_cut,
               sum(is_cut) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS scene_id
        FROM sc),
      slen AS (SELECT doc_id, scene_id, count(*) AS slen FROM sid GROUP BY 1, 2),
      pd AS (SELECT doc_id, count(*) AS n_sampled, CAST(sum(is_cut) AS BIGINT) AS n_cuts
             FROM sid GROUP BY 1),
      mx AS (SELECT doc_id, CAST(max(slen) AS BIGINT) AS max_scene_len FROM slen GROUP BY 1)
      SELECT pd.doc_id, pd.n_sampled, pd.n_cuts, mx.max_scene_len
      FROM pd JOIN mx USING (doc_id)
      ORDER BY n_cuts DESC, doc_id LIMIT 25""",

    // T5-style span corruption plan: seeded md5 span starts (pure
    // function of doc, position), 3-token spans, islands merge via lag
    // windows — the mask is bit-identical across engines
    "llm_span_corruption_plan" -> s"""
      WITH tok AS (
        SELECT doc_id, lang, CAST(i AS BIGINT) AS i
        FROM (SELECT doc_id, lang, string_split(text, ' ') AS w
              FROM documents WHERE doc_id < 2000),
             LATERAL unnest(range(len(w))) t(i)),
      st AS (
        SELECT doc_id, lang, i,
               CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                 CAST(i AS VARCHAR) || ':span'), 1, 8)) AS BIGINT) % 20 = 0
                 THEN 1 ELSE 0 END AS st
        FROM tok),
      mk AS (
        SELECT doc_id, lang, i,
               (st = 1 OR lag(st, 1, 0) OVER w = 1 OR lag(st, 2, 0) OVER w = 1) AS masked
        FROM st WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
      sp AS (
        SELECT doc_id, lang, masked,
               (masked AND NOT coalesce(lag(masked) OVER (PARTITION BY doc_id ORDER BY i), false)) AS span_start
        FROM mk),
      pd AS (
        SELECT doc_id, lang, count(*) AS n_tokens,
               CAST(count(*) FILTER (WHERE masked) AS BIGINT) AS n_masked,
               CAST(count(*) FILTER (WHERE span_start) AS BIGINT) AS n_spans
        FROM sp GROUP BY 1, 2)
      SELECT lang, count(*) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             CAST(sum(n_masked) AS BIGINT) AS total_masked,
             CAST(sum(n_spans) AS BIGINT) AS total_spans,
             ${N.ratio("sum(n_masked)", "sum(n_tokens)", 4)} AS mask_ratio,
             CAST(sum(n_tokens) - sum(n_masked) + sum(n_spans) AS BIGINT) AS packed_tokens
      FROM pd GROUP BY lang ORDER BY lang""",

    // areal interpolation: bbox ∩ grid-cell intersection areas in exact
    // integer min/max arithmetic, 1e-6-unit floor-divided allocation;
    // oracle derives the bboxes in closed form from the nation dim
    "census_areal_interpolation" -> """
      WITH p AS (
        SELECT CAST(n_nationkey AS BIGINT) AS gid,
               CAST(n_nationkey * 1000 + n_regionkey AS BIGINT) AS pop,
               CAST(4 * n_nationkey AS BIGINT) AS x0, CAST(3 * n_regionkey AS BIGINT) AS y0,
               CAST(4 * n_nationkey + 2 AS BIGINT) AS x1, CAST(3 * n_regionkey + 2 AS BIGINT) AS y1
        FROM nation),
      g AS (
        SELECT CAST(gx AS BIGINT) AS gx, CAST(gy AS BIGINT) AS gy,
               CAST(gx * 10 AS BIGINT) AS cx0, CAST(gy * 5 AS BIGINT) AS cy0,
               CAST(gx * 10 + 10 AS BIGINT) AS cx1, CAST(gy * 5 + 5 AS BIGINT) AS cy1
        FROM range(10) a(gx), range(3) b(gy)),
      j AS (
        SELECT p.gid, p.pop, g.gx, g.gy,
               greatest(0, least(p.x1, g.cx1) - greatest(p.x0, g.cx0)) *
               greatest(0, least(p.y1, g.cy1) - greatest(p.y0, g.cy0)) AS ia,
               (p.x1 - p.x0) * (p.y1 - p.y0) AS pa
        FROM p CROSS JOIN g)
      SELECT gx, gy, CAST(count(*) AS BIGINT) AS n_polys,
             CAST(sum((pop * ia * 1000000) // pa) AS BIGINT) AS pop_micro
      FROM j WHERE ia > 0
      GROUP BY gx, gy ORDER BY gx, gy""",

    // landmark hop histogram + the 90th-percentile effective-diameter
    // flag: the same 4 unrolled BFS rounds as graph_landmark_distance,
    // read as a distance distribution instead of a closeness fold
    "graph_effective_diameter" -> s"""
      WITH docs AS (SELECT doc_id, source, lang, n_chars FROM documents WHERE doc_id < 1200),
      blocks AS (
        SELECT doc_id AS u, concat_ws('|', 's', source, CAST(n_chars // 100 AS VARCHAR)) AS bk FROM docs
        UNION ALL
        SELECT doc_id AS u, concat_ws('|', 'l', lang, CAST(n_chars // 50 AS VARCHAR)) AS bk FROM docs),
      edges AS (
        SELECT DISTINCT a.u AS u, b.u AS v
        FROM blocks a JOIN blocks b USING (bk) WHERE a.u < b.u),
      adj AS (SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges),
      nodes AS (SELECT DISTINCT u AS node FROM adj),
      r0 AS (SELECT node, node AS lm, CAST(0 AS BIGINT) AS dist FROM nodes WHERE node % 151 = 0),
      r1 AS (SELECT node, lm, min(dist) AS dist FROM (
        SELECT node, lm, dist FROM r0
        UNION ALL SELECT a.v AS node, r.lm, r.dist + 1 AS dist FROM adj a JOIN r0 r ON a.u = r.node) GROUP BY 1, 2),
      r2 AS (SELECT node, lm, min(dist) AS dist FROM (
        SELECT node, lm, dist FROM r1
        UNION ALL SELECT a.v AS node, r.lm, r.dist + 1 AS dist FROM adj a JOIN r1 r ON a.u = r.node) GROUP BY 1, 2),
      r3 AS (SELECT node, lm, min(dist) AS dist FROM (
        SELECT node, lm, dist FROM r2
        UNION ALL SELECT a.v AS node, r.lm, r.dist + 1 AS dist FROM adj a JOIN r2 r ON a.u = r.node) GROUP BY 1, 2),
      r4 AS (SELECT node, lm, min(dist) AS dist FROM (
        SELECT node, lm, dist FROM r3
        UNION ALL SELECT a.v AS node, r.lm, r.dist + 1 AS dist FROM adj a JOIN r3 r ON a.u = r.node) GROUP BY 1, 2),
      hist AS (SELECT dist, count(*) AS n_pairs FROM r4 GROUP BY dist),
      c0 AS (
        SELECT dist, n_pairs,
               sum(n_pairs) OVER (ORDER BY dist) AS cum_pairs,
               sum(n_pairs) OVER () AS total
        FROM hist),
      c AS (
        SELECT dist, n_pairs, cum_pairs, total,
               coalesce(lag(cum_pairs) OVER (ORDER BY dist), 0) AS prev_cum
        FROM c0)
      SELECT dist, CAST(n_pairs AS BIGINT) AS n_pairs,
             CAST(cum_pairs AS BIGINT) AS cum_pairs,
             ${N.ratio("cum_pairs", "total", 4)} AS reach_share,
             (cum_pairs * 10 >= total * 9 AND prev_cum * 10 < total * 9) AS is_eff_diameter
      FROM c ORDER BY dist""",

    // Theil H: every ln() quantized to micro-nats before exact BIGINT
    // sums; H = (e_all - within) / e_all as one half-up ratio
    "census_theil" -> s"""
      WITH cells AS (
        SELECT n.n_name, c.c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n_ij
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2),
      bn AS (SELECT n_name, CAST(sum(n_ij) AS BIGINT) AS n_i FROM cells GROUP BY 1),
      pern AS (
        SELECT cells.n_name, max(bn.n_i) AS n_i,
               CAST(sum(n_ij * CAST(round(ln(CAST(bn.n_i AS DOUBLE) / n_ij) * 1000000) AS BIGINT)) AS BIGINT) AS e_num
        FROM cells JOIN bn USING (n_name) GROUP BY cells.n_name),
      bs AS (SELECT segment, CAST(sum(n_ij) AS BIGINT) AS n_j FROM cells GROUP BY 1),
      tt AS (SELECT CAST(sum(n_j) AS BIGINT) AS nn FROM bs),
      ea AS (
        SELECT CAST(sum(n_j * CAST(round(ln(CAST(tt.nn AS DOUBLE) / n_j) * 1000000) AS BIGINT)) AS BIGINT) AS e_all
        FROM bs CROSS JOIN tt),
      h AS (
        SELECT ea.e_all,
               round(CAST(ea.e_all - w.ew AS DOUBLE) / CAST(ea.e_all AS DOUBLE), 6) AS theil_h
        FROM (SELECT CAST(sum(e_num) AS BIGINT) AS ew FROM pern) w CROSS JOIN ea)
      SELECT pern.n_name, pern.n_i, pern.e_num,
             ${N.ratio("pern.e_num", "pern.n_i", 0)} AS entropy_micro,
             h.e_all, h.theil_h
      FROM pern CROSS JOIN h ORDER BY n_name""",

    // Moran's I on scaled integer deviations d_i = n*mean_i - sum(mean);
    // per-region pair sum collapses to (sum d)^2 - sum d^2
    "census_moran_i" -> s"""
      WITH means AS (
        SELECT n.n_regionkey,
               (CAST(sum(CAST(CAST(c.c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) * 2
                + count(*)) // (count(*) * 2) AS m
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE c.c_acctbal > 0
        GROUP BY n.n_nationkey, n.n_regionkey),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(m) AS BIGINT) AS t FROM means),
      devs AS (
        SELECT n_regionkey, tot.n * m - tot.t AS d, tot.n AS n
        FROM means CROSS JOIN tot),
      pr AS (
        SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n_nations,
               CAST(sum(d) AS BIGINT) AS sd, CAST(sum(d * d) AS BIGINT) AS ssq,
               max(n) AS n
        FROM devs GROUP BY 1),
      pr2 AS (
        SELECT n_regionkey, n_nations, sd * sd - ssq AS cross_sum,
               n_nations * (n_nations - 1) AS s0_pairs, ssq, n
        FROM pr),
      gi AS (
        SELECT s0,
               round(CAST(n * num AS DOUBLE) / CAST(s0 * den AS DOUBLE), 6) AS moran_i
        FROM (SELECT max(n) AS n, CAST(sum(cross_sum) AS BIGINT) AS num,
                     CAST(sum(s0_pairs) AS BIGINT) AS s0,
                     CAST(sum(ssq) AS BIGINT) AS den
              FROM pr2))
      SELECT r.r_name, pr2.n_nations, pr2.cross_sum, pr2.ssq, gi.s0, gi.moran_i
      FROM pr2 JOIN region r ON pr2.n_regionkey = r.r_regionkey CROSS JOIN gi
      ORDER BY r_name""",

    // Hill MLE over the degree census tail (d_min 4, micro-nat lns)
    // + the log-log OLS slope the zipf row established as comparable
    "graph_powerlaw_fit" -> s"""
      WITH $simGraphCtes,
      d1 AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY u),
      census AS (SELECT deg, CAST(count(*) AS BIGINT) AS cnt FROM d1 GROUP BY deg),
      tail AS (
        SELECT CAST(sum(cnt) AS BIGINT) AS n_tail,
               CAST(sum(cnt * CAST(round(ln(CAST(deg AS DOUBLE) / 3.5) * 1000000) AS BIGINT)) AS BIGINT) AS sum_ln_micro,
               CAST(max(deg) AS BIGINT) AS max_degree
        FROM census WHERE deg >= 4),
      ols AS (
        SELECT round(regr_slope(ln(cnt), ln(deg)), 4) AS ols_slope,
               CAST(count(*) AS BIGINT) AS n_degrees
        FROM census)
      SELECT CAST(4 AS BIGINT) AS d_min, n_tail, sum_ln_micro,
             1.0 + ${N.ratio("n_tail * 1000000", "sum_ln_micro", 6)} AS alpha_hill,
             max_degree, ols_slope, n_degrees
      FROM tail CROSS JOIN ols""",

    // DFT bins k=1..8 over the daily order-count series; trig weights
    // quantized to 1e-4 before exact BIGINT sums, amplitude in double
    "ts_periodogram" -> s"""
      WITH daily AS (
        SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS n
        FROM orders GROUP BY 1),
      idx AS (
        SELECT n, CAST(count(*) OVER () AS BIGINT) AS nd,
               CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT) AS t
        FROM daily),
      ks AS (SELECT CAST(unnest(range(1, 9)) AS BIGINT) AS k),
      sums AS (
        SELECT k, max(nd) AS n_days,
               CAST(sum(n * CAST(round(cos(2.0 * pi() * k * t / nd) * 10000) AS BIGINT)) AS BIGINT) AS c_sum,
               CAST(sum(n * CAST(round(sin(2.0 * pi() * k * t / nd) * 10000) AS BIGINT)) AS BIGINT) AS s_sum
        FROM idx CROSS JOIN ks GROUP BY k),
      amp AS (
        SELECT k, n_days, ${N.ratio("n_days", "k", 2)} AS period_days,
               round(sqrt(CAST(c_sum AS DOUBLE) * CAST(c_sum AS DOUBLE)
                          + CAST(s_sum AS DOUBLE) * CAST(s_sum AS DOUBLE)) / 10000, 2) AS amplitude
        FROM sums)
      SELECT k, n_days, period_days, amplitude,
             amplitude = max(amplitude) OVER () AS dominant
      FROM amp ORDER BY k""",

    // two-stage ANN: sign-sketch hamming shortlist (two 32-bit words;
    // a 64th bit would overflow the BIGINT sum) -> exact cosine rerank
    "llm_sim_rerank" -> """
      WITH n AS MATERIALIZED (
        SELECT vec_id, embedding,
               sqrt((SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                     FROM unnest(embedding) AS u(x))) AS nrm
        FROM embeddings),
      sk AS MATERIALIZED (
        SELECT e.vec_id,
               CAST(sum(CASE WHEN t.i <= 32 AND e.embedding[t.i] > 0
                             THEN (CAST(1 AS BIGINT) << (t.i - 1)) ELSE 0 END) AS BIGINT) AS sk0,
               CAST(sum(CASE WHEN t.i > 32 AND e.embedding[t.i] > 0
                             THEN (CAST(1 AS BIGINT) << (t.i - 33)) ELSE 0 END) AS BIGINT) AS sk1
        FROM embeddings e, range(1, 65) t(i) GROUP BY e.vec_id),
      pr AS (SELECT vec_id AS pid, sk0 AS p0, sk1 AS p1 FROM sk WHERE vec_id < 10),
      ham AS (
        SELECT pr.pid, s.vec_id AS nid,
               CAST(64 - bit_count(xor(s.sk0, pr.p0)) - bit_count(xor(s.sk1, pr.p1)) AS BIGINT) AS ham
        FROM sk s CROSS JOIN pr WHERE s.vec_id <> pr.pid),
      short AS (
        SELECT pid, nid, ham FROM (
          SELECT pid, nid, ham,
                 row_number() OVER (PARTITION BY pid ORDER BY ham DESC, nid) AS r
          FROM ham) WHERE r <= 100),
      pairs AS (
        SELECT short.pid, short.nid, short.ham AS ham_sim,
               round((SELECT sum(a * b) FROM (
                        SELECT CAST(unnest(pp.embedding) AS DOUBLE) AS a,
                               CAST(unnest(nn.embedding) AS DOUBLE) AS b))
                     / (pp.nrm * nn.nrm), 4) AS cos
        FROM short JOIN n pp ON pp.vec_id = short.pid
                   JOIN n nn ON nn.vec_id = short.nid)
      SELECT pid, nid, cos, ham_sim, rnk FROM (
        SELECT pid, nid, cos, ham_sim,
               row_number() OVER (PARTITION BY pid ORDER BY cos DESC, nid) AS rnk
        FROM pairs)
      WHERE rnk <= 5 ORDER BY pid, rnk""",

    // curriculum banding: avg token length (milli) -> 10 stages,
    // deterministic md5 order key, map-only
    "llm_curriculum_order" -> """
      SELECT doc_id,
             least(9, greatest(0, (score_milli - 3000) // 600)) AS stage,
             score_milli,
             CAST(('0x' || substr(md5('curr|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS order_key
      FROM (
        SELECT doc_id,
               (length(replace(text, ' ', '')) * 1000) // len(string_split(text, ' ')) AS score_milli
        FROM documents WHERE doc_id < 2000)
      ORDER BY stage, order_key, doc_id""",

    // CUPED: exact BIGINT per-user cents sums; moment cross-products as
    // doubles of those single-row exacts (identical IEEE shape)
    "event_uplift_cuped" -> """
      WITH users AS (
        SELECT user_id, CAST(user_id % 2 AS BIGINT) AS arm,
               CAST(sum(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
                             THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
               CAST(sum(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
                             THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) ELSE 0 END) AS BIGINT) AS y
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id),
      mom AS (
        SELECT n, sx,
               CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS covn,
               CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varxn,
               CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS varyn
        FROM (
          SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(y * y) AS BIGINT) AS syy, CAST(sum(x * y) AS BIGINT) AS sxy
          FROM users)),
      arms AS (
        SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(x) AS BIGINT) AS ax, CAST(sum(y) AS BIGINT) AS ay
        FROM users GROUP BY arm)
      SELECT arm, n_users,
             round(CAST(ay AS DOUBLE) / n_users / 100, 2) AS y_mean,
             round((CAST(ay AS DOUBLE) / n_users
                    - (covn / varxn)
                      * (CAST(ax AS DOUBLE) / n_users - CAST(sx AS DOUBLE) / n)) / 100, 2) AS y_adj,
             round(covn / varxn, 6) AS theta,
             round(covn * covn / (varxn * varyn), 6) AS rho_sq
      FROM arms CROSS JOIN mom ORDER BY arm""",

    // burst flags: trailing-7-day z^2 > 9 rule cleared of divisions —
    // burst iff 7n > S and (7n - S)^2 > 9(7Q - S^2)
    "event_burst_detect" -> """
      WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2),
      win AS (
        SELECT event_type, day, n,
               count(*) OVER w AS win_n,
               CAST(sum(n) OVER w AS BIGINT) AS s,
               CAST(sum(n * n) OVER w AS BIGINT) AS q
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
      SELECT event_type, day, n, s AS win_sum,
             (n * 7 - s) * (n * 7 - s) AS zsq_num,
             (q * 7 - s * s) * 9 AS zsq_den,
             (n * 7 > s AND (n * 7 - s) * (n * 7 - s) > (q * 7 - s * s) * 9) AS is_burst
      FROM win WHERE win_n = 7
      ORDER BY event_type, day""",

    // per-column profile: 4 exact distinct censuses in one pass,
    // stacked; candidate key = fully distinct and null-free
    "dq_uniqueness_profile" -> s"""
      WITH prof AS (
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT o_orderkey) AS BIGINT) AS d1, CAST(count(o_orderkey) AS BIGINT) AS c1,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS d2, CAST(count(o_custkey) AS BIGINT) AS c2,
               CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS d3, CAST(count(o_orderstatus) AS BIGINT) AS c3,
               CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS d4, CAST(count(o_orderpriority) AS BIGINT) AS c4
        FROM orders),
      stacked AS (
        SELECT 'o_orderkey' AS column_name, n_rows, d1 AS n_distinct, c1 AS n_non_null FROM prof
        UNION ALL SELECT 'o_custkey', n_rows, d2, c2 FROM prof
        UNION ALL SELECT 'o_orderstatus', n_rows, d3, c3 FROM prof
        UNION ALL SELECT 'o_orderpriority', n_rows, d4, c4 FROM prof)
      SELECT column_name, n_rows, n_distinct,
             n_rows - n_non_null AS n_nulls,
             ${N.ratio("n_non_null - n_distinct", "n_rows", 6)} AS dup_ratio,
             (n_distinct = n_rows AND n_non_null = n_rows) AS is_candidate_key
      FROM stacked ORDER BY column_name""",

    // VLM dynamic tiling: md5-slice decode dims (the mm convention),
    // least integer downscale s with ceil-grid <= 12 tiles, 49 tok/tile
    "mm_image_tile_plan" -> """
      WITH m AS (
        SELECT doc_id, md5(text) AS hx
        FROM documents WHERE doc_id < 2000 AND doc_id % 3 = 1),
      d AS (
        SELECT doc_id,
               64 + CAST(('0x' || substr(hx, 1, 8)) AS BIGINT) % 1857 AS w,
               64 + CAST(('0x' || substr(hx, 9, 8)) AS BIGINT) % 1017 AS h
        FROM m),
      g AS (
        SELECT doc_id, w, h,
               ((w + 111) // 112) * ((h + 111) // 112) AS t1,
               ((w + 223) // 224) * ((h + 223) // 224) AS t2,
               ((w + 335) // 336) * ((h + 335) // 336) AS t3,
               ((w + 447) // 448) * ((h + 447) // 448) AS t4
        FROM d),
      p AS (
        SELECT doc_id, w, h,
               CASE WHEN t1 <= 12 THEN 1 WHEN t2 <= 12 THEN 2
                    WHEN t3 <= 12 THEN 3 ELSE 4 END AS scale_s,
               t4 > 12 AS truncated
        FROM g)
      SELECT doc_id, w, h, CAST(scale_s AS BIGINT) AS scale_s,
             (w + 112 * scale_s - 1) // (112 * scale_s) AS grid_x,
             (h + 112 * scale_s - 1) // (112 * scale_s) AS grid_y,
             least((w + 112 * scale_s - 1) // (112 * scale_s)
                   * ((h + 112 * scale_s - 1) // (112 * scale_s)), 12) AS n_tiles,
             least((w + 112 * scale_s - 1) // (112 * scale_s)
                   * ((h + 112 * scale_s - 1) // (112 * scale_s)), 12) * 49 + 49 AS n_tokens,
             truncated
      FROM p ORDER BY doc_id""",

    // RLHF pairs: max_by/min_by over (score, id) structs mirrored as
    // rank-1 rows under the same (score, id) total orders
    "llm_rlhf_pairs" -> """
      WITH scored AS (
        SELECT source, n_chars // 200 AS len_bucket, doc_id,
               (len(list_distinct(string_split(text, ' '))) * 1000)
                 // len(string_split(text, ' ')) AS ttr
        FROM documents WHERE doc_id < 2000),
      ranked AS (
        SELECT source, len_bucket, doc_id, ttr,
               row_number() OVER (PARTITION BY source, len_bucket ORDER BY ttr DESC, doc_id DESC) AS rb,
               row_number() OVER (PARTITION BY source, len_bucket ORDER BY ttr ASC, doc_id ASC) AS rw,
               count(*) OVER (PARTITION BY source, len_bucket) AS n_docs
        FROM scored)
      SELECT b.source, b.len_bucket, CAST(b.n_docs AS BIGINT) AS n_docs,
             b.doc_id AS chosen_doc, b.ttr AS chosen_score,
             w.doc_id AS rejected_doc, w.ttr AS rejected_score,
             b.ttr - w.ttr AS margin
      FROM ranked b JOIN ranked w
        ON b.source = w.source AND b.len_bucket = w.len_bucket
      WHERE b.rb = 1 AND w.rw = 1 AND b.n_docs >= 2
      ORDER BY b.source, b.len_bucket""",

    // FK inference: containment of distinct child keys in the parent
    // key set, one left-semi census per declared edge
    "dq_fk_inference" -> s"""
      WITH e1 AS (
        SELECT CAST(count(*) AS BIGINT) AS n_child_distinct,
               CAST(count(*) FILTER (k IN (SELECT c_custkey FROM customer)) AS BIGINT) AS n_contained
        FROM (SELECT DISTINCT o_custkey AS k FROM orders)),
      e2 AS (
        SELECT CAST(count(*) AS BIGINT) AS n_child_distinct,
               CAST(count(*) FILTER (k IN (SELECT o_orderkey FROM orders)) AS BIGINT) AS n_contained
        FROM (SELECT DISTINCT l_orderkey AS k FROM lineitem)),
      e3 AS (
        SELECT CAST(count(*) AS BIGINT) AS n_child_distinct,
               CAST(count(*) FILTER (k IN (SELECT p_partkey FROM part)) AS BIGINT) AS n_contained
        FROM (SELECT DISTINCT l_partkey AS k FROM lineitem)),
      e4 AS (
        SELECT CAST(count(*) AS BIGINT) AS n_child_distinct,
               CAST(count(*) FILTER (k IN (SELECT s_suppkey FROM supplier)) AS BIGINT) AS n_contained
        FROM (SELECT DISTINCT l_suppkey AS k FROM lineitem)),
      stacked AS (
        SELECT 'orders.o_custkey->customer.c_custkey' AS edge, * FROM e1
        UNION ALL SELECT 'lineitem.l_orderkey->orders.o_orderkey', * FROM e2
        UNION ALL SELECT 'lineitem.l_partkey->part.p_partkey', * FROM e3
        UNION ALL SELECT 'lineitem.l_suppkey->supplier.s_suppkey', * FROM e4)
      SELECT edge, n_child_distinct, n_contained,
             ${N.ratio("n_contained", "n_child_distinct", 6)} AS containment,
             (n_contained = n_child_distinct) AS is_fk
      FROM stacked ORDER BY edge""",

    // direct standardization: stratum micro rates re-weighted by the
    // corpus segment distribution; one half-up ratio per output cell
    "census_age_standardize" -> s"""
      WITH cells AS (
        SELECT n.n_name, c.c_mktsegment AS segment,
               CAST(count(*) AS BIGINT) AS n_pop,
               CAST(count(*) FILTER (c.c_acctbal < 0) AS BIGINT) AS n_event
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2),
      w AS (SELECT segment, CAST(sum(n_pop) AS BIGINT) AS w_seg FROM cells GROUP BY 1),
      strata AS (
        SELECT cells.n_name, cells.n_pop, cells.n_event, w.w_seg,
               w.w_seg * CAST(${N.ratio("cells.n_event * 1000000", "cells.n_pop", 0)} AS BIGINT) AS w_rate
        FROM cells JOIN w USING (segment)),
      agg AS (
        SELECT n_name, CAST(sum(n_pop) AS BIGINT) AS n_pop,
               CAST(sum(n_event) AS BIGINT) AS n_event,
               CAST(sum(w_rate) AS BIGINT) AS w_rate_sum,
               CAST(sum(w_seg) AS BIGINT) AS w_sum
        FROM strata GROUP BY n_name)
      SELECT n_name, n_pop, n_event,
             ${N.ratio("n_event * 1000000", "n_pop", 0)} AS crude_micro,
             ${N.ratio("w_rate_sum", "w_sum", 0)} AS std_micro
      FROM agg ORDER BY n_name""",

    // full disclosure-avoidance iterate: 3 unrolled row/col rounds to
    // fixpoint, round-stamped complementaries, loud converged verdict
    "census_suppression_fixpoint" -> suppressFixpointSql,

    // Fay BRR replicate variance: factor-2 scaling clears the 0.5s,
    // squared diffs in 1e4-cent units keep BIGINT exact at every SF
    "census_replicate_weights" -> """
      WITH base AS (
        SELECT n.n_name,
               CAST(CAST(c.c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
               CAST(('0x' || substr(md5('rep|' || CAST(c.c_custkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey),
      reps AS (
        SELECT b.n_name, t.r,
               b.cents * (((b.h >> CAST(t.r AS INT)) & 1) * 2 + 1) AS wcents,
               b.cents
        FROM base b, range(0, 8) t(r)),
      per_rep AS (
        SELECT n_name, r, CAST(sum(wcents) AS BIGINT) AS est_r2,
               CAST(sum(cents) AS BIGINT) AS est
        FROM reps GROUP BY 1, 2),
      diffs AS (
        SELECT n_name, est, (est_r2 - est * 2) // 10000 AS diff_h
        FROM per_rep),
      agg AS (
        SELECT n_name, CAST(max(est) AS BIGINT) AS est_cents,
               CAST(sum(diff_h * diff_h) // 8 AS BIGINT) AS var_h2
        FROM diffs GROUP BY n_name)
      SELECT n_name, est_cents, var_h2,
             round(sqrt(CAST(var_h2 AS DOUBLE)) * 10000 / 100, 2) AS se_dollars,
             round(sqrt(CAST(var_h2 AS DOUBLE)) * 10000 * 1000000
                   / CAST(est_cents AS DOUBLE), 0) AS cv_micro
      FROM agg ORDER BY n_name""",

    // bipartite projection with the occupancy cap (<= 32 suppliers per
    // part) applied BEFORE the pair self-join — the postings discipline
    "graph_bipartite_project" -> """
      WITH inc AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS sp FROM lineitem),
      occ AS (SELECT p, count(*) AS occ FROM inc GROUP BY p),
      kept AS (SELECT inc.p, inc.sp FROM inc JOIN occ USING (p) WHERE occ.occ <= 32),
      pairs AS (
        SELECT a.sp AS u, b.sp AS v, CAST(count(*) AS BIGINT) AS shared_parts
        FROM kept a JOIN kept b USING (p)
        WHERE a.sp < b.sp
        GROUP BY a.sp, b.sp)
      SELECT u, v, shared_parts FROM pairs
      ORDER BY shared_parts DESC, u, v LIMIT 50""",

    // footer/zone-map read: the ENGINE answers from parquet metadata,
    // the oracle recomputes the same four values from the data — the
    // hash gate proves footer ≡ content (what stats-based planners
    // silently assume)
    "source_parquet_footer" -> """
      SELECT CAST(count(*) AS BIGINT) AS total_rows,
             CAST(min(o_orderkey) AS BIGINT) AS min_orderkey,
             CAST(max(o_orderkey) AS BIGINT) AS max_orderkey,
             CAST(6 AS BIGINT) AS n_cols
      FROM orders""",

    // generic shoelace/centroid over parsed rings on the Spark side;
    // the oracle derives the closed form from the fixture geometry
    // (2×2 squares at (4n, 3r)) — the tiger-family convention
    "tiger_polygon_centroid" -> """
      SELECT CAST(n_nationkey AS BIGINT) AS gid, n_name AS name,
             CAST(5 AS BIGINT) AS n_points,
             CAST(8 AS BIGINT) AS area_x2,
             CAST((4 * n_nationkey + 1) * 1000000 AS BIGINT) AS centroid_x_micro,
             CAST((3 * n_regionkey + 1) * 1000000 AS BIGINT) AS centroid_y_micro
      FROM nation ORDER BY gid""",

    // DiD over the CUPED user census: four cell means as half-up
    // ratios of exact cents, DiD = (T_post-T_pre) - (C_post-C_pre)
    "event_diff_in_diff" -> s"""
      WITH users AS (
        SELECT user_id, CAST(user_id % 2 AS BIGINT) AS arm,
               CAST(sum(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
                             THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
               CAST(sum(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
                             THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) ELSE 0 END) AS BIGINT) AS y
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id),
      arms AS (
        SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(x) AS BIGINT) AS pre_cents,
               CAST(sum(y) AS BIGINT) AS post_cents
        FROM users GROUP BY arm),
      means AS (
        SELECT arm, n_users, pre_cents, post_cents,
               ${N.ratio("pre_cents", "n_users", 4)} AS pre_mean,
               ${N.ratio("post_cents", "n_users", 4)} AS post_mean
        FROM arms),
      did AS (
        SELECT round(max(CASE WHEN arm = 1 THEN post_mean - pre_mean END)
                     - max(CASE WHEN arm = 0 THEN post_mean - pre_mean END), 4) AS did_cents,
               round(max(CASE WHEN arm = 1 THEN pre_mean END)
                     - max(CASE WHEN arm = 0 THEN pre_mean END), 4) AS pre_gap_cents
        FROM means)
      SELECT arm, n_users, pre_cents, post_cents, pre_mean, post_mean,
             did_cents, pre_gap_cents
      FROM means CROSS JOIN did ORDER BY arm""",

    // cumulative daily z² trace: the ab_test HUGEINT inequality per
    // day over forward-filled cumulative cells; first naive crossing
    "event_cumulative_ab" -> """
      WITH exposed AS (
        SELECT user_id, min(ts) AS v_ts FROM events
        WHERE event_type = 'view' GROUP BY 1),
      conv AS (
        SELECT e.user_id, CAST(min(e.ts) AS DATE) AS c_day FROM events e
        JOIN exposed x ON e.user_id = x.user_id AND e.ts >= x.v_ts
        WHERE e.event_type = 'purchase' GROUP BY e.user_id),
      per_user AS (
        SELECT CAST(x.user_id % 2 AS BIGINT) AS arm,
               CAST(x.v_ts AS DATE) AS e_day, c.c_day
        FROM exposed x LEFT JOIN conv c ON x.user_id = c.user_id),
      enter AS (
        SELECT e_day AS day, arm, CAST(count(*) AS BIGINT) AS d_n
        FROM per_user GROUP BY 1, 2),
      cv AS (
        SELECT c_day AS day, arm, CAST(count(*) AS BIGINT) AS d_c
        FROM per_user WHERE c_day IS NOT NULL GROUP BY 1, 2),
      daily AS (
        SELECT COALESCE(enter.day, cv.day) AS day,
               COALESCE(enter.arm, cv.arm) AS arm,
               COALESCE(d_n, 0) AS d_n, COALESCE(d_c, 0) AS d_c
        FROM enter FULL JOIN cv ON enter.day = cv.day AND enter.arm = cv.arm),
      cum AS (
        SELECT day, arm,
               CAST(sum(d_n) OVER (PARTITION BY arm ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cn,
               CAST(sum(d_c) OVER (PARTITION BY arm ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cc
        FROM daily),
      wide AS (
        SELECT day,
               max(CASE WHEN arm = 0 THEN cn END) AS r_na,
               max(CASE WHEN arm = 0 THEN cc END) AS r_ca,
               max(CASE WHEN arm = 1 THEN cn END) AS r_nb,
               max(CASE WHEN arm = 1 THEN cc END) AS r_cb
        FROM cum GROUP BY day),
      filled AS (
        SELECT day,
               COALESCE(last_value(r_na IGNORE NULLS) OVER w, 0) AS n_a,
               COALESCE(last_value(r_ca IGNORE NULLS) OVER w, 0) AS c_a,
               COALESCE(last_value(r_nb IGNORE NULLS) OVER w, 0) AS n_b,
               COALESCE(last_value(r_cb IGNORE NULLS) OVER w, 0) AS c_b
        FROM wide
        WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      sigd AS (
        SELECT day, n_a, c_a, n_b, c_b,
               (n_a > 0 AND n_b > 0 AND c_a + c_b > 0 AND c_a + c_b < n_a + n_b AND
                (CAST(c_a AS HUGEINT) * n_b - CAST(c_b AS HUGEINT) * n_a) *
                (CAST(c_a AS HUGEINT) * n_b - CAST(c_b AS HUGEINT) * n_a) *
                (CAST(n_a AS HUGEINT) + n_b) * 10000 >
                38416 * CAST(n_a AS HUGEINT) * n_b *
                (CAST(c_a AS HUGEINT) + c_b) *
                ((CAST(n_a AS HUGEINT) + n_b) - (CAST(c_a AS HUGEINT) + c_b)))
                 AS naive_significant
        FROM filled)
      SELECT day, n_a, c_a, n_b, c_b, naive_significant,
             (naive_significant AND COALESCE(max(CASE WHEN naive_significant THEN 1 ELSE 0 END)
               OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) = 0)
               AS first_crossing
      FROM sigd ORDER BY day""",

    // Durbin–Levinson on 6-decimal quantized ACF inputs; the recursion
    // itself is one identical double expression both engines
    "ts_pacf" -> s"""
      WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      idx AS (
        SELECT cents, row_number() OVER (ORDER BY day) AS rn,
               count(*) OVER () AS n, sum(cents) OVER () AS total
        FROM daily),
      d AS (SELECT rn, CAST(CAST(cents * n - total AS BIGINT) AS HUGEINT) AS d FROM idx),
      den AS (SELECT sum(d * d) AS den FROM d),
      nums AS (
        SELECT sum(CASE WHEN b.rn = a.rn - 1 THEN a.d * b.d END) AS n1,
               sum(CASE WHEN b.rn = a.rn - 2 THEN a.d * b.d END) AS n2,
               sum(CASE WHEN b.rn = a.rn - 3 THEN a.d * b.d END) AS n3
        FROM d a JOIN d b ON b.rn IN (a.rn - 1, a.rn - 2, a.rn - 3)),
      rs AS (
        SELECT (CASE WHEN n1 < 0 THEN -1.0 ELSE 1.0 END) *
                 CAST((abs(n1) * 2000000 + den) // (den * 2) AS DOUBLE) / 1000000 AS r1,
               (CASE WHEN n2 < 0 THEN -1.0 ELSE 1.0 END) *
                 CAST((abs(n2) * 2000000 + den) // (den * 2) AS DOUBLE) / 1000000 AS r2,
               (CASE WHEN n3 < 0 THEN -1.0 ELSE 1.0 END) *
                 CAST((abs(n3) * 2000000 + den) // (den * 2) AS DOUBLE) / 1000000 AS r3
        FROM nums CROSS JOIN den),
      dl AS (
        SELECT r1, r2, r3,
               (r2 - r1 * r1) / (1.0 - r1 * r1) AS phi22
        FROM rs),
      dl2 AS (
        SELECT r1, r2, r3, phi22, r1 * (1.0 - phi22) AS a21 FROM dl)
      SELECT k, acf, pacf FROM (
        SELECT CAST(1 AS BIGINT) AS k, r1 AS acf, round(r1, 6) AS pacf FROM dl2
        UNION ALL
        SELECT CAST(2 AS BIGINT), r2, round(phi22, 6) FROM dl2
        UNION ALL
        SELECT CAST(3 AS BIGINT), r3, round((r3 - a21 * r2 - phi22 * r1)
               / (1.0 - a21 * r1 - phi22 * r2), 6) FROM dl2)
      ORDER BY k""",

    // lag-1 Granger: exact DECIMAL(38) moments of 1e4-cent daily units,
    // centered-moment R² algebra in doubles of the single-row exacts
    "ts_granger_lag1" -> """
      WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               (CAST(sum(CASE WHEN event_type = 'purchase'
                   THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) ELSE 0 END) AS BIGINT)
                * 2 + 10000) // 20000 AS y,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x
        FROM events GROUP BY 1),
      obs AS (
        SELECT y, lag(y) OVER (ORDER BY day) AS a, lag(x) OVER (ORDER BY day) AS b
        FROM daily),
      m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               sum(CAST(a AS DECIMAL(38,0))) AS sa, sum(CAST(b AS DECIMAL(38,0))) AS sb,
               sum(CAST(y AS DECIMAL(38,0))) AS sz,
               sum(CAST(a AS DECIMAL(38,0)) * CAST(a AS DECIMAL(38,0))) AS saa,
               sum(CAST(b AS DECIMAL(38,0)) * CAST(b AS DECIMAL(38,0))) AS sbb,
               sum(CAST(a AS DECIMAL(38,0)) * CAST(b AS DECIMAL(38,0))) AS sab,
               sum(CAST(a AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS saz,
               sum(CAST(b AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS sbz,
               sum(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS szz
        FROM obs WHERE a IS NOT NULL),
      c AS (
        SELECT n,
               CAST(n AS DOUBLE) * CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) AS caa,
               CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) AS cbb,
               CAST(n AS DOUBLE) * CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE) AS cab,
               CAST(n AS DOUBLE) * CAST(saz AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sz AS DOUBLE) AS caz,
               CAST(n AS DOUBLE) * CAST(sbz AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sz AS DOUBLE) AS cbz,
               CAST(n AS DOUBLE) * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) AS czz
        FROM m)
      SELECT n,
             round(caz * caz / (caa * czz), 6) AS r2_ar1,
             round((caz * (cbb * caz - cab * cbz) + cbz * (caa * cbz - cab * caz))
                   / ((caa * cbb - cab * cab) * czz), 6) AS r2_full,
             round((caz * (cbb * caz - cab * cbz) + cbz * (caa * cbz - cab * caz))
                   / ((caa * cbb - cab * cab) * czz)
                   - caz * caz / (caa * czz), 6) AS r2_lift,
             ((caz * (cbb * caz - cab * cbz) + cbz * (caa * cbz - cab * caz))
                   / ((caa * cbb - cab * cab) * czz)
                   - caz * caz / (caa * czz) > 0.05) AS x_leads_y
      FROM c""",

    // DSIR: 64 hashed unigram buckets, add-1-smoothed log ratios in
    // micro-nats (ln of identical exact BIGINTs), exact per-doc sums
    "llm_dsir_select" -> """
      WITH words AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
        FROM documents),
      toks AS (
        SELECT doc_id, lang,
               CAST(('0x' || substr(md5(word), 1, 15)) AS BIGINT) % 64 AS b
        FROM words),
      counts AS (
        SELECT b, CAST(count(*) AS BIGINT) AS c_corpus,
               CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS c_target
        FROM toks GROUP BY b),
      tot AS (
        SELECT CAST(sum(c_corpus) AS BIGINT) AS t_corpus,
               CAST(sum(c_target) AS BIGINT) AS t_target
        FROM counts),
      lr AS (
        SELECT b, CAST(round((ln(c_target + 1) - ln(t_target + 64)
                 - ln(c_corpus + 1) + ln(t_corpus + 64)) * 1000000) AS BIGINT) AS lr_micro
        FROM counts CROSS JOIN tot)
      SELECT t.doc_id, max(t.lang) AS lang,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(lr.lr_micro) AS BIGINT) AS weight_micro
      FROM toks t JOIN lr ON t.b = lr.b
      GROUP BY t.doc_id
      ORDER BY weight_micro DESC, t.doc_id LIMIT 25""",

    // XmR chart: X-bar and MR-bar as half-up micro ratios, 2.66-MR
    // limits, per-day out-of-control flags against the fixed limits
    "dq_control_chart" -> s"""
      WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1),
      mrd AS (
        SELECT day, n, abs(n - lag(n) OVER (ORDER BY day)) AS mr FROM daily),
      agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_days, CAST(sum(n) AS BIGINT) AS sum_n,
               CAST(sum(mr) AS BIGINT) AS sum_mr, CAST(count(mr) AS BIGINT) AS n_mr
        FROM mrd),
      lim AS (
        SELECT x_bar, mr_bar,
               round(x_bar + 2.66 * mr_bar, 6) AS ucl,
               round(x_bar - 2.66 * mr_bar, 6) AS lcl
        FROM (SELECT ${N.ratio("sum_n", "n_days", 6)} AS x_bar,
                     ${N.ratio("sum_mr", "n_mr", 6)} AS mr_bar FROM agg))
      SELECT day, n, mr, x_bar, mr_bar, ucl, lcl,
             (CAST(n AS DOUBLE) > ucl OR CAST(n AS DOUBLE) < lcl) AS out_of_control
      FROM mrd CROSS JOIN lim ORDER BY day""",

    // Hampel: sorted 7-window lists, median and MAD by pick, the
    // 3*1.4826 rule as the exact integer 44478 inequality
    "ts_hampel" -> """
      WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      win AS (
        SELECT day, cents,
               list_sort(list(cents) OVER w) AS l,
               count(*) OVER w AS cnt
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      picked AS (
        SELECT day, cents, l, l[4] AS med FROM win WHERE cnt = 7),
      dev AS (
        SELECT day, cents, med,
               list_sort(list_transform(l, v -> abs(v - med)))[4] AS mad
        FROM picked)
      SELECT day, cents, med, mad,
             (abs(cents - med) * 10000 > mad * 44478) AS is_outlier,
             CASE WHEN abs(cents - med) * 10000 > mad * 44478
                  THEN med ELSE cents END AS repaired
      FROM dev ORDER BY day""",

    // grouped median: $1,000 bracket census per nation, containing
    // bracket by exact integer cut, one half-up interpolation ratio
    "census_grouped_median" -> s"""
      WITH cells AS (
        SELECT n.n_name,
               (CAST(round(c.c_acctbal * 100) AS BIGINT) + 100000) // 100000 AS b,
               CAST(count(*) AS BIGINT) AS f
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2),
      cum AS (
        SELECT n_name, b, f,
               CAST(sum(f) OVER (PARTITION BY n_name ORDER BY b
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        FROM cells),
      tot AS (SELECT n_name, CAST(sum(f) AS BIGINT) AS n_cust FROM cells GROUP BY 1)
      SELECT c.n_name, t.n_cust,
             c.b * 100000 - 100000 AS bracket_lo_cents,
             c.f AS f_in_bracket,
             c.cum - c.f AS cum_below,
             round(CAST(c.b * 100000 - 100000 AS DOUBLE) +
               ${N.ratio("(t.n_cust - (c.cum - c.f) * 2) * 100000", "c.f * 2", 6)}, 6)
               AS grouped_median_cents
      FROM cum c JOIN tot t ON c.n_name = t.n_name
      WHERE c.cum * 2 >= t.n_cust AND (c.cum - c.f) * 2 < t.n_cust
      ORDER BY c.n_name""",

    // sqrt-temperature mix: micro shares, correctly-rounded sqrt to
    // milli, normalized rates and tail-boost factors — all half-up
    "llm_mix_temperature" -> s"""
      WITH s AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY 1),
      tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t_tokens FROM s),
      sh AS (
        SELECT source, n_docs, n_tokens,
               CAST(${N.ratio("n_tokens * 1000000", "t_tokens", 0)} AS BIGINT) AS share_micro
        FROM s CROSS JOIN tot),
      w AS (
        SELECT *, CAST(round(sqrt(CAST(share_micro AS DOUBLE)) * 1000) AS BIGINT) AS w_milli
        FROM sh),
      wt AS (SELECT CAST(sum(w_milli) AS BIGINT) AS w_total FROM w),
      rated AS (
        SELECT source, n_docs, n_tokens, share_micro, w_milli,
               CAST(${N.ratio("w_milli * 1000000", "w_total", 0)} AS BIGINT) AS rate_micro
        FROM w CROSS JOIN wt)
      SELECT source, n_docs, n_tokens, share_micro, w_milli, rate_micro,
             CAST(${N.ratio("rate_micro * 1000", "share_micro", 0)} AS BIGINT) AS boost_milli
      FROM rated ORDER BY source"""
  ).map { case (k, v) => k -> v.stripMargin.trim.replaceAll("\n\\s+", "\n") }
}
