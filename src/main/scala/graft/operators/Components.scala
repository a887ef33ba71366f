package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by min-label propagation — the Pregel shape on
  * plain DataFrames (used by llm_dedup_components; upstream need: dup
  * GROUPS, not just dup pairs, since A~B and B~C must collapse A,B,C).
  *
  * Every node starts as its own label; each round labels flow across
  * edges and every node keeps the minimum seen; fixpoint in ≤ diameter
  * rounds. Labels only ever decrease, so Σlabel is a strictly-monotone
  * convergence signature — one scalar action per round (which also
  * materializes that round's cache) instead of a join-and-count against
  * the previous labels.
  *
  * Scale discipline:
  *  - loop parallelism is sized to the MEASURED edge count, not the
  *    corpus (a few hundred edges → 1 partition; a billion → hundreds);
  *  - the edge set carries a self-loop per node, so each node's own
  *    label arrives through the SAME join that propagates neighbor
  *    labels. That removes the labels∪propagated union — the round plan
  *    references the previous labels exactly ONCE, so lineage grows
  *    LINEARLY per round. (The union form references labels twice and
  *    doubles the logical plan every round: 2^rounds tree nodes, and the
  *    driver dies stringifying/analyzing the plan long before any
  *    executor does work — observed as a hard hang at interval=1000.)
  *  - HUB SALTING (power-law hardening): real dup/similarity graphs are
  *    power-law — a handful of hub nodes carry degrees orders of
  *    magnitude above the median, and a hash partitioning on the join
  *    key lands a hub's ENTIRE adjacency in one shuffle partition: the
  *    per-round join and the downstream exchange both inherit a task as
  *    large as the biggest hub, no matter how many executors exist. AQE
  *    skew-split can't help here because the edges side is CACHED
  *    pre-partitioned (no fresh shuffle for OptimizeSkewedJoin to
  *    re-split). So the skew is handled ahead of time, the SkewJoin way:
  *    degrees are measured once at loop start; nodes above `hotDegree`
  *    form a (tiny, broadcast) hot set; hot edges get a deterministic
  *    salt from hashing `src` (no rand() — SURVEY §2.C rule 6) and the
  *    edge cache is partitioned on (dst, salt), spreading each hub over
  *    `salts` reducers; the labels side replicates ONLY hot nodes
  *    `salts`-fold per round (cold nodes ride with salt 0), so the
  *    per-round overhead is |hot|·salts extra tiny rows — nil by
  *    construction. The per-round aggregate relies on map-side partial
  *    aggregation (min is algebraic) to collapse a hub-as-src's degree
  *    before its rows cross the wire, then re-establishes frontier-width
  *    (node) partitioning for the next round's join. When the census
  *    finds NO hubs (the common case), the loop takes the original
  *    unsalted path — the hardening costs one degree aggregation and
  *    nothing per round.
  *  - every `checkpointEvery` rounds the new labels are
  *    `localCheckpoint`ed instead of cached: even linear lineage means
  *    the analyzer/optimizer re-walks an O(rounds²) tree at deep
  *    diameters (eventually a driver StackOverflow) though physical
  *    work per round is flat. Truncating lineage bounds the plan at
  *    `checkpointEvery` join layers. `localCheckpoint` (block-manager-
  *    backed) is the right flavor here: losing an executor merely
  *    recomputes from the last checkpoint, and the loop is driver-
  *    coordinated anyway; a durable `checkpoint()` to a checkpoint dir
  *    is the drop-in hardening for multi-hour jobs.
  */
object Components {

  /** Degree threshold above which a node counts as a hub and its edges
    * get salted. High enough that organic near-dup groups never trigger
    * it; low enough that a power-law tail is spread well before a single
    * reducer saturates. */
  val DefaultHotDegree = 100000L

  /** Salt fan-out for hub adjacencies: a hub's rows spread over this
    * many reducers; the labels side replicates each HOT node this many
    * times per round (cold nodes are untouched). */
  val DefaultSalts = 16

  /** Target edge rows per loop partition when sizing iterative joins. */
  val RowsPerPartition = 50000L

  /** Loop width for an iterative join over `rows` edge rows: at least
    * the cluster's scheduling width (every executor core gets work even
    * on a small frontier), growing linearly with the measured edge count
    * so a billion-edge graph gets ~20k partitions (≈50k edges each), not
    * a constant that leaves multi-million-row partitions at scale. Pure
    * function of (parallelism, rows) so the sizing policy is unit-
    * testable without spoofing a SparkContext. */
  private[graft] def loopWidth(defaultParallelism: Int, rows: Long): Int =
    math.max(math.max(1, defaultParallelism).toLong,
      math.max(1L, rows / RowsPerPartition)).toInt

  /** Edges annotated with a deterministic `_salt`: rows whose `dst` is
    * in `hot` (a small broadcastable frame with column `node`) get
    * hash(src) % salts; all other rows get salt 0. Exposed for
    * `ComponentsSpec`'s distribution assertions. */
  private[graft] def saltEdges(edges: DataFrame, hot: DataFrame, salts: Int): DataFrame =
    edges.join(broadcast(hot.select(col("node").as("dst"), lit(1).as("_hot"))),
        Seq("dst"), "left")
      .withColumn("_salt",
        when(col("_hot").isNotNull, pmod(xxhash64(col("src")), lit(salts.toLong)))
          .otherwise(lit(0L)))
      .drop("_hot")

  /** (node, label) fixpoint over an UNDIRECTED edge list given as both
    * directions in `edges0(src, dst)`. */
  def minLabel(
      edges0: DataFrame,
      maxRounds: Int = 25,
      checkpointEvery: Int = 5,
      hotDegree: Long = DefaultHotDegree,
      salts: Int = DefaultSalts): DataFrame = {
    val cached0 = edges0.cache()
    val loopParts =
      loopWidth(edges0.sparkSession.sparkContext.defaultParallelism, cached0.count())
    val nodes = cached0.select(col("src").as("node")).distinct()
    // hub census — one tiny count shuffle over the edge list, done once;
    // the hot set is small by construction (only the power-law tail).
    // When it's EMPTY (the common, healthy-graph case) the loop below
    // runs entirely without salt machinery: no per-round broadcast
    // join, no extra exchange — zero overhead beyond this one census.
    val hot = cached0.groupBy(col("dst").as("node"))
      .agg(count(lit(1)).as("_d")).filter(col("_d") > hotDegree)
      .select("node").cache()
    val useSalt = hot.count() > 0
    // self-loop per node: the node's own label flows through the join, so
    // no labels∪propagated union is needed (see scaladoc — keeps lineage
    // growth linear in rounds instead of 2^rounds)
    val withLoops = cached0.union(nodes.select(col("node").as("src"), col("node").as("dst")))
    val edges =
      if (useSalt) saltEdges(withLoops, hot, salts)
        .repartition(loopParts, col("dst"), col("_salt")).cache()
      else withLoops.repartition(loopParts, col("dst")).cache()
    edges.count() // materialize at loop width, then drop the raw cache
    cached0.unpersist()
    var labels = nodes.repartition(loopParts, col("node"))
      .withColumn("label", col("node")).cache()
    // coalesce: an EMPTY edge set (legal — e.g. a density filter that
    // matched nothing) sums to NULL, which must read as the stable 0
    // signature instead of throwing at getLong
    var sig = labels.agg(coalesce(sum("label"), lit(0L))).head.getLong(0)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val folded = if (useSalt) {
        // labels side: replicate HOT nodes over every salt so each salted
        // edge partition finds its match; cold nodes ride with salt 0.
        // Explicit (node, _salt) repartition co-partitions with the cached
        // edge layout, so the big side never reshuffles.
        val saltedLabels = labels
          .join(broadcast(hot.select(col("node"), lit(1).as("_h"))), Seq("node"), "left")
          .withColumn("_ss",
            when(col("_h").isNotNull, sequence(lit(0L), lit(salts.toLong - 1)))
              .otherwise(array(lit(0L))))
          .select(col("node"), col("label"), explode(col("_ss")).as("_salt"))
          .repartition(loopParts, col("node"), col("_salt"))
        edges
          .join(saltedLabels,
            edges("dst") === saltedLabels("node") && edges("_salt") === saltedLabels("_salt"))
          .select(edges("src").as("node"), col("label"))
          // groupBy WITHOUT a pre-repartition: map-side partial min
          // collapses a hub-as-src's rows inside each input partition, so
          // the aggregate exchange carries ≤ |nodes| rows per partition —
          // the explicit pre-repartition form shipped a hub's raw degree
          // into one reducer
          .groupBy("node").agg(min("label").as("label"))
          // frontier-width partitioning for the next round's labels join
          .repartition(loopParts, col("node"))
      } else {
        edges.join(labels, edges("dst") === labels("node"))
          .select(edges("src").as("node"), col("label"))
          .repartition(loopParts, col("node"))
          .groupBy("node").agg(min("label").as("label"))
      }
      val next =
        if (rounds % checkpointEvery == checkpointEvery - 1) folded.localCheckpoint(true)
        else folded.cache()
      val nextSig = next.agg(coalesce(sum("label"), lit(0L))).head.getLong(0)
      labels.unpersist()
      labels = next
      converged = nextSig == sig
      sig = nextSig
      rounds += 1
    }
    edges.unpersist()
    hot.unpersist()
    labels
  }
}
