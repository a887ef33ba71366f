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
  *  - each round repartitions on `node` so the aggregate runs at
  *    frontier width and the next round's join sees co-partitioned
  *    inputs — zero extra exchanges;
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

  /** (node, label) fixpoint over an UNDIRECTED edge list given as both
    * directions in `edges0(src, dst)`. */
  def minLabel(edges0: DataFrame, maxRounds: Int = 25, checkpointEvery: Int = 5): DataFrame = {
    val cached0 = edges0.cache()
    val loopParts = math.max(1L, math.min(200L, cached0.count() / 50000L)).toInt
    val nodes = cached0.select(col("src").as("node")).distinct()
    // self-loop per node: the node's own label flows through the join, so
    // no labels∪propagated union is needed (see scaladoc — keeps lineage
    // growth linear in rounds instead of 2^rounds)
    val edges = cached0
      .union(nodes.select(col("node").as("src"), col("node").as("dst")))
      .repartition(loopParts, col("dst")).cache()
    edges.count() // materialize at loop width, then drop the raw cache
    cached0.unpersist()
    var labels = nodes.repartition(loopParts, col("node"))
      .withColumn("label", col("node")).cache()
    var sig = labels.agg(sum("label")).head.getLong(0)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val folded = edges.join(labels, edges("dst") === labels("node"))
        .select(edges("src").as("node"), col("label"))
        .repartition(loopParts, col("node"))
        .groupBy("node").agg(min("label").as("label"))
      val next =
        if (rounds % checkpointEvery == checkpointEvery - 1) folded.localCheckpoint(true)
        else folded.cache()
      val nextSig = next.agg(sum("label")).head.getLong(0)
      labels.unpersist()
      labels = next
      converged = nextSig == sig
      sig = nextSig
      rounds += 1
    }
    edges.unpersist()
    labels
  }
}
