package graft

import org.apache.spark.sql.functions._
import graft.operators.Components

/** operators.Components: min-label fixpoint + lineage checkpointing.
  * The path graph is the adversarial diameter case — one label must
  * crawl the whole chain, forcing enough rounds to cross several
  * localCheckpoint boundaries (the llm_dedup_components corpus data
  * converges in 2-3 rounds and never would). */
class ComponentsSpec extends GraftSpec {

  private def undirected(pairs: Seq[(Long, Long)]) = {
    import SparkSpecBase.spark.implicits._
    val e = pairs.toDF("src", "dst")
    e.union(e.select(col("dst").as("src"), col("src").as("dst")))
  }

  test("deep path graph converges across checkpoint boundaries") {
    // 12-node path: diameter 11 → ≥ 12 rounds → the every-5-rounds
    // localCheckpoint fires twice before the fixpoint
    val edges = undirected((1L until 12L).map(i => (i, i + 1)))
    val labels = Components.minLabel(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labels.size == 12)
    assert(labels.values.forall(_ == 1L), s"all nodes join component 1: $labels")
  }

  test("checkpoint interval does not change the fixpoint") {
    // two chains + one isolated pair; aggressive interval (every round)
    // vs effectively-never must agree exactly
    val pairs = (1L until 8L).map(i => (i, i + 1)) ++
      (20L until 26L).map(i => (i, i + 1)) ++ Seq((100L, 101L))
    val edges = undirected(pairs)
    def run(every: Int) = Components.minLabel(edges, checkpointEvery = every)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val aggressive = run(1)
    val never = run(1000)
    assert(aggressive == never)
    val byLabel = aggressive.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byLabel == Map(1L -> 8, 20L -> 7, 100L -> 2))
  }
}
