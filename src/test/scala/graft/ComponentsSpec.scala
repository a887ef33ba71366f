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

  test("power-law hub graph: salted loop converges to the same fixpoint") {
    // adversarial fixture: a 20k-leaf star (hub 0 — the power-law tail
    // case where one dst key owns the whole adjacency) plus a chain and
    // an isolated pair that must NOT get absorbed. hotDegree=1000 forces
    // the hub onto the salted path; the fixpoint must be identical to
    // the unsalted (hotDegree=MaxValue) run.
    import SparkSpecBase.spark.implicits._
    val star = (1L to 20000L).map(h => (0L, h))
    val extra = (30000L until 30005L).map(i => (i, i + 1)) ++ Seq((40000L, 40001L))
    val edges = undirected(star ++ extra)
    val salted = Components.minLabel(edges, hotDegree = 1000L, salts = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val unsalted = Components.minLabel(edges, hotDegree = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted == unsalted)
    val byLabel = salted.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byLabel == Map(0L -> 20001, 30000L -> 6, 40000L -> 2))
  }

  test("hub salting spreads a hot adjacency across the salt space") {
    // distribution pin on the salting transform itself: with the hub in
    // the hot set and 8 salts, no (dst, _salt) group may retain more
    // than a small multiple of degree/salts — the quantity that bounds
    // the per-reducer row count once the cache partitions on (dst, _salt)
    import SparkSpecBase.spark.implicits._
    val deg = 20000
    val star = (1L to deg.toLong).map(h => (0L, h))
    val edges = undirected(star)
    val hot = Seq(0L).toDF("node")
    val salts = 8
    val groups = Components.saltEdges(edges, hot, salts)
      .filter(col("dst") === 0L)
      .groupBy("dst", "_salt").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(groups.length == salts, s"hub must span all $salts salts: ${groups.toSeq}")
    val maxGroup = groups.map(_._2).max
    assert(maxGroup <= deg / salts * 3 / 2,
      s"hub salt groups unbalanced: max $maxGroup of $deg rows")
    // cold dst keys (the leaves, degree 1 each) stay on salt 0 — the
    // labels side only replicates HOT nodes
    val coldSalts = Components.saltEdges(edges, hot, salts)
      .filter(col("dst") =!= 0L).select("_salt").distinct()
      .as[Long].collect().toSet
    assert(coldSalts == Set(0L))
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

  test("loop width derives from measured rows, not core count or a constant cap") {
    // round 16: NO parallelism floor — a tiny frontier runs one
    // partition regardless of cores (the per-round fixed cost of
    // core-count task waves measured as inverse CPU scaling on the
    // fixpoint loops; work per partition is bounded by RowsPerPartition
    // so a narrow width is per-task trivial by construction)
    assert(Components.loopWidth(32, 300L) == 1)
    assert(Components.loopWidth(1000, 300L) == 1)
    // growth: width tracks measured edges — a billion-edge graph gets
    // ~20k partitions (≈50k rows each), where the old min(200, …) cap
    // left 5M-row partitions
    assert(Components.loopWidth(32, 1_000_000_000L) == 20000)
    assert(Components.loopWidth(1000, 100_000_000L) == 2000)
    // degenerate inputs stay sane
    assert(Components.loopWidth(0, 0L) == 1)
  }

  test("minLabel on an EMPTY edge set returns empty instead of throwing") {
    // a density/filter stage can legally produce zero edges (e.g.
    // geo_grid_dbscan at sf0.001); the null label-sum signature must
    // read as 0, not crash getLong
    import SparkSpecBase.spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Components.minLabel(empty).count() == 0)
  }
}
