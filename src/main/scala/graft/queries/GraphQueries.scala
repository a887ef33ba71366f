package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables.t

/** Graph operators over data-derived edge sets (SURVEY §2.B graph_*
  * rows). Components (min-label propagation) lives in
  * `operators.Components`; this adds the weighted-importance side.
  */
object GraphQueries {

  /** PageRank (damping 0.85, 3 rounds) over a similarity graph: nodes
    * are documents, edges connect docs in the same (source, 100-char
    * length bucket) block — block sizes run 1..10 here, so degrees
    * (and therefore ranks) genuinely vary. INTEGER-EXACT throughout:
    * ranks live in 1e-6 units
    * (BIGINT), contributions are floor-divided per out-degree, and the
    * damping step is `150000 + (850·Σcontrib) div 1000` — integer sums
    * are associative, so the result is bit-identical at any
    * parallelism, and the oracle unrolls the same three rounds in SQL.
    * Scale shape: each round is one equi-join (edges ⋈ ranks, both
    * hash-partitioned on the source node) + one aggregation — the
    * Pregel step as relational algebra. At production depth the loop
    * checkpoints lineage like `operators.Components.minLabel`; three
    * unrolled rounds need no checkpoint. Isolated docs (no block peers)
    * converge to the 0.15 floor, never join traffic. */
  def graphPagerank(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .filter(col("doc_id") < 1200)
      .select(col("doc_id").as("node"), col("source"),
        call_function("div", col("n_chars"), lit(100L)).as("blk"))
    val edges = docs.select(col("node").as("u"), col("source"), col("blk"))
      .join(docs.select(col("node").as("v"), col("source"), col("blk")),
        Seq("source", "blk"))
      .filter(col("u") =!= col("v"))
      .select("u", "v")
    val deg = edges.groupBy("u").agg(count(lit(1)).as("deg"))
    val nodes = docs.select("node")
    var rank = nodes.select(col("node"), lit(1000000L).as("r"))
    for (_ <- 1 to 3) {
      val contrib = edges
        .join(rank.withColumnRenamed("node", "u"), "u")
        .join(deg, "u")
        .select(col("v").as("node"),
          call_function("div", col("r"), col("deg")).as("c"))
        .groupBy("node").agg(sum("c").as("sc"))
      rank = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(150000L) + call_function("div",
            lit(850L) * coalesce(col("sc"), lit(0L)), lit(1000L))).as("r"))
    }
    rank
      .join(deg.withColumnRenamed("u", "node"), Seq("node"), "left")
      .select(col("node"), coalesce(col("deg"), lit(0L)).as("n_neighbors"),
        col("r").as("rank_micro"))
      .orderBy(desc("rank_micro"), col("node"))
      .limit(25)
  }
}
