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
}
