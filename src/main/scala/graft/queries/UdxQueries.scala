package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables.t
import graft.udx.{NGrams, WeightedAvg}

/** Queries exercising the custom UDX pieces (SURVEY §2.B udaf/udtf rows). */
object UdxQueries {

  /** Quantity-weighted average price per brand via the typed Aggregator.
    * The oracle checks the math (sum(p·q)/sum(q)), not the mechanism. */
  def udafWeightedAvg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(
        round(WeightedAvg.weightedAvg(col("l_extendedprice"), col("l_quantity")), 4).as("wavg_price"),
        count(lit(1)).as("n"))
      .orderBy("p_brand")

  /** Character 3-grams of part names via the native Generator, top-20 by
    * frequency. Oracle: the same grams via DuckDB list_transform over a
    * range list (custom mechanism, standard semantics). */
  def udtfNgrams(s: SparkSession, dir: String): DataFrame = {
    NGrams.register(s)
    t(s, dir, "part").createOrReplaceTempView("graft_part_ngrams")
    s.sql("""
      SELECT gram, count(1) AS n
      FROM (SELECT graft_ngrams(p_name, 3) AS gram FROM graft_part_ngrams)
      GROUP BY gram
      ORDER BY n DESC, gram
      LIMIT 20""")
  }
}
