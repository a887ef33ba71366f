package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: where do graph_louvain_apply's seconds go. */
object ProbeLouvain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    time("warm lpa via one_level")(
      graft.queries.GraphQueries.graphLouvainOneLevel(spark, dir).count())
    time("one_level again")(
      graft.queries.GraphQueries.graphLouvainOneLevel(spark, dir).count())
    import org.apache.spark.sql.functions._
    val moves = time("moves persist+count") {
      val m = graft.queries.GraphQueries.louvainMoves(spark, dir)
        .select(col("node"), col("c").as("to_c")).persist()
      m.count(); m
    }
    time("moves recount")(moves.count())
    time("moves recount2")(moves.count())
    val trivial = spark.range(100).persist()
    trivial.count()
    time("trivial cached count")(trivial.count())
    val ck = time("moves localCheckpoint")(moves.localCheckpoint(true))
    time("checkpointed count")(ck.count())
    time("checkpointed count2")(ck.count())
    time("apply cold")(
      graft.queries.GraphQueries.graphLouvainApply(spark, dir).count())
    time("apply warm")(
      graft.queries.GraphQueries.graphLouvainApply(spark, dir).count())
    spark.stop()
  }
}
