package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: count label-propagation rounds + stage timings for
  * llm_dedup_components at a given SF. */
object ProbeCC {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val d = graft.tables.Tables.t(spark, dir, "documents")
    var t0 = System.nanoTime()
    val keyed = d.select(col("doc_id"), explode(array(
        md5(substring(col("text"), 1, 40)),
        md5(expr("substr(text, greatest(1, n_chars - 39), 40)")))).as("k"))
    val groups = keyed.groupBy("k")
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    val pp = groups.select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids) - i - 1),
          |            y -> struct(x AS src, y AS dst))))""".stripMargin)).as("e"))
      .select(col("e.src"), col("e.dst")).distinct()
    val edges = pp.union(pp.select(col("dst").as("src"), col("src").as("dst"))).cache()
    val ne = edges.count()
    println(f"PAIRGEN ${(System.nanoTime()-t0)/1e9}%.3f s, edges=$ne")
    t0 = System.nanoTime()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")).cache()
    var sig = labels.agg(sum("label")).head.getLong(0)
    println(f"INIT ${(System.nanoTime()-t0)/1e9}%.3f s, nodes=${labels.count()}")
    var rounds = 0
    var converged = false
    while (!converged && rounds < 25) {
      t0 = System.nanoTime()
      val prop = edges.join(labels, edges("dst") === labels("node"))
        .select(edges("src").as("node"), col("label"))
      val next = labels.select("node", "label").union(prop)
        .groupBy("node").agg(min("label").as("label")).cache()
      val nextSig = next.agg(sum("label")).head.getLong(0)
      labels.unpersist()
      labels = next
      converged = nextSig == sig
      sig = nextSig
      rounds += 1
      println(f"ROUND $rounds ${(System.nanoTime()-t0)/1e9}%.3f s sig=$sig")
    }
    spark.stop()
  }
}
