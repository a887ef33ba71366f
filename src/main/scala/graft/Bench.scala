package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm-up: session init, parquet reader, codegen JIT — the
    // ~5s one-off otherwise lands on whichever query runs first
    try SparkEntry.queries("scan_parquet_project")(spark, sfDir).count()
    catch { case _: Throwable => () }
    // min over two INTERLEAVED passes: single-shot timings on a shared VM
    // see multi-second host stalls (observed 10-20x on random queries);
    // back-to-back repeats of one query sit inside the same stall, so the
    // passes run the full suite twice instead — a stall lands on
    // different queries each pass and the per-query min heals it
    def pass(): Map[String, Double] = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val p1 = pass(); val p2 = pass()
    val results = p1.map { case (k, v) => k -> math.min(v, p2(k)) }
    // 3-decimal seconds keep the whole line under ~2KB for ~70 queries:
    // the driver captures only the tail of stdout, and a longer line gets
    // truncated mid-JSON and fails to parse (observed in BENCH_r01.json)
    def fmt(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
