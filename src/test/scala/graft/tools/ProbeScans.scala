package graft
import org.apache.spark.sql.SparkSession

/** Scratch: count parquet FileScans per source table in each query's
  * physical plan — a high count means a derived table is recomputed
  * instead of persisted/reused (each extra scan re-runs everything
  * between the file and the fork point). */
object ProbeScans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val skip = Set("sink_postgres", "sink_postgres_copy", "ingest_census_csv")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      if (!skip.contains(n)) {
        try {
          val p = fn(spark, dir).queryExecution.executedPlan.toString
          val scans = "FileScan parquet [^\\[]*\\[([a-z_#0-9L,]+)\\]".r
            .findAllMatchIn(p).map(_ => 1).sum
          val files = "parquet\\]\\[file:[^,\\]]*/([a-z_]+)\\.parquet"
          val perTable = "([a-z_]+)\\.parquet".r.findAllMatchIn(p)
            .map(_.group(1)).toSeq.groupBy(identity).map { case (t, xs) => s"$t=${xs.size}" }
            .toSeq.sorted.mkString(",")
          val mem = "InMemory".r.findAllIn(p).size
          if (scans > 2 || perTable.exists(_ => perTable.split(",").exists(_.split("=")(1).toInt > 2)))
            println(f"SCANS $n%-28s n=$scans mem=$mem  $perTable")
        } catch { case e: Throwable => println(s"SCANS $n ERR ${e.getClass.getSimpleName}") }
      }
    }
    spark.stop()
  }
}
