package graft
import org.apache.spark.sql.SparkSession

/** Scratch probe main: time one query (2 passes, min) at local[32]. */
object ProbeTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    args(0).split(",").foreach { q =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir).write.mode("overwrite")
          .format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probetime] $q min=${times.min}%.2f runs=${times.mkString(",")}")
    }
    spark.stop()
  }
}
