package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._
import graft.streaming.Tws
import graft.streaming.Tws.{CentEvent, UserTotals}

/** Scratch: time one AvailableNow micro-batch of streaming TWS. */
object ProbeTws {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("tws_probe").toFile
    val (in, ckpt) = (s"$root/in", s"$root/ckpt")
    Seq(CentEvent(1L, 1000L, 250L), CentEvent(2L, 2000L, 999L)).toDF()
      .coalesce(1).write.mode("append").parquet(in)
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("us", LongType),
      StructField("cents", LongType)))
    val t0 = System.nanoTime()
    val stream = spark.readStream.schema(schema).parquet(in).as[CentEvent]
    val fn: (org.apache.spark.sql.Dataset[UserTotals], Long) => Unit =
      (ds, id) => println(s"batch $id: ${ds.collect().mkString(",")} at ${(System.nanoTime()-t0)/1e9}s")
    val q = Tws.userTotalsStream(stream, None)
      .writeStream.foreachBatch(fn)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow()).start()
    val done = q.awaitTermination(120000)
    println(s"terminated=$done after ${(System.nanoTime()-t0)/1e9}s")
    if (!done) q.stop()
    spark.stop()
  }
}
