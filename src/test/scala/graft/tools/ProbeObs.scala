package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-16 scratch probe: does an eager localCheckpoint action fire
  * Dataset.observe metrics (so a loop can read its continuation count
  * off the checkpoint job instead of running a second action)? */
object ProbeObs {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq((1L, true), (2L, false), (3L, true)).toDF("id", "moved")
    val obs = org.apache.spark.sql.Observation()
    val observed = df.observe(obs, sum(when(col("moved"), 1L).otherwise(0L)).as("n"))
    val t0 = System.nanoTime()
    val ck = observed.localCheckpoint(true)
    println(s"[probe] ckpt done ${(System.nanoTime() - t0) / 1e9}")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val m = try Await.result(Future(obs.get), 10.seconds).toString
      catch { case _: java.util.concurrent.TimeoutException => "TIMEOUT" }
    println(s"[probe] metrics after ckpt: $m")
    println(s"[probe] ckpt rows=${ck.count()}")
    spark.stop()
  }
}
