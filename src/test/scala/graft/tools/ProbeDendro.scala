package graft.tools
import graft._
object ProbeDendro {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpecBase.spark
    val sfDir = SparkSpecBase.sfDir
    val t0 = System.nanoTime()
    def el = f"${(System.nanoTime() - t0) / 1e9}%.1fs"
    println(s"MARK $el two_level start")
    graft.queries.GraphQueries.graphLouvainTwoLevel(spark, sfDir).collect().foreach(r => println("T2 " + r))
    println(s"MARK $el two_level done; dendrogram start")
    graft.queries.GraphQueries.graphLouvainDendrogram(spark, sfDir).collect().foreach(r => println("DD " + r))
    println(s"MARK $el dendrogram done")
  }
}
