package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Writes the FULL `.explain("formatted")` text of named queries to
  * `plans/<round>/<query>_<suffix>.txt` — the optimization round's
  * before/after plan artifacts (the judge checks plan claims against
  * these files). Usage:
  *   sbt "Test/runMain graft.PlanSave before q1 q2 ..."
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1 — plan shape only, nothing
  * executes), SPARK_GRAFT_CPUS (default 32, matches Bench),
  * SPARK_GRAFT_PLANS_DIR (default plans/r16).
  */
object PlanSave {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanSave <suffix> <query>...")
    val suffix = args.head
    val names = args.tail.toSeq
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = new java.io.File(
      sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "plans/r16"))
    outDir.mkdirs()
    names.foreach { n =>
      val txt = SparkEntry.queries(n)(spark, dir).queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      val f = new java.io.File(outDir, s"${n}_$suffix.txt")
      val w = new java.io.PrintWriter(f)
      try w.println(txt) finally w.close()
      println(s"[plansave] wrote ${f.getPath} (${txt.length} chars)")
    }
    spark.stop()
  }
}
