package graft

import org.apache.spark.sql.functions._

/** Partition-layout behaviors that only matter beyond single-file tables
  * (SURVEY §4.2 "partition pruning / DPP — relevant in the 100 TB design
  * only"): at cluster scale every fact table is laid out as
  * `.../yr=YYYY/part-*.parquet`, and the difference between scanning one
  * partition and scanning seven IS the query latency. The driver testdata
  * is single-file, so this suite builds the partitioned layout itself and
  * pins both pruning paths:
  *  - static: a literal filter on the partition column never reads the
  *    other partitions' files;
  *  - dynamic (DPP): a join against a filtered dim prunes fact partitions
  *    at RUNTIME from the broadcast side's values — the mechanism that
  *    makes star joins over date-partitioned 100 TB facts feasible.
  */
class PartitionPruningSpec extends GraftSpec {

  private lazy val layout: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_part").toFile
    d.deleteOnExit()
    val path = d.getAbsolutePath
    graft.tables.Tables.t(spark, sfDir, "orders")
      .withColumn("yr", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("yr").parquet(path)
    path
  }

  private def parquetFilesUnder(dir: String): Seq[String] = {
    val base = new java.io.File(dir)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(base).map(_.getAbsolutePath).filter(_.endsWith(".parquet"))
  }

  test("static partition pruning: literal year filter reads only that partition's files") {
    val df = spark.read.parquet(layout).filter(col("yr") === 1997)
    val qe = df.queryExecution
    qe.executedPlan.execute().count()
    val scan = qe.executedPlan.collectLeaves().head
    assert(scan.toString.contains("PartitionFilters") && scan.toString.contains("1997"), scan.toString)
    val filesRead = scan.metrics("numFiles").value
    val files1997 = parquetFilesUnder(layout).count(_.contains("yr=1997"))
    val filesAll = parquetFilesUnder(layout).size
    assert(filesRead == files1997 && filesRead < filesAll,
      s"read $filesRead files; yr=1997 has $files1997 of $filesAll total")
  }

  test("dynamic partition pruning: dim-side filter prunes fact partitions at runtime") {
    val prev = spark.conf.getOption("spark.sql.optimizer.dynamicPartitionPruning.enabled")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    try {
      val fact = spark.read.parquet(layout)
      // tiny dim keyed by year; the filter value is only known after the
      // dim scan, so static pruning cannot apply
      val years = graft.tables.Tables.t(spark, sfDir, "orders")
        .select(year(col("o_orderdate")).as("yr")).distinct()
        .withColumn("tag", col("yr") % 2)
      val dim = years.filter(col("tag") === 1).select("yr")
      val joined = fact.join(dim, "yr").agg(count(lit(1)).as("n"))
      val planStr = joined.queryExecution.executedPlan.toString
      assert(planStr.toLowerCase.contains("dynamicpruning"),
        s"no dynamicpruning subquery in plan:\n${planStr.take(2000)}")
      // and the result is still correct versus the unpartitioned compute
      val expected = graft.tables.Tables.t(spark, sfDir, "orders")
        .filter(year(col("o_orderdate")) % 2 === 1).count()
      val got = joined.collect().head.getLong(0)
      assert(got == expected, s"$got != $expected")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", v)
      case None => spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.enabled")
    }
  }
}
