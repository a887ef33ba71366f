package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multi-format source/sink round-trips (SURVEY §2.A A5/A6 generalized):
  * the engine reads parquet (testdata), CSV (census ingest), and JSON —
  * all with DECLARED schemas, never inference, matching the reference's
  * fully-declared posture. Round-trips assert lossless re-read,
  * including quoting/escaping and null handling. */
class SourcesSpec extends GraftSpec {

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private lazy val docs = graft.tables.Tables.t(spark, sfDir, "documents")
    .select("doc_id", "text", "lang", "source", "n_chars")

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("doc_id").collect().map(_.toSeq).toSeq

  test("CSV round-trip is lossless with declared schema (quotes, commas, nulls)") {
    val dir = tmpDir("graft_csv")
    // exercise quoting: text contains spaces; add a synthetic column with
    // commas, quotes, and a null
    val out = docs.withColumn("tricky",
      when(col("doc_id") % 3 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("a,\"b\" "), col("lang"))))
    out.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read
      .schema(docSchema.add("tricky", StringType))
      .option("header", "true")
      .csv(dir)
    assert(sortedRows(back) == sortedRows(out))
  }

  test("JSON-lines round-trip is lossless with declared schema") {
    val dir = tmpDir("graft_json")
    docs.write.mode("overwrite").json(dir)
    val back = spark.read.schema(docSchema).json(dir)
    assert(sortedRows(back) == sortedRows(docs))
  }

  test("ORC round-trip is lossless (the second columnar format Spark ships natively)") {
    val dir = tmpDir("graft_orc")
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.schema(docSchema).orc(dir)
    assert(sortedRows(back) == sortedRows(docs))
    // ORC predicate pushdown reaches the scan just like parquet
    val p = back.filter(col("doc_id") < 100).queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("doc_id"), p)
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = tmpDir("graft_part")
    docs.write.mode("overwrite").partitionBy("lang").parquet(dir)
    val one = spark.read.parquet(dir).filter(col("lang") === "en")
    // partition pruning: the scan must report a pushed partition filter
    // and read only the en partition's rows
    val expected = docs.filter(col("lang") === "en").count()
    assert(one.count() == expected)
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"), scan)
  }

  test("sorted-run layout: output files cover disjoint shipdate ranges") {
    // run the query once (writes the layout), then inspect per-file
    // min/max of the sort column — range partitioning must give every
    // file its own band, the precondition for row-group skipping
    graft.queries.SourceQueries.sinkSortedRuns(spark, sfDir).collect()
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_src_${ProcessHandle.current().pid()}/lineitem_sorted"
    val perFile = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("l_shipdate").as("lo"), max("l_shipdate").as("hi"))
      .collect()
      .map(r => (r.getAs[Any]("lo").toString, r.getAs[Any]("hi").toString))
      .sortBy(_._1)
    assert(perFile.length > 1, s"expected multiple sorted runs, got ${perFile.length}")
    perFile.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"overlapping runs: hi=$hi1 lo=$lo2")
      case _ => ()
    }
  }

  test("JDBC source pushes filters into the database and reads 4 range partitions") {
    // stage + build the same read sourceJdbcPushdown performs, then pin
    // the plan: the status/price predicates must appear as PushedFilters
    // on the JDBCRelation (shipped as WHERE to the database), and the
    // scan RDD must have numPartitions range slices
    graft.queries.SourceQueries.sourceJdbcPushdown(spark, sfDir).collect()
    val url = s"jdbc:derby:${System.getProperty("java.io.tmpdir")}/graft_jdbc_src_${ProcessHandle.current().pid()}"
    val read = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "graft_src")
      .option("partitionColumn", "o_orderkey")
      .option("lowerBound", "0").option("upperBound", "6000000")
      .option("numPartitions", "4")
      .load()
      .filter(col("o_orderstatus") === "O" && col("o_totalprice") > 50000.0)
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("o_orderstatus") && plan.contains("o_totalprice"),
      s"filters not pushed:\n$plan")
    assert(read.rdd.getNumPartitions == 4,
      s"expected 4 JDBC range partitions, got ${read.rdd.getNumPartitions}")
  }

  test("binaryFile round-trip: every sampled doc survives byte-for-byte") {
    val r = graft.queries.SourceQueries.sourceBinaryfile(spark, sfDir).collect()
    assert(r.length == 1)
    val (nFiles, nLenOk, nContentOk, totalBytes) =
      (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2), r(0).getLong(3))
    val expected = graft.tables.Tables.t(spark, sfDir, "documents")
      .filter(col("doc_id") < 100)
      .agg(count(lit(1)), sum(octet_length(col("text")))).collect()(0)
    assert(nFiles == expected.getLong(0), "one file per sampled doc")
    assert(nLenOk == nFiles, "every byte length must match the source text")
    assert(nContentOk == nFiles, "every content blob must equal the UTF-8 text")
    assert(totalBytes == expected.getLong(1), "byte total must match parquet truth")
  }

  test("json permissive quarantine: nothing lost, corrupt rows exactly the planted 10%") {
    val r = graft.queries.SourceQueries.sourceJsonPermissive(spark, sfDir).collect()
    assert(r.length == 1)
    val (nRows, nCorrupt, nGood) = (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2))
    val base = graft.tables.Tables.t(spark, sfDir, "orders").filter(col("o_orderkey") < 4000)
    assert(nRows == base.count(), "quarantine must keep every staged line")
    assert(nCorrupt == base.filter(col("o_orderkey") % 10 === 0).count(),
      "corrupt count must equal the planted lines")
    assert(nGood + nCorrupt == nRows, "good + corrupt must cover the file")
  }

  test("schema-merge read presents the union schema with generation-true nulls") {
    val rows = graft.queries.SourceQueries.sourceSchemaMerge(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val docs = graft.tables.Tables.t(spark, sfDir, "documents").filter(col("doc_id") < 3000)
    assert(rows.map(_._2).sum == docs.count(), "merged read must cover both generations")
    // nulls appear EXACTLY on the old generation (even ids)
    assert(rows.map(_._3).sum == docs.filter(col("doc_id") % 2 === 0).count(),
      "pre-evolution null count must equal the old generation size")
    // evolved-column values survive exactly for the new generation
    assert(rows.map(_._4).sum ==
      docs.filter(col("doc_id") % 2 === 1).agg(sum("n_chars")).head.getLong(0),
      "post-evolution char sum must match the source")
  }
}
