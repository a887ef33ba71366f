package graft.census

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-equivalent ACS ingest (SURVEY §2.A A5–A11), Spark-first:
  * every file kind is a declared-schema CSV scan; multi-state loading is
  * a multi-path scan (one task per file — per-state parallelism falls
  * out of the scheduler instead of the reference's sequential Python
  * loop); cell slicing is pure projection; null coercion is a codegen'd
  * CASE. At 100 TB (full US, all sequences) nothing changes: more paths,
  * same plan shapes, no shuffles anywhere in the ingest path.
  */
object Ingest {

  /** A5: geoheader from per-state `g{year}{span}{st}.csv`. */
  def readGeoheader(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read
      .schema(Metadata.geoheaderSchema)
      .option("header", "false")
      .csv(paths: _*)

  /** A6: raw sequence scan for e-files or m-files of one sequence across
    * states. Cells arrive as strings (see Metadata.sequenceSchema). */
  def readSequence(spark: SparkSession, paths: Seq[String], metas: Seq[TableMeta]): DataFrame =
    spark.read
      .schema(Metadata.sequenceSchema(metas))
      .option("header", "false")
      .csv(paths: _*)

  /** A7–A9: slice one ACS table out of the sequence frame — project its
    * cell range, coerce ''/'.' to NULL, cast to double, rename to
    * `{tableId}{line:03d}`. The jam values (e.g. -555555555 in MOE
    * files) pass through as numbers, matching the reference. */
  def tableFrame(seqDf: DataFrame, meta: TableMeta): DataFrame = {
    val cellCols = (1 to meta.cells).map { i =>
      val c = col(meta.cellName(i))
      when(c === "" || c === ".", lit(null)).otherwise(c).cast("double").as(meta.cellName(i))
    }
    seqDf.select(col("stusab") +: col("logrecno") +: cellCols: _*)
  }

  /** A10: the margin-of-error twin is the same slice over the m-file
    * scan; A11: multi-state union is just the multi-path read above. */
  def moeFrame(mSeqDf: DataFrame, meta: TableMeta): DataFrame =
    tableFrame(mSeqDf, meta)

  /** Full per-sequence ingest: (estimates tables, moe tables) keyed by
    * table id, plus geoheader — the complete A3→A11 pipeline for a data
    * directory laid out like the Census distribution. */
  def ingestSequence(
      spark: SparkSession,
      dataDir: String,
      year: Int,
      span: Int,
      states: Seq[String],
      metas: Seq[TableMeta]): (DataFrame, Map[String, DataFrame], Map[String, DataFrame]) = {
    require(metas.nonEmpty, "ingestSequence: empty table metadata")
    val seqNo = metas.head.sequence
    // Real ACS lookups span many sequences whose start positions each
    // restart at 7; mixing them here would silently misalign the declared
    // CSV schema against the one sequence file actually read.
    require(metas.forall(_.sequence == seqNo),
      s"ingestSequence: metas span sequences ${metas.map(_.sequence).distinct.sorted.mkString(",")}; " +
        "group by sequence first (use ingestAll)")
    val geo = readGeoheader(spark,
      states.map(st => s"$dataDir/g$year$span$st.csv"))
    val ePaths = states.map(st => f"$dataDir/e$year$span$st$seqNo%04d000.txt")
    val mPaths = states.map(st => f"$dataDir/m$year$span$st$seqNo%04d000.txt")
    val eSeq = readSequence(spark, ePaths, metas)
    val mSeq = readSequence(spark, mPaths, metas)
    val est = metas.map(m => m.tableId.toLowerCase -> tableFrame(eSeq, m)).toMap
    val moe = metas.map(m => s"${m.tableId.toLowerCase}_moe" -> moeFrame(mSeq, m)).toMap
    (geo, est, moe)
  }

  /** Whole-lookup ingest: group tables by sequence number (a real ACS
    * release has hundreds of sequences, each its own e/m file pair per
    * state) and run the per-sequence pipeline once per sequence. The
    * geoheader is read once; table maps merge disjointly because a table
    * id lives in exactly one sequence. */
  def ingestAll(
      spark: SparkSession,
      dataDir: String,
      year: Int,
      span: Int,
      states: Seq[String],
      metas: Seq[TableMeta]): (DataFrame, Map[String, DataFrame], Map[String, DataFrame]) = {
    require(metas.nonEmpty, "ingestAll: empty table metadata")
    val geo = readGeoheader(spark,
      states.map(st => s"$dataDir/g$year$span$st.csv"))
    val bySeq = metas.groupBy(_.sequence).toSeq.sortBy(_._1)
    val perSeq = bySeq.map { case (_, seqMetas) =>
      ingestSequence(spark, dataDir, year, span, states, seqMetas)
    }
    val est = perSeq.map(_._2).reduce(_ ++ _)
    val moe = perSeq.map(_._3).reduce(_ ++ _)
    (geo, est, moe)
  }
}
