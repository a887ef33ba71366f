package graft.census

import org.apache.spark.sql.SparkSession
import scala.io.Source

/** CLI entry point mirroring the reference's argparse surface
  * (SURVEY §2.A A14, upstream:censuspgsql/acs2pgsql.py::main):
  *
  *   runMain graft.census.IngestCli \
  *     --year 2014 --span 5 --states xa,xb \
  *     --data-dir src/main/resources/acs \
  *     --lookup src/main/resources/acs/ACS_5yr_Seq_Table_Number_Lookup.txt \
  *     --out /tmp/acs_out            # parquet output dir
  *     [--zip-dir /path/to/archives]      # A2: unzip *.zip first, use as data dir
  *     [--pg-dsn "host=... dbname=..."]   # optional COPY-pipe sink
  *
  * The HTTP download stage (A1) is out of scope at runtime (zero
  * egress); archives arrive out-of-band. `--zip-dir` runs the A2
  * extraction (`Unzip.stageZipDir` — the reference's zipfile
  * extractall) and overrides `--data-dir`; without it the CLI starts
  * from an already-extracted local data dir, exactly as the driver's
  * testdata pipeline does.
  */
object IngestCli {

  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val year = opts.getOrElse("--year", "2014").toInt
    val span = opts.getOrElse("--span", "5").toInt
    val states = opts.getOrElse("--states", "xa,xb").split(",").toSeq
    val dataDir = opts.get("--zip-dir") match {
      case Some(zd) => Unzip.stageZipDir(zd) // A2: extract, then ingest from the staging dir
      case None     => opts("--data-dir")
    }
    val lookup = opts("--lookup")
    val out = opts.get("--out")
    val dsn = opts.get("--pg-dsn")

    // reuse an already-active session (e.g. when driven from a test JVM)
    // and only own the lifecycle of one we created ourselves
    val hadSession = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession).isDefined
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val src = Source.fromFile(lookup)
    val metas = try Metadata.parseLookup(src.getLines()) finally src.close()
    val schemaName = s"acs${year}_${span}yr"
    // group by sequence inside: a real lookup spans many sequences whose
    // cell start positions each restart at 7
    val (geo, est, moe) = Ingest.ingestAll(spark, dataDir, year, span, states, metas)

    val ddl = PgSink.createSchemaDdl(schemaName) ++
      PgSink.geoheaderDdl(schemaName) ++
      metas.flatMap(m =>
        PgSink.createTableDdl(schemaName, m, moe = false) ++
          PgSink.createTableDdl(schemaName, m, moe = true))
    println(ddl.mkString(";\n"))

    val all = Map("geoheader" -> geo) ++ est ++ moe
    out.foreach { dir =>
      all.foreach { case (name, df) =>
        df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name")
        println(s"[ingest] wrote $dir/$name (${df.count()} rows)")
      }
    }
    dsn.foreach { d =>
      // A4/A13: execute the idempotent DDL (DROP IF EXISTS + CREATE +
      // COMMENT ON), then bulk-load every table through the COPY pipe —
      // the reference's terminal step, end to end
      PgSink.execSql(d, ddl)
      all.foreach { case (name, df) => PgSink.writeCopy(df, d, s"$schemaName.$name") }
    }
    if (!hadSession) spark.stop()
  }
}
