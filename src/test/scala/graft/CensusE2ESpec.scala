package graft

import org.apache.spark.sql.functions._
import graft.census.ScratchPg
import graft.queries.CensusQueries

/** End-to-end IngestCli drive (SURVEY §2.A A4–A14 in one pass): the
  * multi-state fixture (2 states, `_moe` twins, FIXTURES.md §B) goes
  * CLI → metadata parse → declared-schema scans → slice/coerce/rename →
  * parquet out AND live-Postgres DDL + COPY — then both sinks are read
  * back and golden-checked, including the null coercions and the MOE
  * jam value, and the Postgres side is compared value-for-value against
  * the parquet side. */
class CensusE2ESpec extends GraftSpec {

  private val outDir = "/tmp/graft_census_e2e"
  private val schema = "acs2014_5yr"

  private def psqlOne(sql: String): String = {
    import scala.sys.process._
    Seq("psql", ScratchPg.dsn, "-tAc", sql).!!.trim
  }

  test("IngestCli: fixture -> parquet + live PG COPY, both read back golden") {
    assume(ScratchPg.ensure(), "scratch postgres could not be started")
    val spark = SparkSpecBase.spark

    graft.census.IngestCli.main(Array(
      "--year", "2014", "--span", "5", "--states", "xa,xb",
      "--data-dir", CensusQueries.fixtureDir,
      "--lookup", s"${CensusQueries.fixtureDir}/ACS_5yr_Seq_Table_Number_Lookup.txt",
      "--out", outDir,
      "--pg-dsn", ScratchPg.dsn))

    // ---- parquet side: golden structure + null/jam semantics
    val geo = spark.read.parquet(s"$outDir/geoheader")
    assert(geo.count() == 10) // 5 rows x 2 states (A11 multi-state union)
    // golden pin of the geoheader CONTENT (round 7): every (state,
    // logrecno, geoid, name) row from the g20145x*.csv files must
    // survive the ingest byte-for-byte — sumlevel routing, quoted
    // names with embedded commas, and the state union all under pin
    val geoRows = geo.select("stusab", "logrecno", "geoid", "name")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3))).toSet
    assert(geoRows == Set(
      ("xa", 1, "04000US91", "State XA"),
      ("xa", 2, "14000US9100100", "Tract 1, XA"),
      ("xa", 3, "14000US9100200", "Tract 2, XA"),
      ("xa", 4, "15000US91001001", "BG 1, Tract 1, XA"),
      ("xa", 5, "15000US91002001", "BG 1, Tract 2, XA"),
      ("xb", 1, "04000US92", "State XB"),
      ("xb", 2, "14000US9200100", "Tract 1, XB"),
      ("xb", 3, "14000US9200200", "Tract 2, XB"),
      ("xb", 4, "15000US92001001", "BG 1, Tract 1, XB"),
      ("xb", 5, "15000US92002001", "BG 1, Tract 2, XB")), s"got $geoRows")
    // per-state b-table row counts pinned (5 logrecnos per state file);
    // b00003 arrives from the SECOND sequence file pair (seq 2), so its
    // presence pins the multi-sequence ingest path end-to-end
    for (tbl <- Seq("b00001", "b00001_moe", "b00002", "b00002_moe",
                    "b00003", "b00003_moe");
         st <- Seq("xa", "xb")) {
      val n = spark.read.parquet(s"$outDir/$tbl")
        .filter(col("stusab") === st).count()
      assert(n == 5, s"$tbl/$st: $n rows != 5")
    }
    val b1 = spark.read.parquet(s"$outDir/b00001")
    assert(b1.columns.toSeq == Seq("stusab", "logrecno", "b00001001", "b00001002"))
    assert(b1.count() == 10)
    // A8 null coercion: '' at (xa,2), '.' at (xb,3)
    val nulls = b1.filter(col("b00001002").isNull)
      .select("stusab", "logrecno").collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(nulls == Set(("xa", 2), ("xb", 3)))
    // A10 moe twin carries the jam value through as a number
    val jam = spark.read.parquet(s"$outDir/b00001_moe")
      .filter(col("stusab") === "xa" && col("logrecno") === 2)
      .select("b00001002").head.getDouble(0)
    assert(jam == -555555555.0)
    val b2moe = spark.read.parquet(s"$outDir/b00002_moe")
    assert(b2moe.columns.toSeq ==
      Seq("stusab", "logrecno", "b00002001", "b00002002", "b00002003"))
    // ---- sequence-2 table (B00003): schema from its own metadata, cell
    // range restarting at 7 in the seq-2 file, null coercion + jam value
    // working there exactly as in sequence 1
    val b3 = spark.read.parquet(s"$outDir/b00003")
    assert(b3.columns.toSeq == Seq("stusab", "logrecno", "b00003001", "b00003002"))
    assert(b3.count() == 10)
    val b3nulls = b3.filter(col("b00003001").isNull || col("b00003002").isNull)
      .select("stusab", "logrecno").collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(b3nulls == Set(("xa", 2), ("xb", 3)), s"got $b3nulls") // '.' and '' cells
    val b3head = b3.filter(col("stusab") === "xa" && col("logrecno") === 1)
      .select("b00003001", "b00003002").head
    assert((b3head.getDouble(0), b3head.getDouble(1)) == ((52000.0, 41000.0)))
    val b3jam = spark.read.parquet(s"$outDir/b00003_moe")
      .filter(col("stusab") === "xa" && col("logrecno") === 2)
      .select("b00003001").head.getDouble(0)
    assert(b3jam == -555555555.0)

    // ---- Postgres side: every table landed via DDL + COPY; values match
    // the parquet side exactly (count, per-column sum, null count)
    for (tbl <- Seq("geoheader", "b00001", "b00001_moe", "b00002", "b00002_moe",
                    "b00003", "b00003_moe")) {
      assert(psqlOne(s"SELECT count(*) FROM $schema.$tbl") == "10", tbl)
    }
    val dfSum = b1.agg(
      sum("b00001001").cast("long"), sum("b00001002").cast("long"),
      count(lit(1)) - count(col("b00001002"))).head
    val pg = psqlOne(
      s"""SELECT CAST(sum(b00001001) AS BIGINT), CAST(sum(b00001002) AS BIGINT),
         |count(*) - count(b00001002) FROM $schema.b00001""".stripMargin.replace("\n", " "))
    assert(pg == s"${dfSum.getLong(0)}|${dfSum.getLong(1)}|${dfSum.getLong(2)}", pg)
    val pgJam = psqlOne(
      s"SELECT b00001002 FROM $schema.b00001_moe WHERE stusab='xa' AND logrecno=2")
    assert(pgJam.toDouble == -555555555.0, pgJam)
    // A4: COMMENT ON metadata carried into the catalog
    val cmt = psqlOne(s"SELECT obj_description('$schema.b00001'::regclass)")
    assert(cmt.nonEmpty && cmt.toLowerCase.contains("population"), s"table comment: '$cmt'")

    // A13 idempotent re-run: the CLI's DROP-IF-EXISTS DDL + fresh COPY
    // leaves the identical state
    graft.census.IngestCli.main(Array(
      "--year", "2014", "--span", "5", "--states", "xa,xb",
      "--data-dir", CensusQueries.fixtureDir,
      "--lookup", s"${CensusQueries.fixtureDir}/ACS_5yr_Seq_Table_Number_Lookup.txt",
      "--pg-dsn", ScratchPg.dsn))
    assert(psqlOne(s"SELECT count(*) FROM $schema.b00001") == "10")
    assert(psqlOne(
      s"""SELECT CAST(sum(b00001001) AS BIGINT) FROM $schema.b00001""") ==
      dfSum.getLong(0).toString)
  }

  test("IngestCli --zip-dir: A2 unzip -> ingest -> rollup matches the direct path") {
    val spark = SparkSpecBase.spark
    import java.io.{File, FileOutputStream}
    import java.util.zip.{ZipEntry, ZipOutputStream}
    // build the upstream shape: ONE archive PER STATE holding that
    // state's g/e/m files (acs2pgsql.py downloads per-state zips)
    val fixture = new File(CensusQueries.fixtureDir)
    val zipDir = java.nio.file.Files.createTempDirectory("acs_zips").toFile
    for (st <- Seq("xa", "xb")) {
      val zos = new ZipOutputStream(new FileOutputStream(new File(zipDir, s"state_$st.zip")))
      try fixture.listFiles().filter(_.getName.contains(st)).sortBy(_.getName).foreach { f =>
        zos.putNextEntry(new ZipEntry(f.getName))
        java.nio.file.Files.copy(f.toPath, zos)
        zos.closeEntry()
      } finally zos.close()
    }
    val zipOut = "/tmp/graft_census_e2e_zip"
    graft.census.IngestCli.main(Array(
      "--year", "2014", "--span", "5", "--states", "xa,xb",
      "--zip-dir", zipDir.getAbsolutePath,
      "--lookup", s"${CensusQueries.fixtureDir}/ACS_5yr_Seq_Table_Number_Lookup.txt",
      "--out", zipOut))
    // rollup through the unzip path = rollup through the direct path
    val geo = spark.read.parquet(s"$zipOut/geoheader")
    assert(geo.count() == 10, "geoheader rows through the zip path")
    val b1 = spark.read.parquet(s"$zipOut/b00001")
    val roll = b1.groupBy("stusab")
      .agg(sum("b00001001").cast("long").as("s1"),
        (count(lit(1)) - count(col("b00001002"))).as("nulls"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // self-sufficient direct-path reference (the PG test above may be
    // canceled on hosts without initdb — don't depend on its output)
    val directOut = "/tmp/graft_census_e2e_direct"
    graft.census.IngestCli.main(Array(
      "--year", "2014", "--span", "5", "--states", "xa,xb",
      "--data-dir", CensusQueries.fixtureDir,
      "--lookup", s"${CensusQueries.fixtureDir}/ACS_5yr_Seq_Table_Number_Lookup.txt",
      "--out", directOut))
    val direct = spark.read.parquet(s"$directOut/b00001")
      .groupBy("stusab")
      .agg(sum("b00001001").cast("long").as("s1"),
        (count(lit(1)) - count(col("b00001002"))).as("nulls"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(roll == direct, s"zip-path rollup $roll != direct-path $direct")
    // zip-slip guard actually guards
    val evil = new File(zipDir, "evil.zip")
    val zos = new ZipOutputStream(new FileOutputStream(evil))
    try {
      zos.putNextEntry(new ZipEntry("../escape.txt"))
      zos.write("x".getBytes)
      zos.closeEntry()
    } finally zos.close()
    val dest = java.nio.file.Files.createTempDirectory("acs_slip").toFile
    intercept[IllegalArgumentException] {
      graft.census.Unzip.extractAll(evil, dest)
    }
  }
}
