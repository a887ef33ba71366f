package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.census.{Ingest, Metadata, PgSink}
import graft.queries.CensusQueries

/** Golden-output tests for the reference-equivalent ETL path
  * (SURVEY §5.2 layer 4, FIXTURES.md §B expected outputs). */
class CensusIngestSpec extends GraftSpec {

  private lazy val metas = CensusQueries.fixtureMetas
  private lazy val dir = CensusQueries.fixtureDir
  private lazy val pipeline =
    Ingest.ingestSequence(spark, dir, 2014, 5, Seq("xa", "xb"),
      metas.filter(_.sequence == 1))

  test("lookup parse: tables, cells, universe, cell titles (A3)") {
    assert(metas.map(_.tableId) == Seq("B00001", "B00002", "B00003"))
    val b1 = metas.head
    assert(b1.cells == 2 && b1.startPos == 7 && b1.sequence == 1)
    assert(b1.title == "POPULATION, TOTAL") // quoted-comma CSV field
    assert(b1.universe == "Universe:  Total population") // 0.5 row skipped as cell
    assert(b1.cellTitles.map(_.title) == Seq("Total:", "Male:"))
    assert(metas(1).cells == 3 && metas(1).startPos == 9)
    // seq-2 table: its start position restarts at 7 in its OWN file
    assert(metas(2).tableId == "B00003" && metas(2).sequence == 2 &&
      metas(2).cells == 2 && metas(2).startPos == 7)
  }

  test("metadata-derived schema (A4)") {
    val sch = metas.head.schema
    assert(sch.fieldNames.toSeq == Seq("stusab", "logrecno", "b00001001", "b00001002"))
    assert(sch("b00001001").dataType == DoubleType)
    // schema is PER SEQUENCE — feeding multi-sequence metas here would
    // interleave cell ranges (both sequences restart at position 7),
    // which is exactly what ingestSequence's require guards against
    val seqSch = Metadata.sequenceSchema(metas.filter(_.sequence == 1))
    assert(seqSch.fieldNames.length == 6 + 5)
    assert(seqSch.fieldNames.slice(6, 11).toSeq ==
      Seq("b00001001", "b00001002", "b00002001", "b00002002", "b00002003"))
    val seq2Sch = Metadata.sequenceSchema(metas.filter(_.sequence == 2))
    assert(seq2Sch.fieldNames.slice(6, 8).toSeq == Seq("b00003001", "b00003002"))
  }

  test("geoheader ingest: 10 rows, PK-unique, declared schema (A5)") {
    val geo = pipeline._1
    assert(geo.count() == 10)
    assert(geo.select("stusab", "logrecno").distinct().count() == 10)
    assert(geo.schema("logrecno").dataType == IntegerType)
    val r = geo.filter(col("stusab") === "xa" && col("logrecno") === 2).collect()(0)
    assert(r.getAs[String]("name") == "Tract 1, XA") // quoted comma survives
    assert(r.getAs[String]("sumlevel") == "140")
  }

  test("estimates slice + null coercion + rename (A6-A9)") {
    val b1 = pipeline._2("b00001")
    assert(b1.columns.toSeq == Seq("stusab", "logrecno", "b00001001", "b00001002"))
    assert(b1.count() == 10)
    val xa2 = b1.filter(col("stusab") === "xa" && col("logrecno") === 2).collect()(0)
    assert(xa2.getAs[Double]("b00001001") == 800.0)
    assert(xa2.isNullAt(xa2.fieldIndex("b00001002"))) // '' → NULL
    val b2 = pipeline._2("b00002")
    val xa2b = b2.filter(col("stusab") === "xa" && col("logrecno") === 2).collect()(0)
    assert(xa2b.isNullAt(xa2b.fieldIndex("b00002003"))) // '.' → NULL
    val xb3 = b1.filter(col("stusab") === "xb" && col("logrecno") === 3).collect()(0)
    assert(xb3.isNullAt(xb3.fieldIndex("b00001002"))) // xb '.' cell
  }

  test("MOE twin with jam value passthrough (A10-A11)") {
    val moe = pipeline._3("b00001_moe")
    assert(moe.count() == 10) // two states unioned by the multi-path scan
    val xa2 = moe.filter(col("stusab") === "xa" && col("logrecno") === 2).collect()(0)
    assert(xa2.getAs[Double]("b00001002") == -555555555.0) // jam, not NULL
  }

  test("sink DDL carries schema, PK, and COMMENT metadata (A4/A13)") {
    val ddl = PgSink.createSchemaDdl("acs2014_5yr") ++
      PgSink.createTableDdl("acs2014_5yr", metas.head, moe = false)
    val all = ddl.mkString(";\n")
    assert(all.contains("DROP SCHEMA IF EXISTS acs2014_5yr CASCADE"))
    assert(all.contains("CREATE TABLE acs2014_5yr.b00001"))
    assert(all.contains("b00001001 DOUBLE PRECISION"))
    assert(all.contains("PRIMARY KEY (stusab, logrecno)"))
    assert(all.contains("COMMENT ON TABLE acs2014_5yr.b00001 IS 'POPULATION, TOTAL (Universe:  Total population)'"))
    assert(all.contains("COMMENT ON COLUMN acs2014_5yr.b00001.b00001002 IS 'Male:'"))
  }

  test("multi-sequence lookup: ingestAll groups by sequence; ingestSequence rejects a mixed batch") {
    // Two sequences whose start positions both begin at 7 — the real ACS
    // layout that silently misaligns if all metas are fed to one
    // sequenceSchema (cells would interleave across files).
    val lookup =
      """File ID,Table ID,Sequence Number,Line Number,Start Position,Total Cells in Table,Total Cells in Sequence,Table Title,Subject Area
        |ACSSF,B10001,1,,7,2 CELLS,2,AAA,S
        |ACSSF,B10001,1,1,,,,Total:,
        |ACSSF,B10001,1,2,,,,Male:,
        |ACSSF,B20001,2,,7,1 CELLS,1,BBB,S
        |ACSSF,B20001,2,1,,,,Total:,
        |""".stripMargin
    val metas = Metadata.parseLookup(lookup.linesIterator)
    assert(metas.map(_.sequence) == Seq(1, 2))

    val tmp = java.nio.file.Files.createTempDirectory("acs_multiseq").toFile
    tmp.deleteOnExit()
    def write(name: String, text: String): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(tmp, name))
      try w.write(text) finally w.close()
    }
    write("g20145xa.csv", "ACSSF,xa,040,00,1,04000US91,State XA\n")
    write("e20145xa0001000.txt", "ACSSF,2014e5,xa,000,1,1,11,12\n")
    write("m20145xa0001000.txt", "ACSSF,2014m5,xa,000,1,1,1,2\n")
    write("e20145xa0002000.txt", "ACSSF,2014e5,xa,000,2,1,77\n")
    write("m20145xa0002000.txt", "ACSSF,2014m5,xa,000,2,1,7\n")

    val (geo, est, moe) =
      Ingest.ingestAll(spark, tmp.getAbsolutePath, 2014, 5, Seq("xa"), metas)
    assert(geo.count() == 1)
    assert(est.keySet == Set("b10001", "b20001"))
    assert(moe.keySet == Set("b10001_moe", "b20001_moe"))
    val r1 = est("b10001").collect()(0)
    assert(r1.getAs[Double]("b10001001") == 11.0 && r1.getAs[Double]("b10001002") == 12.0)
    // seq-2 table reads the seq-2 file, its cell range restarting at 7
    val r2 = est("b20001").collect()(0)
    assert(r2.getAs[Double]("b20001001") == 77.0)
    assert(moe("b20001_moe").collect()(0).getAs[Double]("b20001001") == 7.0)

    val err = intercept[IllegalArgumentException] {
      Ingest.ingestSequence(spark, tmp.getAbsolutePath, 2014, 5, Seq("xa"), metas)
    }
    assert(err.getMessage.contains("group by sequence"))
  }

  test("ingest_census_csv consumer query golden values") {
    val got = CensusQueries.ingestCensusCsv(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    // per-sumlevel totals hand-computed from the fixture e-files
    assert(got.map(_._1) == Seq("040", "140", "150"))
    assert(got.map(_._2) == Seq(2L, 4L, 4L))
    assert(got.map(_._3) == Seq(1200.0 + 2200.0, 800.0 + 650.0 + 1800.0 + 1650.0,
      400.0 + 350.0 + 1400.0 + 1350.0))
  }
}
