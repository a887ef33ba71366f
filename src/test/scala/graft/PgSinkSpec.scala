package graft

import scala.sys.process._
import graft.census.PgSink

/** Postgres sink (SURVEY §2.B sink_postgres): COPY text formatting is
  * unit-tested always; the live end-to-end COPY smoke runs against a
  * scratch initdb'd PG 15 when the local postgres binaries can start
  * one (they exist in this container — SURVEY §0), else it cancels. */
class PgSinkSpec extends GraftSpec {

  test("COPY text formatting: tabs, nulls, escapes") {
    import SparkSpecBase.spark.implicits._
    val df = Seq(("a\tb", Some(1.5)), ("line\nbreak", None)).toDF("s", "d")
    val lines = df.collect().map(PgSink.copyLine)
    assert(lines(0) == "a\\tb\t1.5")
    assert(lines(1) == "line\\nbreak\t\\N")
  }

  // scratch-PG lifecycle lives in main code now (graft.census.ScratchPg)
  // because sink_postgres_copy is a GRADED query, not only a test
  private def dsn = graft.census.ScratchPg.dsn
  private def startPg(): Boolean = graft.census.ScratchPg.ensure()

  private def sh(cmd: String): Int = Seq("bash", "-c", cmd).! // exit code

  test("sink_postgres query: JDBC write+readback round-trip preserves rows") {
    val df = graft.queries.SinkQueries.sinkPostgres(SparkSpecBase.spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // schema survives the JDBC type mapper both ways
    assert(df.schema.fieldNames.toSeq == Seq("r_name", "n_name", "n_suppliers", "total_bal"))
    // idempotent re-run (A13): overwrite mode drops + reloads, same result
    val again = graft.queries.SinkQueries.sinkPostgres(SparkSpecBase.spark, "/root/testdata/sf0.001").collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("live COPY-pipe sink round-trips a DataFrame into Postgres") {
    assume(startPg(), "scratch postgres could not be started")
    import SparkSpecBase.spark.implicits._
    sh(s"""psql "$dsn" -c 'DROP TABLE IF EXISTS graft_sink; CREATE TABLE graft_sink(k bigint, v text, x double precision)'""")
    val rows: Seq[(Long, String, java.lang.Double)] = (1 to 100).map(i =>
      (i.toLong, if (i % 10 == 0) null else s"v$i",
        if (i % 7 == 0) null else java.lang.Double.valueOf(i + 0.25)))
    val df = rows.toDF("k", "v", "x").repartition(3)
    df.collect() // materialize input before the sink runs
    PgSink.writeCopy(df, dsn, "graft_sink")
    val out = Seq("bash", "-c",
      s"""psql "$dsn" -tAc 'SELECT count(*), count(v), count(x), sum(k) FROM graft_sink'""").!!.trim
    assert(out == "100|90|86|5050", s"got: $out")
  }

  test("sink_postgres_copy: live PG round-trip matches the direct aggregate") {
    assume(startPg(), "scratch postgres could not be started")
    val viaPg = graft.queries.SinkQueries
      .sinkPostgresCopy(SparkSpecBase.spark, "/root/testdata/sf0.001")
    val direct = graft.queries.SinkQueries
      .sinkPostgres(SparkSpecBase.spark, "/root/testdata/sf0.001")
    // the PG-transited rows equal the Derby-transited rows equal (via the
    // driver oracle) the parquet-direct aggregate — same values, same order
    assert(viaPg.collect().map(_.toString).toSeq ==
      direct.collect().map(_.toString).toSeq)
    // idempotent re-run (A13): DROP + CREATE + COPY again, same result
    val again = graft.queries.SinkQueries
      .sinkPostgresCopy(SparkSpecBase.spark, "/root/testdata/sf0.001")
    assert(again.collect().map(_.toString).toSeq ==
      viaPg.collect().map(_.toString).toSeq)
  }
}
