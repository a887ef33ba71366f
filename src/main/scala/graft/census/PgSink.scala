package graft.census

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Postgres sink (SURVEY §2.A A12/A13, BASELINE.json's "JDBC write to
  * Postgres from DataFrame" north star).
  *
  * Two write paths:
  *  1. `writeJdbc` — the standard `df.write.format("jdbc")` path with
  *     per-partition batched inserts. GATED: no Postgres JDBC driver jar
  *     exists in this environment (SURVEY §0), so the call throws a
  *     clear error here but is the production path on a real cluster.
  *  2. `writeCopy` — `foreachPartition` piping COPY FROM STDIN text
  *     format through `psql`, mirroring the reference's own bulk-load
  *     approach. Each partition opens one COPY — at 1000 executors
  *     that's 1000 parallel COPY streams, the standard high-throughput
  *     PG ingest pattern.
  *
  * DDL (A4/A13): generated as strings (schema, tables, comments, drop-
  * if-exists) and executed by whichever path is live; mirrors the
  * reference's SQLAlchemy DDL + COMMENT ON metadata carry-through.
  */
object PgSink {

  def createSchemaDdl(schema: String): Seq[String] = Seq(
    s"DROP SCHEMA IF EXISTS $schema CASCADE",
    s"CREATE SCHEMA $schema")

  private def pgType(dt: DataType): String = dt match {
    case StringType => "TEXT"
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case DoubleType => "DOUBLE PRECISION"
    case _: DecimalType => "NUMERIC"
    case TimestampType => "TIMESTAMP"
    case other => sys.error(s"unmapped sink type $other")
  }

  /** CREATE TABLE + PK + COMMENT ON statements for one ACS table. */
  def createTableDdl(schema: String, meta: TableMeta, moe: Boolean): Seq[String] = {
    val name = meta.tableId.toLowerCase + (if (moe) "_moe" else "")
    val cols = meta.schema.fields.map(f => s"${f.name} ${pgType(f.dataType)}").mkString(", ")
    val comment = meta.title.replace("'", "''") +
      (if (meta.universe.nonEmpty) s" (${meta.universe.replace("'", "''")})" else "")
    Seq(
      s"DROP TABLE IF EXISTS $schema.$name",
      s"CREATE TABLE $schema.$name ($cols, PRIMARY KEY (stusab, logrecno))",
      s"COMMENT ON TABLE $schema.$name IS '$comment'") ++
      meta.cellTitles.map(c =>
        s"COMMENT ON COLUMN $schema.$name.${meta.cellName(c.line)} IS '${c.title.replace("'", "''")}'")
  }

  /** CREATE TABLE for the geoheader (declared schema, PK on the same
    * (stusab, logrecno) join key the ACS tables carry). */
  def geoheaderDdl(schema: String): Seq[String] = {
    val cols = graft.census.Metadata.geoheaderSchema.fields
      .map(f => s"${f.name} ${pgType(f.dataType)}").mkString(", ")
    Seq(
      s"DROP TABLE IF EXISTS $schema.geoheader",
      s"CREATE TABLE $schema.geoheader ($cols, PRIMARY KEY (stusab, logrecno))")
  }

  /** Execute DDL/SQL statements against a DSN via psql; throws with the
    * server's error text on failure. */
  def execSql(dsn: String, statements: Seq[String]): Unit = {
    import scala.sys.process._
    val out = new StringBuilder
    val code = Seq("psql", dsn, "-v", "ON_ERROR_STOP=1",
      "-c", statements.mkString(";\n")) !
      ProcessLogger(out.append(_).append('\n'), out.append(_).append('\n'))
    if (code != 0) sys.error(s"psql DDL failed ($code): $out")
  }

  /** One row in COPY text format: tab-separated, NULL as \N, control
    * chars escaped per the COPY TEXT spec. */
  private[graft] def copyLine(row: org.apache.spark.sql.Row): String =
    (0 until row.length).map { i =>
      if (row.isNullAt(i)) "\\N"
      else row.get(i).toString
        .replace("\\", "\\\\").replace("\t", "\\t")
        .replace("\n", "\\n").replace("\r", "\\r")
    }.mkString("\t")

  /** COPY-pipe bulk load: per partition, one `psql -c "COPY ... FROM
    * STDIN"` child process fed the partition's rows. psql output is
    * drained on a background thread while rows are written: reading it
    * only after waitFor() deadlocks both processes once psql emits more
    * than the ~64KB pipe buffer of notices/errors mid-write, and an
    * early psql exit would otherwise surface as an opaque broken-pipe
    * IOException instead of the COPY error text. */
  def writeCopy(df: DataFrame, dsn: String, table: String): Unit = {
    df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.hasNext) {
        val pb = new ProcessBuilder("psql", dsn, "-v", "ON_ERROR_STOP=1",
          "-c", s"COPY $table FROM STDIN")
        pb.redirectErrorStream(true)
        val p = pb.start()
        val drained = new java.io.ByteArrayOutputStream()
        val drainer = new Thread(() => {
          try p.getInputStream.transferTo(drained)
          catch { case _: java.io.IOException => () }
        }, s"psql-drain-$table")
        drainer.setDaemon(true)
        drainer.start()
        def psqlText(): String = {
          drainer.join(5000)
          drained.toString("UTF-8").trim
        }
        val out = new java.io.BufferedWriter(
          new java.io.OutputStreamWriter(p.getOutputStream, "UTF-8"))
        try {
          try rows.foreach { r => out.write(copyLine(r)); out.write("\n") }
          finally out.close()
        } catch {
          case e: java.io.IOException =>
            // psql died mid-COPY: attach its error text, not the broken pipe
            p.waitFor()
            sys.error(s"psql COPY into $table aborted (${e.getMessage}): ${psqlText()}")
        }
        val code = p.waitFor()
        if (code != 0) sys.error(s"psql COPY into $table failed ($code): ${psqlText()}")
      }
    }
  }

  /** Standard JDBC batch write (production path; needs a pgjdbc jar on
    * the classpath, absent in this container — SURVEY §0). */
  def writeJdbc(df: DataFrame, url: String, table: String, batchSize: Int = 10000): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", "org.postgresql.Driver")
      .option("batchsize", batchSize.toString)
      .mode("append")
      .save()
}
