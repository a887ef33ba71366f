package graft.census

import scala.sys.process._

/** Scratch PostgreSQL 15 lifecycle for the COPY-pipe sink path
  * (BASELINE.json's "JDBC write to Postgres" north star; upstream:
  * census-postgres-py loads into a live Postgres the same way).
  *
  * This container ships the full PG 15 server binaries but no pgjdbc
  * jar, so the live round-trip runs over the COPY wire protocol via
  * `psql` (the reference's own bulk-load transport) against a locally
  * `initdb`-ed cluster on a unix socket — no TCP listener, no
  * credentials, fully hermetic under /tmp. The cluster is created once
  * per machine and reused across JVMs (Verify, Bench, ScalaTest);
  * `ensure()` is idempotent and race-tolerant (first caller wins,
  * others see the live socket).
  *
  * At production scale this object disappears: `PgSink.writeCopy`
  * takes any DSN, and 1000 executors each hold one COPY stream into
  * the real warehouse instance. */
object ScratchPg {
  private val dataDir = "/tmp/graft_pgdata"
  private val sockDir = "/tmp/graft_pgsock"
  private val port = 54334
  val dsn = s"host=$sockDir port=$port dbname=postgres user=postgres"

  private def sh(cmd: String): Int = Seq("bash", "-c", cmd).!

  private def alive(): Boolean =
    sh(s"""psql "$dsn" -c 'select 1' >/dev/null 2>&1""") == 0

  /** Start (or observe already-running) scratch PG; true iff reachable.
    * Runs initdb/pg_ctl as the postgres system user — the server
    * refuses to run as root by design. */
  def ensure(): Boolean = synchronized {
    if (alive()) return true
    sh(s"rm -rf $dataDir $sockDir && mkdir -p $dataDir $sockDir && chown postgres:postgres $dataDir $sockDir")
    if (sh(s"""cd /tmp && su postgres -s /bin/bash -c "initdb -D $dataDir" >/dev/null 2>&1""") != 0)
      return alive() // lost an initdb race: the winner's cluster may be up
    sh(s"""cd /tmp && su postgres -s /bin/bash -c "pg_ctl -D $dataDir -o '-p $port -k $sockDir -c listen_addresses=' -l $dataDir/pg.log start" >/dev/null 2>&1""")
    // pg_ctl returns before the socket accepts; poll briefly
    (0 until 20).exists { _ => if (alive()) true else { Thread.sleep(250); false } }
  }

  /** Execute SQL statements (DDL etc.) via psql; throws on failure. */
  def exec(sql: String): Unit = {
    val out = new StringBuilder
    val code = Seq("psql", dsn, "-v", "ON_ERROR_STOP=1", "-c", sql) !
      ProcessLogger(out.append(_).append('\n'), out.append(_).append('\n'))
    if (code != 0) sys.error(s"psql exec failed ($code): $out\nsql: $sql")
  }

  /** Run a query and return rows as COPY-text fields (tab-separated,
    * "\\N" for NULL — same escaping PgSink.copyLine writes).
    *
    * `expectCols > 0` arity-checks every row and RETRIES the read (the
    * query side is read-only) up to twice: a freshly-started scratch
    * server has produced one observed truncated COPY stream under heavy
    * host load, and the old code crashed downstream on `f(1)` of a
    * 1-field row. Still-malformed output after the retries errors
    * loudly — silently dropping rows would fake a row-count mismatch
    * the oracle gate attributes to the engine. */
  def copyOut(sql: String, expectCols: Int = -1): Seq[Array[String]] = {
    def once(): Seq[Array[String]] = {
      val out = new java.io.ByteArrayOutputStream
      val err = new StringBuilder
      val code = (Seq("psql", dsn, "-v", "ON_ERROR_STOP=1",
        "-c", s"COPY ($sql) TO STDOUT") #> out) ! ProcessLogger(_ => (), err.append(_).append('\n'))
      if (code != 0) sys.error(s"psql COPY TO failed ($code): $err\nsql: $sql")
      out.toString("UTF-8").split("\n", -1).toSeq
        .filter(_.nonEmpty).map(_.split("\t", -1))
    }
    var rows = once()
    var retries = 0
    while (expectCols > 0 && retries < 2 && rows.exists(_.length != expectCols)) {
      Thread.sleep(500)
      retries += 1
      rows = once()
    }
    if (expectCols > 0 && rows.exists(_.length != expectCols))
      sys.error(s"COPY TO returned malformed rows (want $expectCols fields): " +
        rows.filter(_.length != expectCols).take(3).map(_.mkString("|")).mkString(" ; "))
    rows
  }
}
