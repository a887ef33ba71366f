package graft.queries

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables.t

/** JDBC sink round-trip (SURVEY §2.B `sink_postgres`, §2.A A12/A13).
  *
  * The reference's terminal step is a bulk load into Postgres
  * (census-postgres-py `acs2pgsql.py` insert loop). Our production path is
  * `df.write.format("jdbc")` — per-partition batched INSERTs, 1000
  * executors writing in parallel — plus the COPY-pipe variant in
  * `graft.census.PgSink`. This container has no Postgres server or pgjdbc
  * jar (zero egress), so the VERIFIED round-trip here runs the identical
  * DataFrameWriter/DataFrameReader JDBC code path against embedded Derby
  * (on Spark's own classpath): write the aggregate, read it back, return
  * the read-back frame. Only the URL and dialect differ from the
  * production Postgres call; the oracle checks the round-tripped rows
  * against the same aggregate computed directly on parquet — so type
  * mapping, identifier quoting, and batch insert semantics are all under
  * the hash gate.
  *
  * Scale note: the JDBC write is embarrassingly parallel (one connection
  * per partition); the aggregate result here is small by construction, so
  * a `coalesce(1)` would also be defensible, but we keep the partitioned
  * write because that is the shape that must work at 100 TB.
  */
object SinkQueries {

  /** Per-JVM unique Derby directory: embedded Derby takes an exclusive
    * lock per database, and bench/verify/test JVMs may overlap. */
  private lazy val dbUrl: String = {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_sink_${ProcessHandle.current().pid()}"
    s"jdbc:derby:$dir;create=true"
  }

  def sinkPostgres(s: SparkSession, dir: String): DataFrame = {
    // region × nation rollup of supplier balances — small, deterministic,
    // and exercises string + long + double columns through the JDBC type
    // mapper (Derby: VARCHAR/BIGINT/DOUBLE; Postgres: TEXT/BIGINT/DOUBLE
    // PRECISION via the dialect).
    val agg = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_suppliers"),
        // exact cents accumulator: double sums are addition-order-dependent
        // and this result must hash-match the oracle after a JDBC round-trip
        round(sum(round(col("s_acctbal") * 100).cast("long")) / 100.0, 2).as("total_bal"))
    agg.write.format("jdbc")
      .option("url", dbUrl)
      .option("dbtable", "graft_sink")
      .option("batchsize", "10000")
      .mode(SaveMode.Overwrite) // A13 idempotent re-run: DROP + CREATE + load
      .save()
    s.read.format("jdbc")
      .option("url", dbUrl)
      .option("dbtable", "graft_sink")
      .load()
      .orderBy("r_name", "n_name") // JDBC scan order is unspecified
  }
}
