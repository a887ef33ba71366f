package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables.t

/** Source-format round-trips (SURVEY §2.B `source_*_roundtrip`).
  *
  * The reference's universe is CSV in → Postgres out; a user switching to
  * this engine also needs the interchange formats Spark supports natively.
  * Each query writes a bounded slice of driver testdata to the format
  * under test, reads it back through the matching `DataFrameReader`, and
  * returns an aggregate of the read-back rows — so serializer fidelity
  * (timestamp encoding, float text round-trip, quoting/escaping, nulls)
  * sits under the driver's hash gate against a parquet-side oracle, the
  * same discipline as the JDBC sink.
  *
  * Scale notes: all three writers/readers are splittable, partition-
  * parallel paths (JSON/CSV line-split, ORC striped) — the write is
  * `mode(Overwrite)` into a per-JVM scratch dir, one file per input
  * partition, exactly how a 1000-executor export would lay out. Readers
  * get explicit schemas: schema inference is a full extra pass over the
  * data and is the first thing to turn off at 100 TB.
  */
object SourceQueries {

  private lazy val scratch =
    s"${sys.props("java.io.tmpdir")}/graft_src_${ProcessHandle.current().pid()}"

  /** JSON lines: timestamps (ISO-8601 micros) and doubles (shortest
    * round-trip text) must survive write→read bit-for-bit. */
  def sourceJsonRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").filter(col("event_id") % 20 === 0)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val path = s"$scratch/events_json"
    // default JSON timestampFormat truncates to milliseconds — spell out
    // the full-microsecond format on BOTH sides or sub-ms precision is
    // silently lost in transit
    val tsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    ev.write.mode("overwrite").option("timestampFormat", tsFmt).json(path)
    s.read.schema(ev.schema).option("timestampFormat", tsFmt).json(path)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        // exact per-row cents then integer sum: double SUM is partition-
        // order-dependent, but round(v*100)→long per row is stable
        sum(round(col("value") * 100).cast("long")).as("value_cents"),
        // µs epochs, not raw timestamps, in output (oracle convention —
        // DuckDB sees the parquet ts as TIMESTAMP_NS)
        unix_micros(min(col("ts"))).as("first_ts_us"),
        unix_micros(max(col("ts"))).as("last_ts_us"))
      .orderBy("event_type")
  }

  /** ORC: the columnar interchange twin of parquet — decimals, strings,
    * dates through the vectorized ORC reader. */
  def sourceOrcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").filter(col("l_orderkey") % 10 === 0)
      .select("l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice", "l_shipdate")
    val path = s"$scratch/lineitem_orc"
    li.write.mode("overwrite").orc(path)
    s.read.schema(li.schema).orc(path)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("l_quantity") * 100).cast("long")).as("qty_cents"),
        max(col("l_shipdate")).as("last_ship"))
      .orderBy("l_returnflag")
  }

  /** Parquet compression-codec matrix: the same slice written with
    * zstd, snappy, and gzip, each read back and aggregated — all three
    * rows must carry IDENTICAL values, which puts every codec's
    * encode+decode path under the hash gate. Codec choice is a
    * first-order 100 TB knob (zstd ≈ gzip ratio at snappy-like decode
    * speed — the modern default; snappy for CPU-bound scans, gzip for
    * cold archives). */
  def sinkCodecRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val slice = t(s, dir, "orders").filter(col("o_orderkey") % 4 === 0)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    val frames = Seq("gzip", "snappy", "zstd").map { codec =>
      val path = s"$scratch/orders_$codec"
      slice.write.mode("overwrite").option("compression", codec).parquet(path)
      s.read.parquet(path)
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .select(lit(codec).as("codec"), col("n"), col("cents"))
    }
    frames.reduce(_ unionByName _).orderBy("codec")
  }

  /** Raw text lines (`write.text` / `read.text`) — the format every web
    * corpus arrives in before it has a schema. One column in, one line
    * out, split-parallel on read; the aggregate after the round-trip
    * pins byte-for-byte line fidelity (lengths and leading chars
    * re-derived from the read-back lines). Line formats can't carry
    * embedded newlines — real ingest sanitizes first (the synthetic
    * corpus is newline-free by construction). */
  def sourceTextRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .filter(col("doc_id") % 5 === 0)
      .select(col("text"))
    val path = s"$scratch/documents_text"
    d.write.mode("overwrite").text(path)
    s.read.text(path)
      .select(substring(col("value"), 1, 1).as("c1"), length(col("value")).as("len"))
      .groupBy("c1")
      .agg(
        count(lit(1)).as("n"),
        sum(col("len")).cast("long").as("total_chars"),
        countDistinct(col("len")).as("n_lengths"))
      .orderBy("c1")
  }

  /** Date-partitioned parquet layout — THE table design partition
    * pruning depends on at 100 TB: `partitionBy("day")` writes one
    * directory per day, and a day-range filter on read touches only
    * those directories (PartitionFilters in the scan, pinned in
    * PlanShapeSpec) — every other day's data is never opened. The
    * `repartition(day)` before the write is the small-files discipline:
    * without it every shuffle partition writes a file into every day
    * directory (tasks × days files); with it, one file per day. */
  def sinkPartitionedParquet(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .withColumn("day", to_date(col("ts")))
      .select("event_id", "ts", "user_id", "event_type", "value", "day")
    val path = s"$scratch/events_byday"
    ev.repartition(col("day"))
      .write.mode("overwrite").partitionBy("day").parquet(path)
    s.read.parquet(path)
      .filter(col("day").between(lit("2024-01-02"), lit("2024-01-04")))
      .groupBy("day", "event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .orderBy("day", "event_type")
  }

  /** Range-clustered sorted-run layout — the second physical-design axis
    * next to directory partitioning: `repartitionByRange(shipdate)` gives
    * each output file a DISJOINT date range (asserted in SourcesSpec) and
    * `sortWithinPartitions` orders rows inside, so every parquet
    * row-group's min/max stats span a narrow band and a date-band filter
    * skips almost all of them at scan time. Directory partitioning prunes
    * coarse (per-day dirs); sorted runs prune fine (row groups within a
    * file) — at 100 TB you want both. The aggregate after the banded
    * read-back is hash-checked against the raw parquet. */
  def sinkSortedRuns(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select("l_orderkey", "l_shipdate", "l_quantity", "l_returnflag")
    val path = s"$scratch/lineitem_sorted"
    // run count scales with the INPUT, floored at 8: a fixed 8 runs
    // meant 8 tasks each sorting n/8 rows — at sf100 that is 75M rows
    // of sort spill per task on a 32-core host (measured 16.6× on 10×
    // data, the suite's last super-linear row). One run per ~256 MB of
    // source parquet keeps per-task sort memory flat at any scale; the
    // floor preserves the graded-SF layout (and the disjoint-range law
    // SourcesSpec pins is count-agnostic).
    val srcBytes = graft.operators.Inputs.bytes(li)
    val nRuns = math.max(8L, srcBytes / (256L << 20)).toInt
    li.repartitionByRange(nRuns, col("l_shipdate"))
      .sortWithinPartitions("l_shipdate")
      .write.mode("overwrite").parquet(path)
    s.read.parquet(path)
      .filter(col("l_shipdate") >= lit("1996-03-01") && col("l_shipdate") < lit("1996-06-01"))
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("l_quantity") * 100).cast("long")).as("qty_cents"),
        min(col("l_shipdate")).as("first_ship"),
        max(col("l_shipdate")).as("last_ship"))
      .orderBy("l_returnflag")
  }

  /** CSV with header + explicit read schema: quoting (names may embed
    * the delimiter), null round-trip, and typed re-parse. */
  def sourceCsvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal", "c_nationkey")
    val path = s"$scratch/customer_csv"
    c.write.mode("overwrite").option("header", "true").csv(path)
    s.read.schema(c.schema).option("header", "true").csv(path)
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("c_acctbal") * 100).cast("long")).as("bal_cents"),
        countDistinct(col("c_nationkey")).as("n_nations"))
      .orderBy("c_mktsegment")
  }

  /** Corrupt-record RECOVERY on ingest: a CSV staged with a
    * deterministic 10% of malformed lines (wrong arity + unparseable
    * key) is read back in PERMISSIVE mode with an explicit
    * `_corrupt_record` column — the production posture for 100 TB of
    * third-party data, where FAILFAST would kill the job on row one
    * and DROPMALFORMED would silently lose data. The report proves the
    * engine kept every good row, quarantined every bad one, and lost
    * nothing: counts + exact sums over the good rows, corrupt count
    * equal to the planted 10%. Oracle recomputes the expectation
    * arithmetically from the same construction. */
  def sourceCsvPermissive(s: SparkSession, dir: String): DataFrame = {
    val path = s"${sys.props("java.io.tmpdir")}/graft_src_${ProcessHandle.current().pid()}/customer_corrupt_csv"
    val base = t(s, dir, "customer").filter(col("c_custkey") < 2000)
    base.select(
        when(pmod(col("c_custkey"), lit(10L)) === 0,
          concat(lit("oops,"), col("c_custkey").cast("string")))
          .otherwise(concat_ws(",", col("c_custkey"), col("c_name"),
            round(col("c_acctbal") * 100).cast("long")))
          .as("value"))
      .write.mode("overwrite").text(path)
    val schema = "c_custkey LONG, c_name STRING, bal_cents LONG, _corrupt_record STRING"
    s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("_corrupt_record")).as("n_corrupt"),
        count(when(col("_corrupt_record").isNull, 1)).as("n_good"),
        sum(when(col("_corrupt_record").isNull, col("bal_cents"))).as("good_cents"),
        max(when(col("_corrupt_record").isNull, col("c_custkey"))).as("max_good_key"))
  }

  /** JSON-lines twin of the CSV quarantine: 10% of the staged lines are
    * truncated mid-object (the classic upstream-writer-crashed corpus
    * wound), read back PERMISSIVE with `_corrupt_record`. One JSON
    * subtlety the CSV path doesn't have: PERMISSIVE may retain fields
    * parsed BEFORE the failure point on a corrupt row, so every good-row
    * statistic filters on `_corrupt_record IS NULL`, never on a field
    * being non-null. Oracle recomputes the expectation arithmetically
    * from the same construction rule. */
  def sourceJsonPermissive(s: SparkSession, dir: String): DataFrame = {
    val path = s"$scratch/orders_corrupt_json"
    t(s, dir, "orders").filter(col("o_orderkey") < 4000)
      .select(
        when(pmod(col("o_orderkey"), lit(10L)) === 0, lit("{\"o_orderkey\":"))
          .otherwise(to_json(struct(col("o_orderkey"), col("o_orderstatus"),
            (Num.money(col("o_totalprice")) * 100).cast("long").as("cents"))))
          .as("value"))
      .write.mode("overwrite").text(path)
    val schema = "o_orderkey LONG, o_orderstatus STRING, cents LONG, _corrupt_record STRING"
    s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("_corrupt_record")).as("n_corrupt"),
        count(when(col("_corrupt_record").isNull, 1)).as("n_good"),
        sum(when(col("_corrupt_record").isNull, col("cents"))).as("good_cents"),
        max(when(col("_corrupt_record").isNull, col("o_orderkey"))).as("max_good_key"))
  }

  /** PARALLEL + PUSHED-DOWN JDBC read: an orders slice is staged into
    * embedded Derby once, then read back through the JDBC source with
    * (a) `partitionColumn/numPartitions` — Spark issues 4 concurrent
    * range-bounded SELECTs, the only way a JDBC scan parallelizes on a
    * 1000-executor cluster — and (b) filters that reach the database as
    * WHERE clauses (`PushedFilters` pinned in SourcesSpec), so the
    * warehouse never ships rows the query drops. Bounds need not be
    * exact (rows outside land in the edge partitions); the oracle is
    * the same aggregate straight off parquet. */
  def sourceJdbcPushdown(s: SparkSession, dir: String): DataFrame = {
    val url = {
      val d = s"${sys.props("java.io.tmpdir")}/graft_jdbc_src_${ProcessHandle.current().pid()}"
      s"jdbc:derby:$d;create=true"
    }
    t(s, dir, "orders")
      .filter(col("o_custkey") < 500)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
      .write.format("jdbc")
      .option("url", url).option("dbtable", "graft_src")
      // Derby's default string mapping is CLOB, which its SQL layer
      // refuses to compare — the pushed WHERE needs VARCHAR columns
      .option("createTableColumnTypes",
        "o_orderstatus VARCHAR(2), o_orderpriority VARCHAR(20)")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).save()
    s.read.format("jdbc")
      .option("url", url).option("dbtable", "graft_src")
      .option("partitionColumn", "o_orderkey")
      .option("lowerBound", "0").option("upperBound", "6000000")
      .option("numPartitions", "4")
      .load()
      .filter(col("o_orderstatus") === "O" && col("o_totalprice") > 50000.0)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .orderBy("o_orderpriority")
  }

  /** `binaryFile` source — the opaque-bytes entry path for multimodal
    * corpora (SURVEY north star: images/audio arrive as FILES; the
    * engine's first touch is path + length + content). One .bin file per
    * sampled document is written by executor-side IO (binaryFile is a
    * read-only source — in production the files come from outside the
    * engine), the directory is read back through
    * `format("binaryFile")` with a glob filter, doc identity is
    * recovered from the path, and byte-for-byte fidelity is
    * verdict-checked against the parquet-side truth: lengths AND exact
    * content bytes, under the driver's hash gate.
    *
    * Scale: binaryFile lists the directory distributed and assigns
    * whole files to partitions (files never split — the right unit for
    * opaque media), with `maxPartitionBytes` packing small files; the
    * identity join is on the extracted key, and the verdict aggregate
    * is map-side combined. The local scratch dir stands in for the
    * shared object store a 1000-executor read would list. */
  def sourceBinaryfile(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").filter(col("doc_id") < 100)
      .select(col("doc_id"), col("text"))
    val path = s"$scratch/docs_bin"
    val root = new java.io.File(path)
    if (root.exists) root.listFiles.foreach(_.delete()) // overwrite semantics
    root.mkdirs()
    docs.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      it.foreach { r =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(path, f"doc_${r.getLong(0)}%05d.bin"),
          r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
    s.read.format("binaryFile").option("pathGlobFilter", "*.bin").load(path)
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1).cast("long").as("doc_id"),
        col("length"), col("content"))
      .join(docs, Seq("doc_id"))
      .agg(
        count(lit(1)).as("n_files"),
        count_if(col("length") === octet_length(col("text"))).as("n_len_ok"),
        count_if(col("content") === encode(col("text"), "UTF-8")).as("n_content_ok"),
        sum(col("length")).as("total_bytes"))
  }

  /** PARQUET FOOTER / ZONE-MAP READ — manifest-level planning made a
    * graded query: every lakehouse optimizer answers count(*) and
    * min/max from FOOTER METADATA without scanning a data page, and
    * this operator does exactly that — executors parse the orders
    * footers (parquet-hadoop, whole-file units via binaryFile listing,
    * content column pruned so only paths ship) and emit the
    * footer-derived row count, o_orderkey zone-map min/max, and column
    * count. The oracle recomputes the same four values FROM THE DATA —
    * so the hash gate proves footer ≡ content, the invariant every
    * stats-based planner silently bets on.
    *
    * Scale: footer parse is KBs per file regardless of data size — the
    * 100 TB shape is 1000 executors each reading footers of their
    * file-list slice, which is precisely this plan; no data page is
    * ever touched (binaryFile prunes `content`). */
  def sourceParquetFooter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val paths = s.read.format("binaryFile")
      .option("pathGlobFilter", "*.parquet")
      .load(s"$dir/orders.parquet")
      .select(col("path")).as[String]
    val perGroup = paths.mapPartitions { it =>
      val conf = new org.apache.hadoop.conf.Configuration()
      it.flatMap { p =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(p), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          import scala.jdk.CollectionConverters._
          val nCols = r.getFooter.getFileMetaData.getSchema.getFieldCount.toLong
          r.getFooter.getBlocks.asScala.map { b =>
            val okey = b.getColumns.asScala
              .find(_.getPath.toDotString == "o_orderkey").get
            val st = okey.getStatistics
            (b.getRowCount,
              st.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
              st.genericGetMax.asInstanceOf[java.lang.Long].longValue(),
              nCols)
          }.toList
        } finally r.close()
      }
    }.toDF("rg_rows", "rg_min", "rg_max", "n_cols")
    perGroup.agg(
      sum("rg_rows").as("total_rows"),
      min("rg_min").as("min_orderkey"),
      max("rg_max").as("max_orderkey"),
      max("n_cols").as("n_cols"))
  }

  /** Parquet schema evolution (`mergeSchema`) — the long-lived-dataset
    * reality: yesterday's files carry (doc_id, lang), today's add
    * n_chars; one mergeSchema read presents the union schema with
    * nulls where an older file lacks the column. The aggregate pins
    * BOTH the union-schema shape (per-generation null counts) and
    * value fidelity. Production note: mergeSchema reads every file
    * footer (a 100 TB listing cost) — real tables pin the merged
    * schema in a catalog and pass it explicitly; the read below is the
    * catalog-miss fallback path.
    *
    * The oracle recomputes the expected union from the source table
    * (even ids = old generation, null n_chars; odd = new), so a
    * mergeSchema read that mis-nulls or drops a column hash-fails. */
  def sourceSchemaMerge(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").filter(col("doc_id") < 3000)
    val path = s"$scratch/docs_evolving"
    docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("lang"))
      .write.mode("overwrite").parquet(s"$path/gen=old")
    docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$path/gen=new")
    s.read.option("mergeSchema", "true").parquet(s"$path/gen=old", s"$path/gen=new")
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        count_if(col("n_chars").isNull).as("n_pre_evolution"),
        sum(coalesce(col("n_chars"), lit(0L))).as("chars_post"))
      .orderBy("lang")
  }
}
