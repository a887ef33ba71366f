package graft.queries

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables.t

/** Scalar-function inventory (SURVEY §2.B fn_* rows). All codegen'd
  * builtins — no UDFs on these paths, so each query stays inside a single
  * WholeStageCodegen span over the parquet scan.
  */
object Scalars {

  /** String functions over part names/brands. */
  def fnString(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 5).as("name_sub"),
        trim(concat(lit(" "), col("p_name"), lit(" "))).as("name_trim"),
        regexp_extract(col("p_brand"), "[0-9]+", 0).as("brand_num"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), "a", "X").as("name_repl"))
      .orderBy("p_partkey")
      .limit(200)

  /** Second string-function family: translate/lpad/rpad/reverse/repeat/
    * left/right/split_part (all codegen'd builtins; initcap omitted —
    * absent from DuckDB 1.0). */
  def fnStringExtra(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .filter(col("p_partkey") <= 500)
      .select(
        col("p_partkey"),
        translate(col("p_name"), "ae", "43").as("name_leet"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("key_padded"),
        rpad(col("p_brand"), 10, ".").as("brand_padded"),
        reverse(col("p_name")).as("name_rev"),
        repeat(col("p_brand"), 2).as("brand_twice"),
        expr("left(p_name, 4)").as("name_left"),
        expr("right(p_name, 4)").as("name_right"),
        split_part(col("p_type"), lit(" "), lit(2)).as("type_mid"))
      .orderBy("p_partkey")

  /** Date/time functions over order dates (timestamps, UTC session). */
  def fnDate(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mon"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
        datediff(lit("2000-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_2000"))
      .orderBy("o_orderkey")
      .limit(200)

  /** Calendar functions beyond fn_date: month arithmetic with end-of-
    * month clamping (Spark add_months ≡ DuckDB + INTERVAL MONTH),
    * last_day, quarter, day-of-week (Spark is 1=Sunday, DuckDB 0=Sunday
    * — oracle adds 1), ISO week, day-of-year. */
  def fnDateExtra(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderkey") <= 1000)
      .withColumn("d", to_date(col("o_orderdate")))
      .select(
        col("o_orderkey"),
        col("d"),
        add_months(col("d"), 3).as("plus3mo"),
        last_day(col("d")).as("eom"),
        quarter(col("d")).as("q"),
        dayofweek(col("d")).as("dow"),
        weekofyear(col("d")).as("woy"),
        dayofyear(col("d")).as("doy"))
      .orderBy("o_orderkey")

  /** Math functions over part prices. Spark ceil/floor(double) return
    * BIGINT — the oracle casts DuckDB's DOUBLE results to match. */
  def fnMath(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        round(Num.money(col("p_retailprice")), 1).cast("double").as("price_r1"),
        abs(col("p_retailprice") - 1000).as("abs_diff"),
        ceil(col("p_retailprice")).as("price_ceil"),
        floor(col("p_retailprice")).as("price_floor"),
        round(pow(col("p_retailprice"), 0.5), 4).as("price_pow_half"),
        round(log(col("p_retailprice")), 4).as("price_ln"),
        round(sqrt(col("p_retailprice")), 4).as("price_sqrt"),
        (col("p_partkey") % 7).as("key_mod"))
      .orderBy("p_partkey")
      .limit(200)

  /** CASE / coalesce / nullif / greatest / least. */
  def fnConditional(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 5000, "low")
          .otherwise("high").as("bal_bucket"),
        coalesce(expr("nullif(c_mktsegment, 'BUILDING')"), lit("none")).as("seg_or_none"),
        round(greatest(col("c_acctbal"), lit(0.0)), 2).as("bal_pos"),
        round(least(col("c_acctbal"), lit(1000.0)), 2).as("bal_cap"))
      .orderBy("c_custkey")
      .limit(500)

  /** JSON path extraction from the events props column, then aggregate. */
  def fnJson(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy("event_type")
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"), Num.avgInt(col("k"), 4).as("avg_k"))
      .orderBy("event_type")

  /** Array functions over float32 embeddings (cast to double before any
    * arithmetic; element_at is 1-based and supports negative indexes,
    * matching DuckDB list indexing). */
  def fnArray(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 4).as("first_val"),
        round(element_at(col("embedding"), -1).cast("double"), 4).as("last_val"),
        round(aggregate(slice(col("embedding"), 1, 4), lit(0.0),
          (acc, x) => acc + x.cast("double")), 4).as("sum_first4"))
      .orderBy("vec_id")
      .limit(1000)

  /** Map construction + lookup. The map itself never leaves the query —
    * the output is its scalar read-backs, so the oracle expresses the
    * same facts relationally (count FILTER / count DISTINCT); missing
    * keys coalesce to 0 on both sides, cardinality cast to long. */
  def fnMap(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(sort_array(collect_list(struct(col("event_type"), col("n"))))).as("type_counts"))
      .select(
        col("user_id"),
        coalesce(element_at(col("type_counts"), "click"), lit(0L)).as("clicks"),
        coalesce(element_at(col("type_counts"), "purchase"), lit(0L)).as("purchases"),
        size(col("type_counts")).cast("long").as("n_types"))
      .orderBy("user_id")

  /** Map higher-order functions — transform_values / map_filter /
    * map_zip_with (against a literal weight map) / transform_keys — with
    * every result read back as a scalar, so the oracle can state the
    * same facts relationally without needing map HOFs. All codegen'd
    * per-row work on the already-aggregated per-user map. */
  def fnMapExtra(s: SparkSession, dir: String): DataFrame = {
    val wm = map(lit("click"), lit(2L), lit("purchase"), lit(5L))
    t(s, dir, "events")
      .filter(col("user_id") < 300)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(sort_array(collect_list(struct(col("event_type"), col("n"))))).as("m"))
      .select(
        col("user_id"),
        aggregate(map_values(transform_values(col("m"), (_, v) => v * 2)),
          lit(0L), (a, b) => a + b).as("doubled_total"),
        size(map_filter(col("m"), (_, v) => v >= 2)).cast("long").as("n_frequent_types"),
        aggregate(map_values(map_zip_with(col("m"), wm,
            (_, v1, v2) => coalesce(v1, lit(0L)) * coalesce(v2, lit(0L)))),
          lit(0L), (a, b) => a + b).as("weighted_score"),
        concat_ws(",", sort_array(map_keys(transform_keys(col("m"), (k, _) => upper(k)))))
          .as("keys_upper"))
      .orderBy("user_id")
  }

  /** Bitwise operators over order keys: shifts, and/or/xor/not,
    * popcount — the bit-twiddling family SimHash-style signatures
    * build on (DuckDB `bit_count` returns TINYINT → oracle casts). */
  def fnBitwise(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderkey") <= 1000)
      .select(
        col("o_orderkey"),
        expr("shiftleft(o_orderkey, 2)").as("shl"),
        expr("shiftright(o_orderkey, 1)").as("shr"),
        col("o_orderkey").bitwiseAND(lit(255L)).as("band"),
        col("o_orderkey").bitwiseOR(lit(16L)).as("bor"),
        col("o_orderkey").bitwiseXOR(lit(85L)).as("bxor"),
        bit_count(col("o_orderkey")).as("bcount"),
        expr("~o_orderkey").as("bnot"))
      .orderBy("o_orderkey")

  /** Positional explode: one row per token WITH its 0-based position —
    * the order-preserving fan-out (plain explode loses ordinal info).
    * Same Generate operator, one extra ordinal column. */
  def fnPosexplode(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(col("doc_id") < 20)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), col("pos"), col("col").as("word"))
      .orderBy("doc_id", "pos")

  /** Struct construction + nested field access: build a nested struct
    * per order, read leaf fields back (dot-path resolution is pure
    * projection — Catalyst collapses it, no struct materialization in
    * the scan). Output is the scalar read-backs, so the oracle states
    * the same facts directly. */
  def fnStruct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .withColumn("info", struct(
        col("o_orderstatus").as("status"),
        year(col("o_orderdate")).as("yr"),
        struct(
          col("o_totalprice").as("price"),
          when(col("o_totalprice") > 200000, "big").otherwise("small").as("bucket")).as("amt")))
      .filter(col("o_orderkey") <= 1000)
      .select(col("o_orderkey"),
        col("info.status").as("status"),
        col("info.yr").as("yr"),
        col("info.amt.bucket").as("bucket"),
        round(col("info.amt.price"), 2).as("price"))
      .orderBy("o_orderkey")

  /** Generator: tokenize + explode + count (word frequency top-20). */
  def fnExplodeWords(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("word"))
      .limit(20)

  /** Array-function family over tokenized text: sort/distinct/intersect/
    * contains/position/filter/overlap/reverse/flatten. Set-valued results
    * are surfaced as sizes (DuckDB's list_intersect/list_distinct return
    * arbitrary element order) or via array_sort before joining; absent
    * array_position is 0 in Spark vs NULL in DuckDB — oracle coalesces. */
  def fnArrayExtra(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("w", slice(split(col("text"), " "), 1, 8))
      .select(
        col("doc_id"),
        array_join(array_sort(col("w")), " ").as("sorted_words"),
        size(array_distinct(col("w"))).cast("long").as("n_uniq"),
        size(array_intersect(col("w"),
          array(lit("join"), lit("hash"), lit("scan"), lit("row")))).cast("long").as("n_common"),
        array_contains(col("w"), "join").as("has_join"),
        array_position(col("w"), "hash").cast("long").as("pos_hash"),
        size(filter(col("w"), x => length(x) > 4)).cast("long").as("n_long"),
        arrays_overlap(col("w"), array(lit("vector"), lit("batch"))).as("has_vb"),
        element_at(reverse(col("w")), 1).as("last_word"),
        size(flatten(array(col("w"), col("w")))).cast("long").as("n_flat"))
      .orderBy("doc_id")

  /** Regex family: global replace (Spark replaces all matches by default;
    * the oracle passes the 'g' flag), boolean match (rlike ↔
    * regexp_matches), and match counting via regexp_extract_all + size
    * (explicit group 0 — Spark requires it when the pattern has no
    * capture group). */
  def fnRegexp(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        col("p_name").rlike("^[bg]").as("starts_bg"),
        size(regexp_extract_all(col("p_name"), lit("[aeiou]"), lit(0))).cast("long").as("n_vowels"),
        regexp_extract(col("p_type"), "^([A-Z]+)", 1).as("type_head"))
      .orderBy("p_partkey")
      .limit(500)

  /** Interval arithmetic: timestamp ± INTERVAL literals and exact integer
    * hour/day differences (timestampdiff ↔ date_diff) — pure projection,
    * no float time math anywhere. */
  def fnIntervalArith(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderkey") <= 2000)
      .select(
        col("o_orderkey"),
        expr("o_orderdate + INTERVAL 36 HOURS").as("plus_36h"),
        expr("o_orderdate - INTERVAL 90 MINUTES").as("minus_90m"),
        expr("o_orderdate + INTERVAL 2 DAYS + INTERVAL 3 HOURS").as("plus_2d3h"),
        expr("timestampdiff(HOUR, timestamp'1990-01-01 00:00:00', o_orderdate)").as("hours_since_1990"),
        expr("timestampdiff(DAY, o_orderdate, timestamp'2005-01-01 00:00:00')").as("days_to_2005"))
      .orderBy("o_orderkey")

  /** Trigonometric / transcendental scalar family (identical IEEE-754
    * results in both engines at round-4). sign is cast to int — DuckDB
    * returns an integer type there, Spark a double. */
  def fnTrig(s: SparkSession, dir: String): DataFrame = {
    val x = col("p_retailprice") / 1000.0
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        round(sin(x), 4).as("sin_x"),
        round(cos(x), 4).as("cos_x"),
        round(tan(x), 4).as("tan_x"),
        round(atan(x), 4).as("atan_x"),
        round(atan2(x, lit(2.0)), 4).as("atan2_x2"),
        round(degrees(x), 4).as("deg_x"),
        round(radians(col("p_size").cast("double")), 4).as("rad_size"),
        round(log2(col("p_retailprice")), 4).as("log2_price"),
        round(log10(col("p_retailprice")), 4).as("log10_price"),
        signum(col("p_size") - 25).cast("int").as("sign_size"),
        round(exp(x / 10.0), 4).as("exp_x10"))
      .orderBy("p_partkey")
      .limit(500)
  }

  /** ANSI-safe arithmetic (`try_` family): Spark 4 runs with ANSI mode
    * on, where raw div-by-zero, bad casts, and integer overflow THROW at
    * runtime — a 100 TB job dying at hour three on one malformed row.
    * The `try_` variants yield NULL instead, matching DuckDB's NULL
    * semantics (its oracle). The overflow case can't be expressed in
    * DuckDB 1.0 (BIGINT overflow always errors, no try_add), so the
    * oracle encodes the expected constant NULL directly. */
  def fnTryArith(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        try_divide(Num.money(col("l_extendedprice")),
          col("l_quantity") - col("l_quantity")).cast("double").as("div0"),
        round(col("l_extendedprice").cast("double") / 4.0, 4).as("div_ok"),
        expr("try_cast(l_returnflag AS INT)").as("cast_bad"),
        expr("try_cast(cast(l_linenumber AS STRING) AS INT)").as("cast_ok"),
        try_add(lit(Long.MaxValue), col("l_orderkey") + lit(1L)).as("ovf"))
      .orderBy("l_orderkey", "l_linenumber")
      .limit(300)

  /** Binary codecs: hex / base64 round-trips, md5, sha2-256 over part
    * names. All codegen'd built-ins operating on the UTF-8 bytes of the
    * string. `hex` emits uppercase in both engines; digests are
    * lowercase hex in both. The round-trip columns decode back and
    * compare — pinning that encode∘decode is the identity. */
  def fnCodec(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        hex(col("p_name")).as("hex_name"),
        base64(col("p_name").cast("binary")).as("b64_name"),
        (unbase64(base64(col("p_name").cast("binary"))).cast("string") === col("p_name"))
          .as("b64_roundtrip"),
        (unhex(hex(col("p_name"))).cast("string") === col("p_name")).as("hex_roundtrip"),
        md5(col("p_name")).as("md5_name"),
        sha2(col("p_name"), 256).as("sha256_name"))
      .orderBy("p_partkey")
      .limit(500)

  /** Null-preserving generator: `posexplode_outer` keeps a row (with
    * NULL pos/value) for documents whose filtered token array is EMPTY —
    * the outer-join-shaped fan-out that plain explode silently drops
    * (17% of these docs have no 'q' token; an inner explode would lose
    * them from any downstream per-doc accounting). DuckDB mirrors it as
    * LEFT JOIN LATERAL over an index range. */
  def fnExplodeOuter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(col("doc_id") < 2000)
      .select(col("doc_id"),
        expr("filter(split(text, ' '), w -> w LIKE '%q%')").as("qs"))
      .select(col("doc_id"), posexplode_outer(col("qs")).as(Seq("pos", "qtoken")))
      .orderBy(col("doc_id"), col("pos").asc_nulls_first)

  /** Epoch/time conversions: timestamp ↔ epoch seconds/millis/micros and
    * formatted output. Session timezone is pinned UTC on both engines,
    * so the string formats agree; all conversions are exact integer
    * math on the microsecond representation. The parquet column reads as
    * TIMESTAMP_NTZ (isAdjustedToUTC=false footer), which `unix_millis`/
    * `unix_micros` reject — the cast to TIMESTAMP is an identity
    * re-tag under the UTC session zone. */
  def fnEpochTime(s: SparkSession, dir: String): DataFrame = {
    val od = col("o_orderdate").cast("timestamp")
    t(s, dir, "orders")
      .filter(col("o_orderkey") <= 2000)
      .select(
        col("o_orderkey"),
        unix_timestamp(od).as("epoch_s"),
        unix_millis(od).as("epoch_ms"),
        unix_micros(od).as("epoch_us"),
        timestamp_seconds(unix_timestamp(od)).cast("timestamp_ntz").as("from_epoch"),
        date_format(od, "yyyy-MM-dd HH:mm:ss").as("fmt_full"),
        date_format(od, "yyyy-MM").as("fmt_ym"))
      .orderBy("o_orderkey")
  }

  /** Deterministic content-derived IDs: UUID-shaped identifiers minted
    * from the md5 of (source, text) — the stable-doc-ID discipline that
    * survives re-runs, re-shards, and re-ingestion, unlike uuid()/
    * monotonically_increasing_id (both nondeterministic by design and
    * banned from this inventory). Distinctness equals content
    * distinctness by construction. */
  def fnStableId(s: SparkSession, dir: String): DataFrame = {
    // \u0001 separator: "ab"+"c" must not collide with "a"+"bc". Each field
    // is nullity-tagged ('n' vs 'v'+value) because Spark's concat NULLs the
    // whole result while DuckDB's concat skips NULL args — tagging makes both
    // sides total functions with identical output for NULL, '' and value cases.
    def tagged(c: org.apache.spark.sql.Column) =
      when(c.isNull, lit("n")).otherwise(concat(lit("v"), c))
    val h = md5(concat(tagged(col("source")), lit("\u0001"), tagged(col("text"))))
    val uuid = concat_ws("-",
      substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
      substring(h, 17, 4), substring(h, 21, 12))
    graft.tables.Tables.t(s, dir, "documents")
      .filter(col("doc_id") < 1500)
      .select(col("doc_id"), uuid.as("stable_id"))
      .orderBy("doc_id")
  }

  /** Error-tolerant casts (`try_cast`): deliberately malformed inputs —
    * every third row gets a non-numeric suffix, every fifth a bogus date
    * month — must produce NULL, not a thrown task, under ANSI semantics;
    * the dirty-ingest posture where one bad row must not kill a 100 TB
    * job. Counts + null-rate per outcome; DuckDB mirrors via TRY_CAST. */
  def fnTryCast(s: SparkSession, dir: String): DataFrame =
    graft.tables.Tables.t(s, dir, "orders")
      .filter(col("o_orderkey") <= 4000)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 3 === 0, concat(col("o_orderkey"), lit("x")))
          .otherwise(col("o_orderkey").cast("string")).as("num_s"),
        when(col("o_orderkey") % 5 === 0, lit("2024-13-01"))
          .otherwise(lit("2024-06-15")).as("date_s"))
      .select(
        expr("try_cast(num_s AS BIGINT)").as("as_num"),
        expr("try_cast(date_s AS DATE)").as("as_date"))
      .agg(
        count(lit(1)).as("n"),
        count(col("as_num")).as("n_num_ok"),
        count(col("as_date")).as("n_date_ok"),
        sum(coalesce(col("as_num"), lit(0L))).as("num_total"),
        countDistinct(col("as_date")).as("n_dates"))

  /** CSV-in-a-column scalars: `from_csv` parses an embedded CSV string
    * into a typed struct (delimiter inside quoted fields survives),
    * `to_csv` serializes back — the row-level codec pair for logs that
    * arrive CSV-encoded inside another format. */
  def fnCsvStruct(s: SparkSession, dir: String): DataFrame = {
    graft.tables.Tables.t(s, dir, "customer")
      .filter(col("c_custkey") <= 500)
      .withColumn("line", concat_ws(",",
        col("c_custkey"), col("c_mktsegment"),
        round(col("c_acctbal") * 100).cast("long")))
      .withColumn("parsed", from_csv(col("line"),
        lit("k BIGINT, seg STRING, cents BIGINT"),
        Map.empty[String, String].asJava))
      .select(
        col("c_custkey"),
        col("parsed.k").as("k"),
        col("parsed.seg").as("seg"),
        col("parsed.cents").as("cents"),
        to_csv(col("parsed")).as("reserialized"))
      .orderBy("c_custkey")
  }

  /** Spark 4 native XML codec (fn_xml): struct → `to_xml` text →
    * `from_xml` back to a typed struct, with an XML-special payload
    * (`& < >`) planted in the string field so entity escaping runs in
    * BOTH directions. The serialized text itself stays out of the
    * hashed output (whitespace/layout is engine-specific); the
    * PARSED-BACK values are the contract — any mangling in serialize,
    * escape, or parse breaks the hash against the oracle's direct
    * computation from the source columns. Per-row codegen'd map work;
    * at 100 TB this is the third-party-feed codec path next to the
    * CSV/JSON roundtrips. */
  def fnXml(s: SparkSession, dir: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("seg", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("cents", org.apache.spark.sql.types.LongType)))
    graft.tables.Tables.t(s, dir, "customer")
      .filter(col("c_custkey") <= 500)
      .withColumn("payload", struct(
        col("c_custkey").as("k"),
        concat(col("c_mktsegment"), lit(" & <co>")).as("seg"),
        round(col("c_acctbal") * 100).cast("long").as("cents")))
      .withColumn("x", to_xml(col("payload")))
      .withColumn("p", from_xml(col("x"), schema))
      .select(
        col("c_custkey"),
        col("p.k").as("k"),
        col("p.seg").as("seg"),
        col("p.cents").as("cents"))
      .orderBy("c_custkey")
  }

  /** Spark 4 VARIANT over semi-structured data: `parse_json` lifts the
    * events.props JSON string into the binary VARIANT encoding once,
    * `variant_get` then extracts typed fields without re-parsing text
    * per access — the modern lakehouse answer to schemaless columns
    * (vs. per-row get_json_object string parsing, which re-tokenizes
    * the JSON for every extraction). Aggregated per event type with
    * exact integer sums. */
  def fnJsonVariant(s: SparkSession, dir: String): DataFrame =
    graft.tables.Tables.t(s, dir, "events")
      .withColumn("v", parse_json(col("props")))
      .withColumn("k", variant_get(col("v"), "$.k", "int"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        count(col("k")).as("n_with_k"),
        sum(col("k").cast("long")).as("sum_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** URL scalar family: `parse_url` component extraction (HOST / PATH /
    * QUERY / one named query param) over deterministic synthetic URLs —
    * the per-row metadata step of any web-corpus pipeline (dedup by
    * host, mix by domain). Pure codegen'd row-at-a-time work; the
    * oracle mirrors each component with an equivalent regexp. */
  def fnUrl(s: SparkSession, dir: String): DataFrame =
    graft.tables.Tables.t(s, dir, "documents")
      .filter(col("doc_id") < 1500)
      .withColumn("url", concat(
        lit("https://"), col("source"), lit(".example.com/docs/"),
        col("doc_id"), lit("?lang="), col("lang"), lit("&rev=2")))
      .select(
        col("doc_id"), col("url"),
        expr("parse_url(url, 'HOST')").as("host"),
        expr("parse_url(url, 'PATH')").as("path"),
        expr("parse_url(url, 'QUERY')").as("query"),
        expr("parse_url(url, 'QUERY', 'lang')").as("q_lang"))
      .orderBy("doc_id")

  /** Column-level encryption surface (`aes_encrypt`/`aes_decrypt`) —
    * the at-rest-PII posture a warehouse actually ships: ECB mode
    * deliberately, because determinism is the point here (GCM's random
    * IV would make every run's ciphertext differ and the gate
    * meaningless; real deployments trade that determinism back for
    * semantic security unless they need encrypted equi-joins — exactly
    * the trade this operator documents). The gate is real despite
    * DuckDB lacking AES: `n_roundtrip_ok` must equal the row count
    * (any decrypt(encrypt(x)) ≠ x collapses it) and
    * `n_distinct_cipher` must equal the plaintext distinct count (the
    * ECB determinism property itself). */
  def fnCryptoRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val enc = expr("aes_encrypt(cast(o_orderpriority AS BINARY), '0123456789abcdef', 'ECB')")
    t(s, dir, "orders")
      .filter(col("o_orderkey") < 4000)
      .withColumn("cipher", enc)
      .withColumn("plain",
        expr("cast(aes_decrypt(cipher, '0123456789abcdef', 'ECB') AS STRING)"))
      .groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("n_rows"),
        count_if(col("plain") === col("o_orderpriority")).as("n_roundtrip_ok"),
        countDistinct(col("cipher")).as("n_distinct_cipher"),
        countDistinct(col("o_orderpriority")).as("n_distinct_plain"))
      .orderBy("o_orderstatus")
  }

  /** Spark 4 `IDENTIFIER()` clause — templated SQL over a dynamic
    * table name without string-concatenated SQL injection; the oracle
    * reads the same table statically, so resolution through the
    * clause is what the gate checks. */
  def sqlIdentifier(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("graft_ident_orders")
    s.sql("""
      SELECT o_orderstatus, count(*) AS n,
             CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
      FROM IDENTIFIER('graft_ident_orders')
      GROUP BY o_orderstatus ORDER BY o_orderstatus""")
  }

  /** Spark 4 COLLATION semantics (fn_collation): grouping, distinct
    * counting, and substring match under the UTF8_LCASE collation vs
    * binary. Three deterministic case-variants of every nation name
    * (UPPER as shipped, lower, Initcap) collapse to ONE group under the
    * case-insensitive collation while staying 3 binary-distinct inside
    * it — the collation applies at the COMPARISON, not as a stored
    * transform, which is the point of the feature (indexes/stats keep
    * the original bytes). Output avoids emitting a collated column
    * (schema stays plain STRING for the gate): the group key re-derives
    * as lower(min(variant)). The DuckDB mirror models UTF8_LCASE as
    * lower() at every comparison point — exactly the collation's
    * definition for ASCII names.
    *
    * Scale: collation-aware grouping hashes the collation key — same
    * shuffle shape as any groupBy; 3·|nation| input rows here. */
  def fnCollation(s: SparkSession, dir: String): DataFrame = {
    val names = t(s, dir, "nation").select(col("n_name"))
    val mixed = names.select(col("n_name").as("x"))
      .unionAll(names.select(lower(col("n_name")).as("x")))
      .unionAll(names.select(initcap(lower(col("n_name"))).as("x")))
    mixed
      .groupBy(collate(col("x"), "UTF8_LCASE").as("k"))
      .agg(
        count(lit(1)).as("n_variants"),
        countDistinct(col("x")).as("n_distinct_binary"),
        lower(min(col("x"))).as("name_lower"),
        sum(when(contains(collate(col("x"), "UTF8_LCASE"), lit("TION_1")), 1L)
          .otherwise(0L)).as("n_contains_probe"))
      .select(col("name_lower"), col("n_variants"),
        col("n_distinct_binary"), col("n_contains_probe"))
      .orderBy("name_lower")
  }
}
