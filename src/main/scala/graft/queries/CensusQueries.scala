package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.io.Source
import graft.census.{Ingest, Metadata}
import graft.tables.Tables.t

/** The reference-equivalent ETL pipeline as a graded query
  * (SURVEY §2.B ingest_census_csv): metadata parse → declared-schema
  * CSV scans → cell slice/coerce/rename → estimates ⋈ geoheader, over
  * the checked-in synthetic ACS fixture (FIXTURES.md §B — the real
  * census.gov inputs are unreachable, zero egress). Oracle-checked since
  * round 4: DuckDB re-ingests the same fixture CSVs and re-derives the
  * rollup; CensusIngestSpec additionally golden-checks every stage.
  */
object CensusQueries {

  /** Fixture directory: resolved from the classpath (sbt runs with
    * resources as plain directories), falling back to the repo path. */
  private[graft] def fixtureDir: String = {
    val url = getClass.getResource("/acs/ACS_5yr_Seq_Table_Number_Lookup.txt")
    if (url != null && url.getProtocol == "file")
      new java.io.File(url.getPath).getParent
    else "/root/repo/src/main/resources/acs"
  }

  private[graft] def fixtureMetas: Seq[graft.census.TableMeta] = {
    val src = Source.fromFile(s"$fixtureDir/ACS_5yr_Seq_Table_Number_Lookup.txt")
    try Metadata.parseLookup(src.getLines()) finally src.close()
  }

  /** ACS margin-of-error aggregation (the published Census formula:
    * MOE_agg = √Σ moe_i² for a sum of independent estimates) over the
    * testdata star — the statistical operation consumers of the
    * reference's estimates+`_moe` twin tables run constantly. The
    * squared terms are exact decimals (associative, partition-order
    * independent); only the final √ is floating, applied to an exact
    * sum on both engines. Synthetic MOE = acctbal/10 keeps the query on
    * driver-provided testdata (the fixture covers the real `_moe`
    * ingest path). */
  def censusMoeAgg(s: SparkSession, dir: String): DataFrame = {
    // moe_i = acctbal/10 ⇒ moe_i² = cents²/10⁶; Σcents² is exact integer
    // arithmetic (decimal-38 accumulator — BIGINT would overflow past
    // ~sf10), the single float op is the final √ of an identical exact
    // value on both engines
    val cents = round(col("c_acctbal") * 100).cast("long")
    t(s, dir, "customer")
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        count(lit(1)).as("n_cust"),
        Num.d2(sum(Num.money(col("c_acctbal")))).as("est_sum"),
        round(sqrt(sum((cents * cents).cast("decimal(38,0)")).cast("double") / 1000000.0), 2).as("moe_agg"))
      .orderBy("n_name")
  }

  /** Derived-proportion margin of error — the OTHER published ACS
    * consumer formula (Census handbook): for p = X/Y with X a subset of
    * Y, MOE_p = √(MOE_X² − p²·MOE_Y²) / Y, falling back to the ratio
    * form (+ in the radicand) when the radicand goes negative. All
    * aggregates are exact integer cents (Σc, Σc²) — partition-order
    * independent — and the double arithmetic afterwards is the same
    * IEEE expression tree on both engines, so round-6 parity is exact.
    * Subset = BUILDING-segment customers; the estimate is the
    * NONNEGATIVE shifted balance (acctbal + 1000 — TPC-H acctbal goes
    * down to −999.99, and an ACS proportion's numerator/denominator are
    * nonnegative by construction), moe_i = est/10 as in
    * census_moe_agg. */
  def censusMoeRatio(s: SparkSession, dir: String): DataFrame = {
    val cents = round((col("c_acctbal") + 1000) * 100).cast("long")
    val isSeg = col("c_mktsegment") === "BUILDING"
    val c2 = (cents * cents).cast("decimal(38,0)")
    t(s, dir, "customer")
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        sum(when(isSeg, cents)).as("numC"),
        sum(cents).as("denC"),
        sum(when(isSeg, c2)).as("moeN2c"),
        sum(c2).as("moeD2c"))
      .select(col("n_name"),
        round(col("numC").cast("double") / col("denC").cast("double"), 6).as("p"), {
          val p = col("numC").cast("double") / col("denC").cast("double")
          val moeN2 = col("moeN2c").cast("double") / lit(1000000.0)
          val moeD2 = col("moeD2c").cast("double") / lit(1000000.0)
          val rad = moeN2 - p * p * moeD2
          val radSafe = when(rad < 0, moeN2 + p * p * moeD2).otherwise(rad)
          round(sqrt(radSafe) / (col("denC").cast("double") / lit(100.0)), 6).as("moe_p")
        })
      .orderBy("n_name")
  }

  /** Coefficient of variation + reliability class per (nation,
    * segment) — the published ACS data-user guidance for judging an
    * estimate: SE = MOE/1.645, CV = 100·SE/estimate, flagged
    * high (<15), medium (15–30), low (>30) reliability. Group sizes
    * vary enough that all three classes appear. Estimates are exact
    * integer cents (nonnegative shifted balance), per-item
    * MOE = est_i so Σ and Σ² stay exact; the double math afterwards
    * is the same expression tree on both engines, and the class
    * comparisons run on those identical doubles. */
  def censusMoeCv(s: SparkSession, dir: String): DataFrame = {
    val cents = round((col("c_acctbal") + 1000) * 100).cast("long")
    val c2 = (cents * cents).cast("decimal(38,0)")
    val est = col("estC").cast("double") / 100.0
    val moe = sqrt(col("m2C").cast("double") / 10000.0)
    val cv = (moe / lit(1.645)) / est * 100
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name", "c_mktsegment")
      .agg(count(lit(1)).as("n_cust"), sum(cents).as("estC"), sum(c2).as("m2C"))
      .select(col("n_name"), col("c_mktsegment"), col("n_cust"),
        round(est, 2).as("estimate"),
        round(cv, 4).as("cv_pct"),
        when(cv < 15, "high").when(cv < 30, "medium").otherwise("low").as("reliability"))
      .orderBy("n_name", "c_mktsegment")
  }

  /** Statistical-difference test between CONSECUTIVE nations'
    * estimate totals — the published ACS two-estimate significance
    * rule: Z = |e₁−e₂| / √(MOE₁²+MOE₂²), significant at 90% when
    * Z > 1.645. Nation aggregates are exact integer sums; the pairing
    * is one lag window over the 25-row aggregate table (the raw
    * customer table never passes through a global window). */
  def censusMoeSig(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = round((col("c_acctbal") + 1000) * 100).cast("long")
    val c2 = (cents * cents).cast("decimal(38,0)")
    val agg = t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum(cents).as("estC"), sum(c2).as("m2C"))
    val w = Window.orderBy("n_name")
    val withPrev = agg
      .withColumn("p_name", lag("n_name", 1).over(w))
      .withColumn("p_estC", lag("estC", 1).over(w))
      .withColumn("p_m2C", lag("m2C", 1).over(w))
      .filter(col("p_name").isNotNull)
    val e1 = col("estC").cast("double") / 100.0
    val e2 = col("p_estC").cast("double") / 100.0
    // moe_i = est_i/10 ⇒ MOE² = Σest_i²/100 (cents² → dollars²: /10⁶)
    val z = abs(e1 - e2) /
      sqrt((col("m2C").cast("double") + col("p_m2C").cast("double")) / 1000000.0)
    withPrev.select(col("p_name").as("nation_a"), col("n_name").as("nation_b"),
        round(e1 - e2, 2).as("diff"),
        round(z, 4).as("z"),
        (z > 1.645).as("significant_90"))
      .orderBy("nation_b")
  }

  /** geoheader ⋈ b00001 estimates, aggregated per summary level — the
    * canonical consumer query shape of the reference's output database
    * (SURVEY §3.3). */
  def ingestCensusCsv(s: SparkSession, dir: String): DataFrame = {
    // ingestAll: the fixture carries TWO sequences (B00001/B00002 in
    // seq 1, B00003 in seq 2), so the graded query drives the same
    // group-by-sequence path a full ACS release needs
    val (geo, est, _) =
      Ingest.ingestAll(s, fixtureDir, 2014, 5, Seq("xa", "xb"), fixtureMetas)
    est("b00001")
      .join(geo, Seq("stusab", "logrecno"))
      .groupBy("sumlevel")
      .agg(
        count(lit(1)).as("n_geo"),
        sum(col("b00001001")).as("sum_total"),
        sum(col("b00001002")).as("sum_male"))
      .orderBy("sumlevel")
  }

  /** TIGER shapefile round-trip (SURVEY §2.A A15, the one reference
    * module previously documented-only): build a per-region set of
    * .shp/.dbf pairs from the nation dim — one square Polygon ring per
    * nation at (4·nationkey, 3·regionkey), attributes in dBase fields —
    * then scan them back through the distributed `Tiger.read` decoder
    * and re-derive every value from the PARSED bytes (geometry extrema
    * from the coordinate arrays, attributes from the .dbf row). The
    * DuckDB oracle recomputes the same values straight from `nation`,
    * so any codec bug — endianness, record framing, field padding —
    * breaks the hash gate. The fixture writer collects the 25-row
    * nation dim (bounded by construction: it is a dimension table);
    * the decode side is task-parallel per file pair, TIGER's real unit
    * of scale (one county = one pair; see census/Tiger.scala). */
  /** Writes the per-region TIGER fixture pairs (one .shp/.dbf per
    * region, one square Polygon ring per nation at (4·nk, 3·rk)) and
    * returns the directory. Shared by every tiger_* query; idempotent
    * re-write per call so each query sees a fresh, complete fixture. */
  private[queries] def writeTigerFixture(s: SparkSession, dir: String): String = {
    val shpDir = new java.io.File("/tmp/graft_tiger")
    shpDir.mkdirs()
    shpDir.listFiles().foreach(_.delete()) // idempotent re-run
    val fields = Seq(graft.census.Shapefile.Field("NATIONKEY", 'N', 4),
      graft.census.Shapefile.Field("NAME", 'C', 25),
      graft.census.Shapefile.Field("POP", 'N', 10))
    val nations = t(s, dir, "nation")
      .select(col("n_nationkey").cast("long"), col("n_regionkey").cast("long"),
        col("n_name"))
      .collect() // 25-row dimension table: bounded by construction
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    nations.groupBy(_._2).foreach { case (regionKey, ns) =>
      val rows = ns.sortBy(_._1).toSeq.map { case (nk, rk, name) =>
        val (x0, y0) = (4.0 * nk, 3.0 * rk)
        (5, Array(0),
          Array(x0, x0 + 2, x0 + 2, x0, x0),
          Array(y0, y0, y0 + 2, y0 + 2, y0),
          Seq(nk.toString, name, (nk * 1000 + rk).toString))
      }
      graft.census.Shapefile.write(s"${shpDir.getPath}/region$regionKey", fields, rows)
    }
    shpDir.getPath
  }

  def ingestTigerShapefile(s: SparkSession, dir: String): DataFrame = {
    graft.census.Tiger.read(s, writeTigerFixture(s, dir))
      .select(
        element_at(col("attrs"), "NATIONKEY").cast("long").as("n_nationkey"),
        element_at(col("attrs"), "NAME").as("n_name"),
        size(col("xs")).cast("long").as("num_points"),
        array_min(col("xs")).cast("long").as("min_x"),
        array_min(col("ys")).cast("long").as("min_y"),
        array_max(col("xs")).cast("long").as("max_x"),
        array_max(col("ys")).cast("long").as("max_y"),
        element_at(col("attrs"), "POP").cast("long").as("pop"))
      .orderBy("n_nationkey")
  }

  /** WKT export from PARSED shapefile bytes — exactly what `shp2pgsql`
    * emits per record (`upstream:censuspgsql/tiger2pgsql.py` [U] pipes
    * its output into psql). The POLYGON text is assembled from the
    * decoded coordinate arrays with codegen'd collection functions
    * (`zip_with` + `array_join` — no UDF), so the geometry text is a
    * pure map-side projection over the distributed scan: at 100 TB this
    * is one pass over county files, no shuffle at all (the orderBy here
    * is presentation-only for the hash gate). The oracle rebuilds the
    * same WKT strings arithmetically from the nation dim, putting the
    * codec AND the text assembly under the gate. */
  def tigerWktExport(s: SparkSession, dir: String): DataFrame = {
    val decoded = graft.census.Tiger.read(s, writeTigerFixture(s, dir))
    decoded.select(
        element_at(col("attrs"), "NATIONKEY").cast("long").as("gid"),
        element_at(col("attrs"), "NAME").as("name"),
        element_at(col("attrs"), "POP").cast("long").as("pop"),
        concat(lit("POLYGON(("),
          array_join(zip_with(col("xs"), col("ys"),
            (x, y) => concat(x.cast("long").cast("string"), lit(" "),
              y.cast("long").cast("string"))), ","),
          lit("))")).as("geom_wkt"))
      .orderBy("gid")
  }

  /** Point-in-polygon spatial join over DECODED shapefile geometry —
    * the query PostGIS answers with ST_Contains after tiger2pgsql
    * loads. Spark-first shape: polygons explode to the 5-unit grid
    * cells their bbox covers (bbox from the parsed coordinate arrays),
    * points key by their single cell, one cell equi-join replaces the
    * O(points × polygons) nested loop, and the residual is a GENERIC
    * even-odd ray cast evaluated over the ring arrays with the
    * `aggregate` higher-order function — works for any simple polygon,
    * not just rectangles, and stays inside codegen (no UDF). Points are
    * md5-derived half-integers so no point ever lies on an integer
    * polygon edge (ray-cast vs closed-BETWEEN boundary semantics can't
    * diverge). The oracle exploits what the fixture geometry IS —
    * axis-aligned squares — and checks via strict BETWEEN from the
    * nation dim: the general algorithm must agree with the closed-form
    * answer on every row. LEFT join keeps empty polygons at zero. */
  /** Even-odd ray cast over ring arrays `xs`/`ys` against point
    * (`px`, `py`), as a codegen'd `aggregate` HOF predicate: counts
    * edges whose half-open y-span covers py and whose x-intercept at py
    * lies right of px; odd count = inside. Works for any simple
    * polygon (convex, concave, any vertex count); horizontal edges
    * never satisfy the y-span test so their zero denominator is
    * unreachable. Exposed for direct property testing on non-square
    * rings the graded fixture doesn't reach. */
  private[graft] def rayCastOdd =
    expr(
      """aggregate(sequence(0, size(xs) - 2), 0, (acc, i) ->
        |  acc + IF( ((ys[i+1] > py) != (ys[i] > py)) AND
        |            (px < xs[i] + (xs[i+1] - xs[i]) * (py - ys[i]) / (ys[i+1] - ys[i])),
        |            1, 0)) % 2 = 1""".stripMargin)

  def tigerPointInPolygon(s: SparkSession, dir: String): DataFrame = {
    def coord(salt: String, m: Int) =
      (conv(substring(md5(concat(col("c_custkey").cast("string"), lit(salt))), 1, 15), 16, 10)
        .cast("long") % m) + lit(0.5)
    val pts = t(s, dir, "customer")
      .filter(col("c_custkey") < 3000)
      .select(col("c_custkey").as("id"),
        coord("tx", 100).as("px"), coord("ty", 15).as("py"))
      .withColumn("cx", (col("px").cast("long") / 5).cast("long"))
      .withColumn("cy", (col("py").cast("long") / 5).cast("long"))
    val polys = graft.census.Tiger.read(s, writeTigerFixture(s, dir))
      .select(
        element_at(col("attrs"), "NATIONKEY").cast("long").as("gid"),
        col("xs"), col("ys"))
    val cells = polys
      .withColumn("cx", explode(expr(
        "sequence(cast(array_min(xs) as long) div 5, cast(array_max(xs) as long) div 5)")))
      .withColumn("cy", explode(expr(
        "sequence(cast(array_min(ys) as long) div 5, cast(array_max(ys) as long) div 5)")))
    val contained = pts.join(cells, Seq("cx", "cy"))
      .filter(rayCastOdd)
      .groupBy("gid")
      .agg(count(lit(1)).as("n_pts"), sum(col("id")).as("sum_ids"))
    polys.select("gid").join(contained, Seq("gid"), "left")
      .select(col("gid"),
        coalesce(col("n_pts"), lit(0L)).as("n_pts"),
        coalesce(col("sum_ids"), lit(0L)).as("sum_ids"))
      .orderBy("gid")
  }

  /** The complete `tiger2pgsql` mirror, end to end under the hash gate:
    * distributed .shp/.dbf decode → WKT + attribute projection →
    * `PgSink.writeCopy` COPY-pipe bulk load into a live, locally
    * initdb-ed PostgreSQL 15 → read back out of Postgres via COPY TO.
    * Every value the oracle hashes (ids, names, numeric attrs, and the
    * geometry text itself) has physically transited the Postgres wire
    * protocol, storage, and text I/O — the same closing-the-loop
    * discipline as `sink_postgres_copy`, applied to the reference's one
    * whole-module geometry path (SURVEY §2.A A15). At 100 TB the decode
    * is per-county-pair task-parallel and each executor partition holds
    * one COPY stream into the warehouse — exactly shp2pgsql | psql,
    * minus the single-process bottleneck. */
  def sinkTigerPostgres(s: SparkSession, dir: String): DataFrame = {
    import graft.census.{PgSink, ScratchPg}
    require(ScratchPg.ensure(), "scratch postgres could not be started")
    val wkt = tigerWktExport(s, dir)
    ScratchPg.exec(
      """DROP TABLE IF EXISTS graft_tiger;
        |CREATE TABLE graft_tiger(
        |  gid BIGINT, name TEXT, pop BIGINT, geom_wkt TEXT)""".stripMargin)
    PgSink.writeCopy(wkt, ScratchPg.dsn, "graft_tiger")
    val back = ScratchPg.copyOut(
      "SELECT gid, name, pop, geom_wkt FROM graft_tiger", expectCols = 4)
      .map(f => (f(0).toLong, f(1), f(2).toLong, f(3)))
    import s.implicits._
    back.toDF("gid", "name", "pop", "geom_wkt").orderBy("gid")
  }

  /** IPF RAKING — the census-weighting algorithm itself (iterative
    * proportional fitting, the method every ACS/PUMS consumer uses to
    * rake a sample to known control totals): the customer sample's
    * (nation × segment) seed counts are raked in three alternating
    * passes (rows, columns, rows) toward data-derived marginal
    * targets — nation controls from the supplier share, segment
    * controls from the order share, both scaled to the customer
    * universe. INTEGER-EXACT throughout: weights live in 1e-6 units,
    * each pass multiplies by a floor-divided factor
    * f = (target·10¹²) div marginal_sum then rescales by div 10⁶, so
    * every intermediate is a BIGINT with documented headroom (targets
    * ≈ N/25 → t·10¹² ≲ 6·10¹⁸ at sf100) and the raked table is
    * bit-identical at any parallelism. Cells whose control is missing
    * (a nation with no suppliers) rake to exactly 0 — the standard
    * "no control, no weight" rule. Scale: the seed census is one
    * map-combined aggregate over the corpus; everything after runs on
    * the 125-cell frame through window sums. */
  def censusIpfRaking(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cust = t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
    val seed = cust.groupBy("n_name", "c_mktsegment").agg(count(lit(1)).as("n_seed"))
    val nTot = cust.agg(count(lit(1)).as("n_cust"))
    val sup = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
    val supTot = sup.agg(count(lit(1)).as("s_tot"))
    val rowT = sup.groupBy("n_name").agg(count(lit(1)).as("s_r"))
      .crossJoin(broadcast(nTot)).crossJoin(broadcast(supTot))
      .select(col("n_name"),
        call_function("div", col("n_cust") * col("s_r"), col("s_tot")).as("t_r"))
    val ordSeg = t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
    val ordTot = ordSeg.agg(count(lit(1)).as("o_tot"))
    val colT = ordSeg.groupBy("c_mktsegment").agg(count(lit(1)).as("o_seg"))
      .crossJoin(broadcast(nTot)).crossJoin(broadcast(ordTot))
      .select(col("c_mktsegment"),
        call_function("div", col("n_cust") * col("o_seg"), col("o_tot")).as("t_c"))
    val w0 = seed
      .join(broadcast(rowT), Seq("n_name"), "left")
      .join(broadcast(colT), Seq("c_mktsegment"), "left")
      .select(col("n_name"), col("c_mktsegment"), col("n_seed"),
        (col("n_seed") * lit(1000000L)).as("w"),
        coalesce(col("t_r"), lit(0L)).as("t_r"),
        coalesce(col("t_c"), lit(0L)).as("t_c"))
    def rake(df: DataFrame, key: String,
        target: org.apache.spark.sql.Column): DataFrame = {
      val ms = sum("w").over(Window.partitionBy(key))
      df.withColumn("ms", ms)
        .withColumn("w", when(col("ms") === 0, lit(0L)).otherwise(
          call_function("div",
            col("w") * call_function("div", target * lit(1000000000000L), col("ms")),
            lit(1000000L))))
        .drop("ms")
    }
    val raked = rake(rake(rake(w0, "n_name", col("t_r")),
      "c_mktsegment", col("t_c")), "n_name", col("t_r"))
    raked.select(col("n_name"), col("c_mktsegment"), col("n_seed"),
        col("w").as("w_final_micro"))
      .orderBy("n_name", "c_mktsegment")
  }

  /** SHOELACE AREA + CENTROID over DECODED shapefile rings — the other
    * half of what PostGIS's ST_Area/ST_Centroid would answer after
    * tiger2pgsql loads (`upstream:censuspgsql/tiger2pgsql.py` [U]):
    * 2A = Σ(xᵢ·yᵢ₊₁ − xᵢ₊₁·yᵢ) over the closed ring and the standard
    * polygon centroid Σ(xᵢ+xᵢ₊₁)·crossᵢ / (3·2A), both evaluated
    * GENERICALLY over the parsed coordinate arrays with the
    * `aggregate` higher-order function (codegen'd, no UDF, works for
    * any simple polygon — the `tiger_point_in_polygon` convention),
    * while the oracle exploits what the fixture geometry IS
    * (2×2 squares at known offsets) and derives area 8 and centroid
    * (4n+1, 3r+1) in closed form from the nation dim — the generic
    * algorithm must agree with the closed form on every polygon.
    * Integer ring coords make 2A and the 1e-6-unit centroid exact
    * BIGINTs (numerator and 3·2A share the winding sign, so the
    * toward-zero division is winding-independent). Map-only over the
    * distributed shapefile scan. */
  /** The shoelace HOF expressions over ring columns `xs`/`ys`, exposed
    * for direct property testing on non-square rings (triangles,
    * concave shapes) the graded fixture never reaches. */
  private[graft] def shoelaceArea2 = expr(
    """aggregate(sequence(0, size(xs) - 2), CAST(0 AS BIGINT), (acc, i) ->
      |  acc + CAST(xs[i] AS BIGINT) * CAST(ys[i+1] AS BIGINT)
      |      - CAST(xs[i+1] AS BIGINT) * CAST(ys[i] AS BIGINT))""".stripMargin)
  private[graft] def shoelaceSumCx = expr(
    """aggregate(sequence(0, size(xs) - 2), CAST(0 AS BIGINT), (acc, i) ->
      |  acc + (CAST(xs[i] AS BIGINT) + CAST(xs[i+1] AS BIGINT)) *
      |        (CAST(xs[i] AS BIGINT) * CAST(ys[i+1] AS BIGINT)
      |         - CAST(xs[i+1] AS BIGINT) * CAST(ys[i] AS BIGINT)))""".stripMargin)
  private[graft] def shoelaceSumCy = expr(
    """aggregate(sequence(0, size(xs) - 2), CAST(0 AS BIGINT), (acc, i) ->
      |  acc + (CAST(ys[i] AS BIGINT) + CAST(ys[i+1] AS BIGINT)) *
      |        (CAST(xs[i] AS BIGINT) * CAST(ys[i+1] AS BIGINT)
      |         - CAST(xs[i+1] AS BIGINT) * CAST(ys[i] AS BIGINT)))""".stripMargin)

  /** AREAL INTERPOLATION — the census geo-crosswalk method itself: when
    * source zones (here the TIGER nation squares) and target zones (a
    * fixed analysis grid) don't nest, counts re-allocate by AREA WEIGHT
    * — alloc = pop · |src ∩ tgt| / |src| — the standard technique for
    * moving ACS estimates between incongruent geographies (block →
    * grid, tract → service area). Geometry is the decoded shapefile
    * bbox per polygon (axis-aligned fixture ⇒ bbox IS the polygon;
    * general polygons would swap in a clipped-area kernel, pipeline
    * unchanged), the grid is a broadcast 30-cell table, intersection
    * areas are exact integer min/max arithmetic and the allocation is
    * a 1e-6-unit floor division — bit-stable in both engines. Output:
    * per grid cell, contributing polygons and allocated population.
    * Scale: polygons scan map-side against the broadcast grid; the
    * rollup is map-combined over |cells| keys. */
  def censusArealInterpolation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val polys = graft.census.Tiger.read(s, writeTigerFixture(s, dir))
      .select(
        element_at(col("attrs"), "NATIONKEY").cast("long").as("gid"),
        element_at(col("attrs"), "POP").cast("long").as("pop"),
        array_min(col("xs")).cast("long").as("x0"),
        array_min(col("ys")).cast("long").as("y0"),
        array_max(col("xs")).cast("long").as("x1"),
        array_max(col("ys")).cast("long").as("y1"))
    // 10×3 grid of 10×5 cells covering the fixture extent [0,100)×[0,15)
    val cells = (for (gx <- 0L until 10L; gy <- 0L until 3L) yield (gx, gy))
      .toDF("gx", "gy")
      .select(col("gx"), col("gy"),
        (col("gx") * 10).as("cx0"), (col("gy") * 5).as("cy0"),
        (col("gx") * 10 + 10).as("cx1"), (col("gy") * 5 + 5).as("cy1"))
    val ix = greatest(lit(0L), least(col("x1"), col("cx1")) - greatest(col("x0"), col("cx0")))
    val iy = greatest(lit(0L), least(col("y1"), col("cy1")) - greatest(col("y0"), col("cy0")))
    polys.crossJoin(broadcast(cells))
      .select(col("gid"), col("pop"), col("gx"), col("gy"),
        (ix * iy).as("ia"), ((col("x1") - col("x0")) * (col("y1") - col("y0"))).as("pa"))
      .filter(col("ia") > 0)
      .select(col("gx"), col("gy"), col("gid"),
        call_function("div", col("pop") * col("ia") * lit(1000000L), col("pa")).as("alloc_micro"))
      .groupBy("gx", "gy")
      .agg(count(lit(1)).as("n_polys"), sum("alloc_micro").as("pop_micro"))
      .orderBy("gx", "gy")
  }

  def tigerPolygonCentroid(s: SparkSession, dir: String): DataFrame = {
    val decoded = graft.census.Tiger.read(s, writeTigerFixture(s, dir))
    decoded.select(
        element_at(col("attrs"), "NATIONKEY").cast("long").as("gid"),
        element_at(col("attrs"), "NAME").as("name"),
        size(col("xs")).cast("long").as("n_points"),
        shoelaceArea2.as("a2"), shoelaceSumCx.as("scx"), shoelaceSumCy.as("scy"))
      .select(col("gid"), col("name"), col("n_points"),
        abs(col("a2")).as("area_x2"),
        call_function("div", col("scx") * lit(1000000L), lit(3L) * col("a2")).as("centroid_x_micro"),
        call_function("div", col("scy") * lit(1000000L), lit(3L) * col("a2")).as("centroid_y_micro"))
      .orderBy("gid")
  }

  /** SEGREGATION INDICES over the customer star — the demographic
    * readout the census literature computes from exactly the kind of
    * group-by-geography tables the reference publishes: the INDEX OF
    * DISSIMILARITY D = Σᵢ|aᵢ·B − bᵢ·A| / (2AB) (share of group a that
    * would have to move between units for an even distribution) and
    * the ISOLATION INDEX ₐP*ₐ = Σᵢ aᵢ²/(A·Tᵢ) (probability a random
    * group-a member's unit-mate is also group a), with units = nations
    * and group a = the BUILDING market segment. Both are exact until
    * the last step: D's numerator is one BIGINT sum of cross-products
    * (no per-unit ratio ever materializes) with a single half-up ratio
    * at the end, and isolation is a per-unit micro-floor sum (the
    * `graph_adamic_adar` per-term discipline — identical integer
    * division on both engines, order-free addition).
    *
    * Scale: one map-combined (unit × group) census — the corpus
    * collapses to ≤|units| rows before any arithmetic; the index
    * algebra runs on that census alone. */
  def censusDissimilarity(s: SparkSession, dir: String): DataFrame = {
    val isA = col("c_mktsegment") === "BUILDING"
    val cens = t(s, dir, "customer")
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count_if(isA).as("a"), count_if(!isA).as("b"))
    val tot = cens.agg(sum("a").as("ta"), sum("b").as("tb"))
    cens.crossJoin(broadcast(tot))
      .select(col("n_name"), col("a"), col("b"),
        abs(col("a") * col("tb") - col("b") * col("ta")).as("d_term"),
        call_function("div", col("a") * col("a") * lit(1000000L),
          col("ta") * (col("a") + col("b"))).as("iso_term"),
        col("ta"), col("tb"))
      .agg(count(lit(1)).as("n_units"),
        max("ta").as("tot_a"), max("tb").as("tot_b"),
        sum("d_term").as("d_num"),
        sum("iso_term").as("isolation_micro"))
      .select(col("n_units"), col("tot_a"), col("tot_b"), col("d_num"),
        Num.ratio(col("d_num"), col("tot_a") * col("tot_b") * 2, 6).as("dissimilarity"),
        col("isolation_micro"))
  }

  /** CELL SUPPRESSION TO FIXPOINT — the full disclosure-avoidance
    * iterate the one-round sibling (`census_suppression`) deliberately
    * stops short of (its round-15 ADVICE finding, made an operator): a
    * complementary cell can itself be the only suppressed cell of its
    * OTHER margin, recoverable by subtraction, so real disclosure
    * avoidance re-scans margins and adds complementaries until NO
    * margin holds exactly one suppressed cell. Three unrolled rounds
    * (row pass then column pass per round, each pass seeing the
    * previous pass's state — the sequential semantics auditors can
    * replay), each new complementary stamped with the round that added
    * it, and a loud `converged` verdict (no lone-suppressed margin
    * remains; a 1-cell margin can never converge and correctly reads
    * false). Pick rule per needy margin: the smallest unsuppressed
    * cell under the (n ASC, key ASC) total order — identical in both
    * engines, so the whole trajectory is deterministic.
    *
    * Scale: the iterate runs ENTIRELY on the (nation × segment) cell
    * frame — ≤ ǀnationsǀ·ǀsegmentsǀ rows; the corpus is touched once
    * by the census, and each pass is two bounded windows. */
  def censusSuppressionFixpoint(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = 5L
    val cells = t(s, dir, "customer")
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n"))
    var st = cells.select(col("n_name"), col("segment"), col("n"),
      (col("n") < k).as("supp"),
      when(col("n") < k, 0L).otherwise(lit(null).cast("long")).as("rnd"))
    def pass(margin: String, other: String, r: Int): Unit = {
      val w = Window.partitionBy(margin)
      val wPick = Window.partitionBy(margin)
        .orderBy(col("supp"), col("n"), col(other))
      st = st
        .withColumn("ns", count_if(col("supp")).over(w))
        .withColumn("rk", row_number().over(wPick))
        .withColumn("add", col("ns") === 1 && !col("supp") && col("rk") === 1)
        .select(col("n_name"), col("segment"), col("n"),
          (col("supp") || col("add")).as("supp"),
          when(col("add"), lit(r.toLong)).otherwise(col("rnd")).as("rnd"))
    }
    for (r <- 1 to 3) { pass("n_name", "segment", r); pass("segment", "n_name", r) }
    val lone = st
      .select(explode(array(concat(lit("r|"), col("n_name")),
        concat(lit("c|"), col("segment")))).as("m"), col("supp"))
      .groupBy("m").agg(count_if(col("supp")).as("ns"))
      .agg(count_if(col("ns") === 1).as("n_lone"))
      .select((col("n_lone") === 0).as("converged"))
    st.select(col("n_name"), col("segment"),
        when(!col("supp"), col("n")).as("published_n"),
        when(col("rnd") === 0, "P").when(col("supp"), "C").otherwise("OK").as("flag"),
        col("rnd").as("supp_round"))
      .crossJoin(broadcast(lone))
      .orderBy("n_name", "segment")
  }

  /** GINI COEFFICIENT of positive account balances per nation — the
    * inequality readout census consumers derive from income
    * distributions: G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over the
    * ascending-sorted values. The rank weight is a per-nation
    * row_number under the (cents ASC, custkey ASC) total order — ties
    * carry equal x, so swapping tied ranks never changes Σ i·xᵢ and the
    * statistic is partition-order-free; everything is BIGINT until the
    * single half-up ratio.
    *
    * Scale: one node-keyed window per nation (each partition is that
    * nation's customers — the same bounded-partition justification as
    * `window_topk_per_group`) feeding a map-combined census; output is
    * |nations| rows. */
  def censusGini(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = round(col("c_acctbal") * 100).cast("long")
    val w = Window.partitionBy("n_name").orderBy(col("cents"), col("c_custkey"))
    t(s, dir, "customer")
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .filter(col("c_acctbal") > 0)
      .select(col("n_name"), col("c_custkey"), cents.as("cents"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_cust"), sum("cents").as("sum_cents"),
        sum(col("rnk") * col("cents")).as("rank_weighted"))
      .select(col("n_name"), col("n_cust"), col("sum_cents"),
        (col("rank_weighted") * 2 - (col("n_cust") + 1) * col("sum_cents")).as("g_num"),
        Num.ratio(
          col("rank_weighted") * 2 - (col("n_cust") + 1) * col("sum_cents"),
          col("n_cust") * col("sum_cents"), 6).as("gini"))
      .orderBy("n_name")
  }

  /** LOCATION QUOTIENTS — the regional-concentration readout economic
    * census consumers compute from industry-by-area tables: LQ(i,j) =
    * (eᵢⱼ/eᵢ)/(Eⱼ/E) for every (nation i, market segment j), as the
    * exact cross-product ratio eᵢⱼ·E / (eᵢ·Eⱼ) — LQ > 1 means segment j
    * concentrates in nation i beyond its national share. All counts
    * BIGINT, one half-up ratio per cell, |nations|×|segments| output
    * rows.
    *
    * Scale: one (nation × segment) map-combined census; marginals
    * derive from it; every join after the census is broadcast-sized. */
  def censusLocationQuotient(s: SparkSession, dir: String): DataFrame = {
    val cens = t(s, dir, "customer")
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("e_ij"))
    val byNation = cens.groupBy("n_name").agg(sum("e_ij").as("e_i"))
    val bySeg = cens.groupBy("segment").agg(sum("e_ij").as("e_j"))
    val total = cens.agg(sum("e_ij").as("e_tot"))
    cens.join(broadcast(byNation), "n_name")
      .join(broadcast(bySeg), "segment")
      .crossJoin(broadcast(total))
      .select(col("n_name"), col("segment"), col("e_ij"), col("e_i"), col("e_j"),
        Num.ratio(col("e_ij") * col("e_tot"), col("e_i") * col("e_j"), 6).as("lq"))
      .orderBy("n_name", "segment")
  }

  /** PRIMARY + COMPLEMENTARY CELL SUPPRESSION — the census
    * disclosure-avoidance step applied to every small-cell table the
    * reference's consumers publish: a cell whose count falls below the
    * threshold (K = 5) is PRIMARY-suppressed, and any row or column
    * margin holding exactly ONE primary cell gets one COMPLEMENTARY
    * suppression — the smallest non-primary cell under the (n ASC,
    * key ASC) total order (ONE round, rows first then columns, the
    * documented deterministic policy). The one-round GUARANTEE is
    * data-independent but deliberately partial: every margin with ≥ 2
    * cells and exactly one PRIMARY ends the round with ≥ 2
    * suppressions, so no primary is recoverable by subtraction. It
    * does NOT chase the closed loop — a C_ROW complementary can itself
    * be the only suppressed cell of its COLUMN on adversarial data, in
    * which case full disclosure avoidance iterates this same
    * rule to fixpoint (round-15 ADVICE find; the fixpoint is a bounded
    * loop over the dimension-sized cell table, not a corpus pass).
    * Output publishes `published_n` only for clean cells — suppressed
    * cells carry NULL and the flag ('P' / 'C_ROW' / 'C_COL' / 'OK'),
    * which is exactly what a downstream consumer of the reference's
    * tables receives. All counts BIGINT; flags are deterministic
    * because every argmin is totally ordered.
    *
    * Scale: one (nation × segment) map-combined census (≤ |units| rows)
    * and three bounded windows over it — the corpus is touched once. */
  def censusSuppression(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = 5L
    val cells = t(s, dir, "customer")
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n"))
      .withColumn("prim", col("n") < k)
    val wRow = Window.partitionBy("n_name")
    val wCol = Window.partitionBy("segment")
    // non-primary cells first (false < true), then smallest-n, keyed
    // tiebreak — rank 1 is the complementary candidate when one exists
    val wRowPick = Window.partitionBy("n_name")
      .orderBy(col("prim"), col("n"), col("segment"))
    val wColPick = Window.partitionBy("segment")
      .orderBy(col("prim"), col("n"), col("n_name"))
    cells
      .withColumn("row_prims", count_if(col("prim")).over(wRow))
      .withColumn("col_prims", count_if(col("prim")).over(wCol))
      .withColumn("row_rnk", row_number().over(wRowPick))
      .withColumn("col_rnk", row_number().over(wColPick))
      .withColumn("flag",
        when(col("prim"), lit("P"))
          .when(col("row_prims") === 1 && col("row_rnk") === 1, lit("C_ROW"))
          .when(col("col_prims") === 1 && col("col_rnk") === 1, lit("C_COL"))
          .otherwise(lit("OK")))
      .select(col("n_name"), col("segment"),
        when(col("flag") === "OK", col("n")).as("published_n"),
        col("flag"))
      .orderBy("n_name", "segment")
  }

  /** THEIL'S H — the entropy-based multi-group segregation index
    * (Theil & Finizza 1971), the standard companion to the
    * dissimilarity index for more than two groups: H = (E − Σᵢ
    * (nᵢ/N)·Eᵢ) / E, where Eᵢ is the entropy of the market-segment mix
    * inside nation i and E the corpus-wide mix entropy. The whole
    * statistic reduces to ONE ratio of exact integers: nᵢ·Eᵢ =
    * Σⱼ nᵢⱼ·ln(nᵢ/nᵢⱼ) and Σᵢ nᵢ = N, so H = (e_all − Σᵢ e_numᵢ) /
    * e_all with e_all = Σⱼ nⱼ·ln(N/nⱼ) — every term a BIGINT count
    * times one ln() quantized to micro-nats (round-half 6 dp, the
    * zipf/entropy-family convention: both engines quantize the same
    * IEEE double, so the integer sums match exactly). The final H is
    * the double division of the two exact single-row BIGINTs (the
    * CUPED convention — a 1e6 pre-scaled integer ratio would wrap
    * BIGINT on sf10 corpus entropies).
    *
    * Output: one row per nation — counts, entropy numerator, per-nation
    * entropy in micro-nats — with the corpus H and total entropy
    * repeated via the whitelisted single-row broadcast cross join.
    *
    * Scale: one (nation × segment) map-combined census (≤ |nations|
    * × |segments| rows); everything after it runs on that bounded
    * frame. */
  def censusTheil(s: SparkSession, dir: String): DataFrame = {
    def lnMicro(num: Column, den: Column): Column =
      round(log(num.cast("double") / den.cast("double")) * 1000000d).cast("long")
    val cells = t(s, dir, "customer")
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_ij"))
    val byNation = cells.groupBy("n_name").agg(sum("n_ij").as("n_i"))
    val withM = cells.join(byNation, "n_name")
    val perNation = withM
      .select(col("n_name"), col("n_i"), col("n_ij"),
        (col("n_ij") * lnMicro(col("n_i"), col("n_ij"))).as("term"))
      .groupBy("n_name").agg(max("n_i").as("n_i"), sum("term").as("e_num"))
    val bySeg = cells.groupBy("segment").agg(sum("n_ij").as("n_j"))
    val eAll = bySeg
      .crossJoin(broadcast(bySeg.agg(sum("n_j").as("nn"))))
      .select((col("n_j") * lnMicro(col("nn"), col("n_j"))).as("term"))
      .agg(sum("term").as("e_all"))
    // H as a double division of the two exact single-row BIGINTs (the
    // CUPED convention): Num.ratio's 1e6 pre-scale would wrap BIGINT at
    // sf10 corpus entropies
    val h = perNation.agg(sum("e_num").as("e_within"))
      .crossJoin(broadcast(eAll))
      .select(col("e_all"),
        round((col("e_all") - col("e_within")).cast("double")
          / col("e_all").cast("double"), 6).as("theil_h"))
    perNation
      .select(col("n_name"), col("n_i"), col("e_num"),
        Num.ratio(col("e_num"), col("n_i"), 0).as("entropy_micro"))
      .crossJoin(broadcast(h))
      .orderBy("n_name")
  }

  /** REPLICATE-WEIGHT VARIANCE (Fay's BRR, the ACS production method —
    * the real bureau publishes 80 replicate weight columns and every
    * consumer of the reference's tables computes variance as
    * (4/R)·Σᵣ(estᵣ − est)²): each unit gets R = 8 deterministic
    * replicate factors 1.5 / 0.5 (md5 bit r of the unit key — the
    * replicate-design hash stands in for the bureau's published
    * columns; the query-side plan is identical with real ones), and
    * per-nation balance totals re-estimate under each replicate.
    * Estimates are exact cents BIGINTs; the squared differences square
    * in 10⁴-cent units (diff div 10000 first) so Σ diff² stays inside
    * BIGINT at every SF, and the standard error / CV emit as doubles of
    * those exact integers. Factor-2 scaling clears the 0.5s: with
    * f2 ∈ {3, 1}, estᵣ2 − est2 = Σ cents·(f2 − 2) and Fay variance
    * (k = 0.5) collapses to (1/R)·Σ(estᵣ2 − est2)².
    *
    * Scale: ONE (nation × replicate) map-combined census — the
    * replicate dimension explodes 8× map-side (bounded), never a
    * second corpus pass; everything after is |nations|×8 rows. */
  def censusReplicateWeights(s: SparkSession, dir: String): DataFrame = {
    val R = 8
    val cents = (Num.money(col("c_acctbal")) * 100).cast("long")
    val base = t(s, dir, "customer")
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), cents.as("cents"),
        conv(substring(md5(concat(lit("rep|"), col("c_custkey"))), 1, 15), 16, 10)
          .cast("long").as("h"))
    val reps = base
      .select(col("n_name"), col("cents"), explode(sequence(lit(0), lit(R - 1))).as("r"),
        col("h"))
      .select(col("n_name"), col("r"),
        // f2 = 3 when bit r of the unit hash is set, else 1 (Fay 1.5/0.5 x2)
        // (SQL-form shiftright: the Scala DSL only takes a literal count)
        (col("cents") * (expr("shiftright(h, cast(r as int))")
          .bitwiseAND(lit(1L)) * 2 + 1)).as("wcents"),
        col("cents"))
    val perRep = reps.groupBy("n_name", "r")
      .agg(sum("wcents").as("est_r2"), sum("cents").as("est"))
    perRep
      .select(col("n_name"), col("est"),
        call_function("div", col("est_r2") - col("est") * 2, lit(10000L)).as("diff_h"))
      .groupBy("n_name")
      .agg(max("est").as("est_cents"),
        call_function("div", sum(col("diff_h") * col("diff_h")), lit(R.toLong))
          .as("var_h2"))
      .select(col("n_name"), col("est_cents"), col("var_h2"),
        round(sqrt(col("var_h2").cast("double")) * 10000d / 100d, 2).as("se_dollars"),
        round(sqrt(col("var_h2").cast("double")) * 10000d * 1000000d
          / col("est_cents").cast("double"), 0).as("cv_micro"))
      .orderBy("n_name")
  }

  /** DIRECT STANDARDIZATION — the rate-adjustment every comparative
    * census table applies before ranking regions ("age-standardized
    * rate", here segment-standardized): nation i's crude negative-
    * balance rate depends on its segment MIX, so the standardized rate
    * re-weights each (nation, segment) stratum rate by the CORPUS
    * segment distribution — rate_std(i) = Σⱼ wⱼ·r(i,j) / Σⱼ wⱼ with
    * wⱼ the corpus-wide segment counts. Stratum rates are half-up
    * micro ratios; the re-weighting is an exact BIGINT weighted sum
    * over ≤ |segments| strata, and the final division is the one
    * half-up ratio. Crude and standardized rates emit side by side —
    * their gap IS the mix effect the operator exists to remove.
    *
    * Scale: one (nation × segment) census (event + population counts
    * in the same pass); everything downstream is bounded frames. */
  def censusAgeStandardize(s: SparkSession, dir: String): DataFrame = {
    val cells = t(s, dir, "customer")
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_pop"),
        count_if(col("c_acctbal") < 0).as("n_event"))
    val w = cells.groupBy("segment").agg(sum("n_pop").as("w_seg"))
    val strata = cells.join(broadcast(w), "segment")
      .select(col("n_name"), col("n_pop"), col("n_event"),
        col("w_seg"),
        // stratum rate in micro, then weighted by the standard population
        (col("w_seg") * Num.ratio(col("n_event") * 1000000L, col("n_pop"), 0)
          .cast("long")).as("w_rate"))
    strata.groupBy("n_name")
      .agg(sum("n_pop").as("n_pop"), sum("n_event").as("n_event"),
        sum("w_rate").as("w_rate_sum"), sum("w_seg").as("w_sum"))
      .select(col("n_name"), col("n_pop"), col("n_event"),
        Num.ratio(col("n_event") * 1000000L, col("n_pop"), 0).as("crude_micro"),
        Num.ratio(col("w_rate_sum"), col("w_sum"), 0).as("std_micro"))
      .orderBy("n_name")
  }

  /** MORAN'S I — global spatial autocorrelation of mean positive
    * account balance across nations, with binary SAME-REGION contiguity
    * weights (wᵢⱼ = 1 iff nations i ≠ j share a region) — the census
    * regional-clustering readout ("do rich nations neighbor rich
    * nations?"). I = (n/S₀)·(Σᵢⱼ wᵢⱼ dᵢ dⱼ)/(Σᵢ dᵢ²) computed entirely
    * on SCALED integer deviations dᵢ = n·x̄ᵢ − Σx̄ (the n· factor clears
    * the mean's division and cancels between numerator and
    * denominator); per region the pair sum collapses to (Σd)² − Σd², so
    * no pair join ever materializes. x̄ᵢ is the half-up integer mean in
    * cents (the `Num` avg algebra). I < 0 reads as dispersion, > 0 as
    * clustering; I emits as the double division of exact single-row
    * BIGINTs (sign falls out naturally; a pre-scaled integer ratio
    * would wrap BIGINT on the cent-scaled cross sums past sf0.1).
    *
    * Scale: one nation-keyed census over the corpus; the deviation
    * algebra runs on the ≤ |nations| frame and the readout is
    * |regions| rows + the whitelisted single-row broadcast. */
  def censusMoranI(s: SparkSession, dir: String): DataFrame = {
    val means = t(s, dir, "customer")
      .filter(col("c_acctbal") > 0)
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_nationkey"), col("n_regionkey"))
      .agg(sum((Num.money(col("c_acctbal")) * 100).cast("long")).as("cents"),
        count(lit(1)).as("cnt"))
      .select(col("n_regionkey"),
        call_function("div", col("cents") * 2 + col("cnt"), col("cnt") * 2).as("m"))
    val tot = means.agg(count(lit(1)).as("n"), sum("m").as("t"))
    val devs = means.crossJoin(broadcast(tot))
      .select(col("n_regionkey"), (col("n") * col("m") - col("t")).as("d"), col("n"))
    val perRegion = devs.groupBy("n_regionkey")
      .agg(count(lit(1)).as("n_nations"), sum("d").as("sd"),
        sum(col("d") * col("d")).as("ssq"), max("n").as("n"))
      .select(col("n_regionkey"), col("n_nations"),
        (col("sd") * col("sd") - col("ssq")).as("cross_sum"),
        (col("n_nations") * (col("n_nations") - 1)).as("s0_pairs"),
        col("ssq"), col("n"))
    val globalI = perRegion
      .agg(max("n").as("n"), sum("cross_sum").as("num"),
        sum("s0_pairs").as("s0"), sum("ssq").as("den"))
      .select(col("s0"),
        // double division of exact single-row BIGINTs — the half-up
        // ratio's 1e6 pre-scale would wrap BIGINT on cent-scaled cross
        // sums past sf0.1, and the sign falls out naturally
        round((col("n") * col("num")).cast("double")
          / (col("s0") * col("den")).cast("double"), 6).as("moran_i"))
    perRegion
      .join(t(s, dir, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("n_nations"), col("cross_sum"), col("ssq"))
      .crossJoin(broadcast(globalI))
      .orderBy("r_name")
  }

  /** GROUPED-DATA MEDIAN — the interpolated median the Census Bureau
    * actually publishes for income (the microdata never leaves the
    * building; consumers see BRACKET counts and the bureau's linear
    * interpolation med = L + w·(n/2 − cum_below)/f within the bracket
    * holding position n/2). Replayed here per nation over $1,000
    * account-balance brackets: the bracket census, the containing
    * bracket (2·cum ≥ n and 2·cum_below < n — exact integer cut), and
    * the interpolation as one half-up micro ratio of exact BIGINTs.
    * Output carries the bracket frame (lo, f, cum_below) next to the
    * estimate, the way published tables do.
    *
    * Scale: corpus → (nation × ≤12 brackets) census map-combined; the
    * cumulative window runs per nation over ≤12 rows; one broadcast
    * join attaches per-nation totals. */
  def censusGroupedMedian(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = 100000L // bracket width in cents ($1,000)
    val cents = round(col("c_acctbal") * 100).cast("long")
    val cells = t(s, dir, "customer")
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), cents.as("cents"))
      // cents >= -99999, so cents + 100000 >= 1 and div truncation = floor
      .withColumn("b", call_function("div", col("cents") + w, lit(w)))
      .groupBy("n_name", "b").agg(count(lit(1)).as("f"))
    val cum = Window.partitionBy("n_name").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = cells.groupBy("n_name").agg(sum("f").as("n_cust"))
    cells
      .withColumn("cum", sum("f").over(cum))
      .join(broadcast(tot), "n_name")
      .filter(col("cum") * 2 >= col("n_cust") &&
        (col("cum") - col("f")) * 2 < col("n_cust"))
      .select(col("n_name"), col("n_cust"),
        (col("b") * w - w).as("bracket_lo_cents"),
        col("f").as("f_in_bracket"),
        (col("cum") - col("f")).as("cum_below"),
        round((col("b") * w - w).cast("double") +
          Num.ratio((col("n_cust") - (col("cum") - col("f")) * 2) * w,
            col("f") * 2, 6), 6).as("grouped_median_cents"))
      .orderBy("n_name")
  }
}
