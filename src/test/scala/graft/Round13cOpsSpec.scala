package graft

import org.apache.spark.sql.functions._
import graft.queries.{CensusQueries, GraphQueries, LlmExtra, MultimodalQueries, TimeSeries}
import graft.tables.Tables.t

/** Semantic pins for the second round-13 wave (all DuckDB-oracle-checked;
  * these replay the algorithms sequentially in plain Scala): the banded
  * matrix profile window-by-window, the IPF rake pass-by-pass, and the
  * scene segmentation frame-by-frame.
  */
class Round13cOpsSpec extends GraftSpec {

  test("ts_matrix_profile_discord replays the banded profile") {
    // hourly series from the engine's own cents cast (the replay tests
    // the WINDOW/DISTANCE/ARGMIN logic, not double→decimal rounding)
    val hours = t(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .select(call_function("div", unix_micros(col("ts")), lit(3600000000L)).as("h"),
        (graft.queries.Num.money(col("value")) * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byHour = hours.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val h0 = byHour.keys.min
    val h1 = byHour.keys.max
    val c = (h0 to h1).map(h => byHour.getOrElse(h, 0L)).toArray
    val nWin = (h1 - h0 - 22).toInt // windows i = h0 .. h1-23
    def d2(i: Int, j: Int): Long =
      (0 until 24).map(k => { val d = c(i + k) - c(j + k); d * d }).sum
    val prof = (0 until nWin).map { i =>
      val (dd, j) = (0 until nWin).filter(j => math.abs(i - j) >= 12)
        .map(j => (d2(i, j), j)).min
      (h0 + i, h0 + j, dd)
    }
    val expect = prof.sortBy { case (i, _, d) => (-d, i) }.take(25)
    val got = TimeSeries.tsMatrixProfileDiscord(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
  }

  test("census_ipf_raking replays the three passes and hits row controls") {
    val cust = t(spark, sfDir, "customer")
      .join(t(spark, sfDir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .select("n_name", "c_mktsegment").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val seed = cust.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = cust.length.toLong
    val sup = t(spark, sfDir, "supplier")
      .join(t(spark, sfDir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .select("n_name").collect().map(_.getString(0))
    val sTot = sup.length.toLong
    val tR = sup.groupBy(identity).view.mapValues(v => n * v.length / sTot).toMap
    val ord = t(spark, sfDir, "orders")
      .join(t(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
      .select("c_mktsegment").collect().map(_.getString(0))
    val oTot = ord.length.toLong
    val tC = ord.groupBy(identity).view.mapValues(v => n * v.length / oTot).toMap
    var w: Map[(String, String), Long] = seed.view.mapValues(_ * 1000000L).toMap
    def rake(byRow: Boolean): Unit = {
      val ms = w.toSeq.groupBy { case ((r, c), _) => if (byRow) r else c }
        .view.mapValues(_.map(_._2).sum).toMap
      w = w.map { case ((r, cseg), wv) =>
        val key = if (byRow) r else cseg
        val target = if (byRow) tR.getOrElse(r, 0L) else tC.getOrElse(cseg, 0L)
        val m = ms(key)
        (r, cseg) -> (if (m == 0) 0L else wv * (target * 1000000000000L / m) / 1000000L)
      }
    }
    rake(byRow = true); rake(byRow = false); rake(byRow = true)
    val expect = seed.keys.toSeq.sorted.map { case (r, c) =>
      (r, c, seed((r, c)), w((r, c)))
    }
    val got = CensusQueries.censusIpfRaking(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect)
    // after the final ROW pass, every raked row marginal sits within
    // rounding slack of its control (each cell floor-drops < 1 µ-unit
    // per factor application; 5 cells/row ⇒ slack ≤ ~10 µ-units + the
    // factor's own floor loss, bounded here at 1e-4 of the target)
    val rowSum = w.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    for ((r, target) <- tR if rowSum.contains(r) && rowSum(r) > 0) {
      val diff = math.abs(rowSum(r) - target * 1000000L)
      assert(diff <= math.max(target * 100L, 1000L),
        s"row $r raked ${rowSum(r)} vs control ${target * 1000000L}")
    }
  }

  test("mm_video_scene_cut replays segmentation frame-by-frame") {
    val docs = t(spark, sfDir, "documents")
      .filter(col("doc_id") < 600 && col("doc_id") % 3 === 2)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def md5hex(s: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(s).map("%02x".format(_)).mkString
    val per = docs.map { case (id, text) =>
      val hx = md5hex(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val nFrames = 25L * (1 + java.lang.Long.parseLong(hx.substring(16, 24), 16) % 256)
      val frames = 0L.until(nFrames, 25L)
      val inten = frames.map { f =>
        f -> java.lang.Long.parseLong(
          md5hex(s"$id:$f:scene".getBytes("UTF-8")).substring(0, 8), 16) % 256
      }
      var cuts = 0L
      var sceneLen = 1L
      var maxScene = 1L
      inten.sliding(2).foreach {
        case Seq((_, a), (_, b)) =>
          if (math.abs(b - a) > 96) { cuts += 1; sceneLen = 1 }
          else sceneLen += 1
          maxScene = math.max(maxScene, sceneLen)
        case _ => ()
      }
      (id, frames.size.toLong, cuts, maxScene)
    }
    val expect = per.sortBy { case (id, _, c, _) => (-c, id) }.take(25).toSeq
    val got = MultimodalQueries.mmVideoSceneCut(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect)
  }

  test("llm_span_corruption_plan replays the seeded mask token-by-token") {
    val docs = t(spark, sfDir, "documents").filter(col("doc_id") < 2000)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val per = docs.map { case (id, lang, text) =>
      val n = text.split(" ", -1).length
      val st = (0 until n).map(i =>
        java.lang.Long.parseLong(md5hex(s"$id:$i:span").substring(0, 8), 16) % 20 == 0)
      val masked = (0 until n).map(i =>
        st(i) || (i >= 1 && st(i - 1)) || (i >= 2 && st(i - 2)))
      val spans = (0 until n).count(i => masked(i) && (i == 0 || !masked(i - 1)))
      (lang, n.toLong, masked.count(identity).toLong, spans.toLong)
    }
    val expect = per.groupBy(_._1).toSeq.map { case (lang, xs) =>
      val (tok, msk, sp) = (xs.map(_._2).sum, xs.map(_._3).sum, xs.map(_._4).sum)
      (lang, xs.length.toLong, tok, msk, sp, tok - msk + sp)
    }.sortBy(_._1)
    val got = LlmExtra.llmSpanCorruptionPlan(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(6))).toSeq
    assert(got == expect)
  }

  test("shoelace area/centroid is exact on non-square rings") {
    val sp = spark
    import sp.implicits._
    // triangle (0,0)-(6,0)-(0,9): 2A=54, centroid (2,3); concave L
    // (0,0)-(4,0)-(4,2)-(2,2)-(2,6)-(0,6): 2A=32, centroid (1.5, 2.5)
    // (checked by rectangle decomposition: 8@(2,1) ∪ 8@(1,4))
    val rings = Seq(
      ("tri", Seq(0.0, 6.0, 0.0, 0.0), Seq(0.0, 0.0, 9.0, 0.0)),
      ("ell", Seq(0.0, 4.0, 4.0, 2.0, 2.0, 0.0, 0.0),
        Seq(0.0, 0.0, 2.0, 2.0, 6.0, 6.0, 0.0)))
      .toDF("name", "xs", "ys")
    val out = rings.select(col("name"),
        CensusQueries.shoelaceArea2.as("a2"),
        call_function("div", CensusQueries.shoelaceSumCx * lit(1000000L),
          lit(3L) * CensusQueries.shoelaceArea2).as("cx"),
        call_function("div", CensusQueries.shoelaceSumCy * lit(1000000L),
          lit(3L) * CensusQueries.shoelaceArea2).as("cy"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("tri") == ((54L, 2000000L, 3000000L)))
    assert(out("ell") == ((32L, 1500000L, 2500000L)))
  }

  test("census_areal_interpolation conserves each polygon's population") {
    // Σ over cells of alloc(poly, cell) = pop·10⁶ exactly when the grid
    // tiles the polygon (it does: cell edges at multiples of 5 ≥ the
    // 2×2 squares' extent), minus ≤ 1 µ-unit floor loss per covered cell
    val nations = t(spark, sfDir, "nation")
      .select("n_nationkey", "n_regionkey").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
    val expectTotal = nations.map { case (n, r) => n * 1000 + r }.sum * 1000000L
    val got = CensusQueries.censusArealInterpolation(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val allocTotal = got.map(_._4).sum
    assert(allocTotal <= expectTotal && allocTotal >= expectTotal - 4L * nations.length,
      s"allocated $allocTotal vs population $expectTotal")
    // fixture squares span ≤ 2 cells per axis → ≤ 4 contributions each
    assert(got.map(_._3).sum <= 4L * nations.length)
  }

  test("graph_effective_diameter flags exactly one row, cum monotone") {
    val rows = GraphQueries.graphEffectiveDiameter(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(4)))
    assert(rows.count(_._4) == 1, "exactly one effective-diameter row")
    assert(rows.map(_._1).toSeq == rows.map(_._1).toSeq.sorted)
    val cums = rows.map(_._3).toSeq
    assert(cums == cums.sorted && cums.last == rows.map(_._2).sum)
    val total = cums.last
    val eff = rows.find(_._4).get
    assert(eff._3 * 10 >= total * 9)
    rows.takeWhile(!_._4).foreach(r => assert(r._3 * 10 < total * 9))
  }
}
