package graft

import java.sql.Date
import graft.queries.{GeoQueries, LlmExtra, Quality}

/** Semantic pins for the round-10 operators (each is also fully
  * DuckDB-oracle-checked; these drive the parameterized engine cores
  * with crafted inputs whose answers are hand-computable — radius
  * boundaries and d² ties for k-NN, an exactly-derivable KM curve,
  * and BPE's greedy-overlap + tie-break conventions). */
class Round10OpsSpec extends GraftSpec {

  test("geo_knn_join engine: radius bound, d² ties, and empty regions") {
    import SparkSpecBase.spark.implicits._
    // probes are id ≡ 0 (mod 7): 0, 7, 14
    val pts = Seq(
      (0L, 100L, 100L),  // probe with a rich neighborhood
      (1L, 100L, 110L),  // d2 = 100 — ties with id 2, nid breaks it
      (2L, 110L, 100L),  // d2 = 100
      (3L, 100L, 141L),  // d2 = 1681 > R² — excluded by the radius bound
      (4L, 130L, 130L),  // d2 = 1800 — inside the 3×3 cells, outside R
      (5L, 101L, 100L),  // d2 = 1 — nearest
      (7L, 300L, 300L),  // probe in an empty region → zero rows
      (14L, 0L, 0L),     // probe near the origin
      (6L, 39L, 0L),     // d2 = 1521, same cell as the probe
      (8L, 0L, 40L)      // d2 = 1600 — exactly on the R² boundary, kept
    ).toDF("id", "x", "y")
    val got = GeoQueries.knnOn(pts, radius = 40L, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expect = Seq(
      (0L, 5L, 1L, 1L), (0L, 1L, 100L, 2L), (0L, 2L, 100L, 3L),
      (14L, 6L, 1521L, 1L), (14L, 8L, 1600L, 2L))
    assert(got.toSeq == expect, s"knn rows:\n${got.toSeq}\nexpect $expect")
  }

  test("event_survival_km engine: hand-derived curve with censoring") {
    import SparkSpecBase.spark.implicits._
    def d(s: String) = Date.valueOf(s)
    // dmax = 2024-02-01 → censor cutoff 2024-01-25
    val e = Seq(
      (1L, d("2024-01-01")), (1L, d("2024-01-03")),        // dur 2, death
      (2L, d("2024-01-01")), (2L, d("2024-01-03")),        // dur 2, death
      (3L, d("2024-01-01")), (3L, d("2024-01-05")),        // dur 4, death
      (4L, d("2024-01-10")), (4L, d("2024-02-01")),        // dur 22, censored
      (5L, d("2024-01-02"))                                 // dur 0, death
    ).toDF("user_id", "d")
    val got = Quality.survivalOn(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // the expected survival replays the same fold the engine and the
    // oracle run: S ← S · (1 − deaths/at-risk) in lifetime order
    var s = 1.0
    val exp = Seq((0L, 1L, 1L, 5L), (2L, 2L, 2L, 4L), (4L, 1L, 1L, 2L), (22L, 1L, 0L, 1L))
      .map { case (dur, tot, dth, risk) =>
        s = s * (1.0 - dth.toDouble / risk.toDouble)
        (dur, tot, dth, risk, s)
      }
    assert(got.toSeq == exp, s"KM curve:\ngot    ${got.toSeq}\nexpect $exp")
    assert(math.abs(got(1)._5 - 0.4) < 1e-15 && math.abs(got(3)._5 - 0.2) < 1e-15)
  }

  test("llm_bpe_train engine: greedy overlap runs and lexicographic tie-break") {
    import SparkSpecBase.spark.implicits._
    // aaaa×2 + aaa + ab: round 1 merges (a,a) with weight 3·2+2+0=8;
    // inside `aaaa` the match run {0,1,2} keeps offsets 0 and 2 (greedy
    // left-to-right), inside `aaa` it keeps only 0 → `aa a`. Round 3 is
    // the tie: (aa,a) and (a,b) both count 1 — "a b" < "aa a" wins.
    val words = Seq("aaaa", "aaaa", "aaa", "ab").toDF("w")
    val got = LlmExtra.bpeTrainOnWords(SparkSpecBase.spark, words, rounds = 6).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expect = Seq(
      (1L, "a a", 8L), (2L, "aa aa", 2L), (3L, "a b", 1L), (4L, "aa a", 1L))
    assert(got.toSeq == expect,
      s"merge sequence:\ngot    ${got.toSeq}\nexpect $expect")
  }
}
