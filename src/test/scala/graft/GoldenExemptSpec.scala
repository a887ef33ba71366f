package graft

/** Golden-output pins for the 4 oracle-exempt queries at sf0.001: row
  * count + MD5 of the sorted stringified rows. The invariant tests in
  * OracleExemptSpec catch wrong MATH; these catch silent BEHAVIOR drift
  * (a changed seed, band count, stub constant, split boundary) that
  * preserves the invariants. Every exempt query is deterministic by
  * design — including the sketches (fixed seeds) — so these digests are
  * stable at any partitioning (rows are sorted before hashing; verified
  * across widths). If a pin fails after an INTENTIONAL semantic change,
  * regenerate with `sbt "runMain graft.ProbeGolden"`. */
class GoldenExemptSpec extends GraftSpec {

  private val golden = Map(
    "agg_approx_distinct" -> (5, "9773b0398f23e85c7b167f9f5f1d2268"),
    "agg_approx_percentile" -> (5, "812e349bebb023fa3b124cec9fbef536"),
    "agg_count_min_sketch" -> (20, "b9fc61be1864f36d88cb15bf4d8b7716"),
    // minhash/simhash/fingerprint/lsh_topk/ivf_topk/ingest_census_csv
    // (and later llm_pack_sequences + the mm_* stubs, once the stub
    // decoder moved to md5-slice arithmetic) graduated to full DuckDB
    // oracles in round 4 — no pins needed
    "agg_hll_union" -> (6, "d3b303c7cd4f4c9a742d313775e5d09f"))

  private def digest(rows: Array[String]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(rows.sorted.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  golden.foreach { case (name, (nRows, md5)) =>
    test(s"golden: $name") {
      val rows = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .collect().map(_.toString)
      assert(rows.length == nRows, s"$name rows ${rows.length} != $nRows")
      assert(digest(rows) == md5,
        s"$name output drifted from the golden digest — if intentional, " +
          "regenerate via `sbt \"runMain graft.ProbeGolden\"`")
    }
  }
}
