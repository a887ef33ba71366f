package graft

import org.apache.spark.sql.functions._
import graft.plans.AsOf

/** The custom as-of join operator (LogicalPlan + Strategy + SparkPlan):
  * result equivalence against the window-composed formulation, edge
  * semantics, and the physical shape (one exchange + sort per side, the
  * merge itself adds none). */
class AsOfJoinSpec extends GraftSpec {

  private def nativeAsof() = {
    val ev = graft.tables.Tables.t(spark, sfDir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
    AsOf.join(purchases, clicks, "user_id", "ts", "c_user", "click_ts")
  }

  test("native as-of join matches the window-composed join_asof row for row") {
    val native = nativeAsof()
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("purchase_us"),
        unix_micros(col("click_ts")).as("last_click_us"))
      .orderBy("event_id")
      .collect().map(_.toString)
    val composed = graft.queries.Relational.joinAsof(spark, sfDir)
      .collect().map(_.toString)
    assert(native.length == composed.length)
    assert(native.sameElements(composed))
  }

  test("edge semantics: equal timestamps match; no earlier click → null") {
    import SparkSpecBase.spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val l = Seq((1L, 10L, ts("2024-01-01 10:00:00")), // exact-tie click
                (2L, 10L, ts("2024-01-01 09:00:00")), // before any click
                (3L, 20L, ts("2024-01-01 12:00:00")), // user with no clicks
                (4L, 10L, ts("2024-01-01 11:00:00"))) // later click wins
      .toDF("event_id", "user_id", "ts")
    val r = Seq((10L, ts("2024-01-01 10:00:00")),
                (10L, ts("2024-01-01 10:30:00")))
      .toDF("c_user", "click_ts")
    val got = AsOf.join(l, r, "user_id", "ts", "c_user", "click_ts")
      .select(col("event_id"), col("click_ts"))
      .collect().map(row => row.getLong(0) -> Option(row.get(1)).map(_.toString).orNull)
      .toMap
    assert(got(1L) == "2024-01-01 10:00:00.0") // ≤, not <
    assert(got(2L) == null)
    assert(got(3L) == null)
    assert(got(4L) == "2024-01-01 10:30:00.0") // greatest ≤, not first
  }

  test("tolerance: match drops when the best click is older than the bound") {
    import SparkSpecBase.spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val l = Seq((1L, 10L, ts("2024-01-01 10:30:00")),  // click 30 min ago → within 1h
                (2L, 10L, ts("2024-01-01 12:30:00"))) // click 2.5h ago → out of bound
      .toDF("event_id", "user_id", "ts")
    val r = Seq((10L, ts("2024-01-01 10:00:00"))).toDF("c_user", "click_ts")
    val got = graft.plans.AsOf.join(l, r, "user_id", "ts", "c_user", "click_ts",
        toleranceUs = Some(3600L * 1000000L))
      .select(col("event_id"), col("click_ts"))
      .collect().map(row => row.getLong(0) -> Option(row.get(1)).map(_.toString).orNull)
      .toMap
    assert(got(1L) == "2024-01-01 10:00:00.0")
    assert(got(2L) == null)
  }

  test("forward: first right at-or-after; one right row serves several lefts") {
    import SparkSpecBase.spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val l = Seq((1L, 10L, ts("2024-01-01 09:00:00")),  // → 10:00 purchase
                (2L, 10L, ts("2024-01-01 09:30:00")),  // → same 10:00 purchase
                (3L, 10L, ts("2024-01-01 10:00:00")),  // exact tie → 10:00
                (4L, 10L, ts("2024-01-01 11:00:00"))) // after all purchases → null
      .toDF("event_id", "user_id", "ts")
    val r = Seq((10L, ts("2024-01-01 08:00:00")),      // before everything — skipped
                (10L, ts("2024-01-01 10:00:00")))
      .toDF("p_user", "p_ts")
    val got = graft.plans.AsOf.join(l, r, "user_id", "ts", "p_user", "p_ts", forward = true)
      .select(col("event_id"), col("p_ts"))
      .collect().map(row => row.getLong(0) -> Option(row.get(1)).map(_.toString).orNull)
      .toMap
    assert(got(1L) == "2024-01-01 10:00:00.0")
    assert(got(2L) == "2024-01-01 10:00:00.0")
    assert(got(3L) == "2024-01-01 10:00:00.0")
    assert(got(4L) == null)
  }

  test("nearest: closest side wins, exact tie goes to the earlier right") {
    import SparkSpecBase.spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val l = Seq((1L, 10L, ts("2024-01-01 10:10:00")),  // 10 min after A, 50 before B → A
                (2L, 10L, ts("2024-01-01 10:40:00")),  // 40 after A, 20 before B → B
                (3L, 10L, ts("2024-01-01 10:30:00")),  // exact tie → earlier (A)
                (4L, 99L, ts("2024-01-01 10:30:00"))) // no clicks for key → null
      .toDF("event_id", "user_id", "ts")
    val r = Seq((10L, ts("2024-01-01 10:00:00")),  // A
                (10L, ts("2024-01-01 11:00:00")))  // B
      .toDF("c_user", "click_ts")
    val got = graft.plans.AsOf.join(l, r, "user_id", "ts", "c_user", "click_ts",
        nearest = true)
      .select(col("event_id"), col("click_ts"))
      .collect().map(row => row.getLong(0) -> Option(row.get(1)).map(_.toString).orNull)
      .toMap
    assert(got(1L) == "2024-01-01 10:00:00.0")
    assert(got(2L) == "2024-01-01 11:00:00.0")
    assert(got(3L) == "2024-01-01 10:00:00.0")
    assert(got(4L) == null)
  }

  test("plan: AsOfJoinExec with exactly one exchange+sort per side") {
    val df = nativeAsof()
    df.collect()
    // AQE's toString appends the pre-adaptive plan after "== Initial
    // Plan ==" — count nodes in the FINAL plan only
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("AsOfJoin"), p) // exec node prints without the Exec suffix
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2, p)
    assert("Sort ".r.findAllIn(p).size >= 2, p)
    // whole-stage codegen FUSES the custom exec: the node prints with the
    // codegen-stage star, i.e. downstream operators consume scanner rows
    // inside one generated loop, no boundary materialization
    assert("""\*\(\d+\) AsOfJoin""".r.findFirstIn(p).isDefined,
      s"AsOfJoin not inside a WholeStageCodegen stage:\n$p")
  }
}
