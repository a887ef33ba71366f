package graft

import org.apache.spark.sql.functions._
import graft.plans.IntervalJoinApi

/** The custom banded interval join: randomized-reference equivalence,
  * band-boundary semantics, and plan shape. */
class IntervalJoinSpec extends GraftSpec {

  test("matches a brute-force reference on 12 random datasets") {
    import SparkSpecBase.spark.implicits._
    (1 to 12).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val nKeys = 1 + rnd.nextInt(6)
      val left = (0 until 30 + rnd.nextInt(50)).map(i =>
        (i.toLong, rnd.nextInt(nKeys + 1).toLong, rnd.nextInt(40).toLong * 1000000L))
      val right = (0 until 30 + rnd.nextInt(50)).map(j =>
        (j.toLong, rnd.nextInt(nKeys).toLong, rnd.nextInt(40).toLong * 1000000L))
      val w = (1 + rnd.nextInt(10)).toLong * 1000000L
      val got = IntervalJoinApi.join(
          left.toDF("id", "k", "t").repartition(3),
          right.toDF("rid", "rk", "rt").repartition(2),
          "k", "t", "rk", "rt", w)
        .select("id", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      val want = (for {
        (id, k, t) <- left
        (rid, rk, rt) <- right
        if rk == k && rt >= t && rt <= t + w
      } yield (id, rid)).sorted
      assert(got.toSeq == want.toSeq, s"seed=$seed: ${got.length} vs ${want.length} pairs")
    }
  }

  test("band is inclusive on both ends; key change resets the buffer") {
    import SparkSpecBase.spark.implicits._
    val l = Seq((1L, 10L, 1000000L), (2L, 20L, 1000000L)).toDF("id", "k", "t")
    val r = Seq((100L, 10L, 1000000L),  // rt == t → in
                (101L, 10L, 3000000L),  // rt == t + w → in
                (102L, 10L, 3000001L),  // beyond band → out
                (103L, 20L, 2000000L))  // other key, in its band
      .toDF("rid", "rk", "rt")
    val got = IntervalJoinApi.join(l, r, "k", "t", "rk", "rt", 2000000L)
      .select("id", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).sorted
    assert(got.toSeq == Seq((1L, 100L), (1L, 101L), (2L, 103L)))
  }

  test("pathological one-hot-key band spills to disk and stays correct") {
    // Adversarial shape: EVERY right row of a single key inside one
    // window — band occupancy 40k rows, far above the 256-row cap set
    // here, so memory is bounded at cap × row size no matter how hot
    // the key gets (the 100 TB skew hazard). Expected output is exact:
    // each left at time t pairs with rights in [t, t+w].
    import SparkSpecBase.spark.implicits._
    val spark2 = SparkSpecBase.spark
    val nRights = 40000
    val lefts = (0 until 20).map(i => (i.toLong, 1L, i.toLong * 1000L))
    val rights = (0 until nRights).map(j => (j.toLong, 1L, j.toLong))
    val w = nRights.toLong + 20000L // whole right range in band for t=0
    val before = graft.plans.IntervalJoinExec.spilledSegments.sum()
    val prev = spark2.conf.getOption(graft.plans.IntervalJoinExec.BandBufferRowsKey)
    spark2.conf.set(graft.plans.IntervalJoinExec.BandBufferRowsKey, "256")
    try {
      val got = IntervalJoinApi.join(
          lefts.toDF("id", "k", "t"), rights.toDF("rid", "rk", "rt"),
          "k", "t", "rk", "rt", w)
        .groupBy("id").agg(count(lit(1)).as("n"), sum("rid").as("s"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      // left i at t=i*1000 sees rights rid in [i*1000, nRights): count and
      // rid-sum are closed-form
      val want = (0 until 20).map { i =>
        val lo = i * 1000L
        val n = nRights - lo
        (i.toLong, n, (lo + nRights - 1) * n / 2)
      }
      assert(got.toSeq == want)
      assert(graft.plans.IntervalJoinExec.spilledSegments.sum() > before,
        "expected the 256-row cap to force at least one disk segment")
    } finally {
      prev match {
        case Some(v) => spark2.conf.set(graft.plans.IntervalJoinExec.BandBufferRowsKey, v)
        case None => spark2.conf.unset(graft.plans.IntervalJoinExec.BandBufferRowsKey)
      }
    }
  }

  test("plan: IntervalJoin exec with one exchange + sort per side, no explode") {
    val ev = graft.tables.Tables.t(spark, sfDir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val df = IntervalJoinApi.join(clicks, purchases,
      "user_id", "click_ts", "p_user", "p_ts", 3600L * 1000000L)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("IntervalJoin"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2, p)
    assert(!p.contains("Generate") && !p.contains("BroadcastNestedLoopJoin"), p)
    // codegen fusion pin (see AsOfJoinSpec)
    assert("""\*\(\d+\) IntervalJoin""".r.findFirstIn(p).isDefined,
      s"IntervalJoin not inside a WholeStageCodegen stage:\n$p")
  }
}
