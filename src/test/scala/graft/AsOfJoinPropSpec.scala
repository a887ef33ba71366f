package graft

import org.apache.spark.sql.functions._
import graft.plans.AsOf

/** Property-style check of the custom as-of merge against a plain Scala
  * reference on randomized inputs (fixed seeds — deterministic): many
  * keys, duplicate timestamps, keys present on only one side, and
  * partition boundaries all get exercised far beyond the handwritten
  * cases. */
class AsOfJoinPropSpec extends GraftSpec {

  private def reference(
      left: Seq[(Long, Long, Long)], // (id, key, time)
      right: Seq[(Long, Long)], // (key, time)
      tolUs: Long, forward: Boolean): Map[Long, Option[Long]] =
    left.map { case (id, k, t) =>
      val cand =
        if (forward) right.filter(r => r._1 == k && r._2 >= t && (tolUs < 0 || r._2 - t <= tolUs))
          .map(_._2).minOption
        else right.filter(r => r._1 == k && r._2 <= t && (tolUs < 0 || t - r._2 <= tolUs))
          .map(_._2).maxOption
      id -> cand
    }.toMap

  private def runCase(seed: Int, tolUs: Long, forward: Boolean): Unit = {
    import SparkSpecBase.spark.implicits._
    val rnd = new scala.util.Random(seed)
    val nKeys = 1 + rnd.nextInt(8)
    val left = (0 until 40 + rnd.nextInt(60)).map(i =>
      (i.toLong, rnd.nextInt(nKeys + 2).toLong, rnd.nextInt(50).toLong * 1000000L))
    val right = (0 until 30 + rnd.nextInt(60)).map(_ =>
      (rnd.nextInt(nKeys).toLong, rnd.nextInt(50).toLong * 1000000L))
    val lDf = left.toDF("id", "k", "t").repartition(3) // force partition boundaries
    val rDf = right.toDF("rk", "rt").repartition(4)
    val got = AsOf.join(lDf, rDf, "k", "t", "rk", "rt",
        toleranceUs = if (tolUs < 0) None else Some(tolUs), forward = forward)
      .select(col("id"), col("rt"))
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    val want = reference(left, right, tolUs, forward)
    assert(got.size == left.size, s"seed=$seed: row count ${got.size} != ${left.size}")
    for ((id, exp) <- want)
      assert(got(id) == exp,
        s"seed=$seed tol=$tolUs fwd=$forward id=$id: got ${got(id)}, want $exp")
  }

  test("backward as-of matches the reference on 12 random datasets") {
    (1 to 12).foreach(s => runCase(s, -1L, forward = false))
  }

  test("backward with tolerance matches the reference") {
    (1 to 8).foreach(s => runCase(100 + s, 10000000L, forward = false))
  }

  test("forward as-of matches the reference") {
    (1 to 8).foreach(s => runCase(200 + s, -1L, forward = true))
  }

  test("forward with tolerance matches the reference") {
    (1 to 8).foreach(s => runCase(300 + s, 5000000L, forward = true))
  }

  test("nearest matches the reference on 8 random datasets") {
    import SparkSpecBase.spark.implicits._
    (1 to 8).foreach { seed =>
      val rnd = new scala.util.Random(400 + seed)
      val nKeys = 1 + rnd.nextInt(8)
      val left = (0 until 40 + rnd.nextInt(40)).map(i =>
        (i.toLong, rnd.nextInt(nKeys + 2).toLong, rnd.nextInt(50).toLong * 1000000L))
      val right = (0 until 30 + rnd.nextInt(40)).map(_ =>
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(50).toLong * 1000000L))
      val got = graft.plans.AsOf.join(
          left.toDF("id", "k", "t").repartition(3),
          right.toDF("rk", "rt").repartition(4),
          "k", "t", "rk", "rt", nearest = true)
        .select(col("id"), col("rt"))
        .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
      left.foreach { case (id, k, t) =>
        val cands = right.filter(_._1 == k).map(_._2)
        val exp = if (cands.isEmpty) None
          else Some(cands.minBy(rt => (math.abs(rt - t), rt)))
        assert(got(id) == exp, s"seed=$seed id=$id: got ${got(id)}, want $exp")
      }
    }
  }
}
