package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import org.apache.spark.sql.functions._
import graft.queries.Num

/** Property tests for the exact-arithmetic layer (SURVEY §7.3 risk 1):
  * the integer half-up average must equal BigDecimal HALF_UP of the true
  * rational average, for any partitioning, including negatives. Inputs
  * come from a fixed-seed generator (the scalatest+scalacheck bridge is
  * not in the offline cache). */
class NumSpec extends GraftSpec {

  private val rng = new scala.util.Random(0xC0FFEE)

  private def refAvg(xs: Seq[JBD], p: Int): Double =
    xs.reduce(_.add(_)).divide(new JBD(xs.size), p, RoundingMode.HALF_UP).doubleValue

  test("avgMoney(p=4) equals BigDecimal HALF_UP average for random 2-decimal inputs") {
    import SparkSpecBase.spark.implicits._
    (1 to 30).foreach { _ =>
      val cents = Seq.fill(1 + rng.nextInt(40))(rng.between(-999999L, 999999L))
      val got = cents.map(_ / 100.0).toDF("x").repartition(3)
        .agg(Num.avgMoney(col("x"), 4).as("a")).collect()(0).getDouble(0)
      val want = refAvg(cents.map(c => new JBD(c).movePointLeft(2)), 4)
      assert(got == want, s"cents=$cents got=$got want=$want")
    }
  }

  test("avgInt(p=2) equals BigDecimal HALF_UP for integer inputs") {
    import SparkSpecBase.spark.implicits._
    (1 to 30).foreach { _ =>
      val ints = Seq.fill(1 + rng.nextInt(40))(rng.between(-10000, 10000))
      val got = ints.toDF("x")
        .agg(Num.avgInt(col("x"), 2).as("a")).collect()(0).getDouble(0)
      val want = refAvg(ints.map(new JBD(_)), 2)
      assert(got == want, s"ints=$ints got=$got want=$want")
    }
  }

  test("ratio is exact half-up and 0-safe") {
    import SparkSpecBase.spark.implicits._
    val df = Seq((1, 8), (7, 160), (5, 0), (1, 3)).toDF("n", "d")
      .select(Num.ratio(col("n"), col("d"), 4).as("r"))
    val got = df.collect().map(_.getDouble(0)).toSeq
    // 1/8 = 0.125 → 0.125; 7/160 = 0.04375 → half-up 0.0438 (the exact
    // boundary case a double round() gets wrong); 5/0 → 0; 1/3 → 0.3333
    assert(got == Seq(0.125, 0.0438, 0.0, 0.3333))
  }

  test("exact decimal money sums are partition-order independent") {
    import SparkSpecBase.spark.implicits._
    val xs = (1 to 999).map(i => (i % 100) + 0.05)
    val a = xs.toDF("x").repartition(1).agg(Num.sumMoney(col("x"))).collect()(0).getDouble(0)
    val b = xs.toDF("x").repartition(7).agg(Num.sumMoney(col("x"))).collect()(0).getDouble(0)
    assert(a == b)
  }

  test("minhash signature determinism and self-similarity") {
    val texts = Seq("a b c d e f g", "x y z", "the same words the same words")
    texts.foreach { t =>
      val s1 = graft.llm.MinHash.signature(t)
      val s2 = graft.llm.MinHash.signature(t)
      assert(s1.sameElements(s2))
      assert(graft.llm.MinHash.estJaccard(s1, s2) == 1.0)
    }
    // disjoint shingle sets → estimate near 0
    val a = graft.llm.MinHash.signature("aa bb cc dd ee ff")
    val b = graft.llm.MinHash.signature("gg hh ii jj kk ll")
    assert(graft.llm.MinHash.estJaccard(a, b) <= 0.15)
  }
}
