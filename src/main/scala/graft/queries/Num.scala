package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact-arithmetic helpers for oracle hash-parity (SURVEY §2.C rule 3,
  * §7.3 risk 1).
  *
  * The failure mode these kill: `round(double, k)` disagrees between
  * engines whenever the true value sits on a decimal rounding boundary —
  * Spark rounds the shortest decimal representation HALF_UP, DuckDB
  * rounds the binary value. Money columns in the testdata are exact
  * 2-decimal values, so products (4- or 6-decimal true values) and
  * averages (sum/n often terminating exactly at the boundary digit) hit
  * this constantly. Double sums are also partition-order dependent, so a
  * result that matches at one parallelism can flip at another.
  *
  * Discipline: cast money to decimal at the scan, do all arithmetic in
  * decimal (exact, associative — partition-order independent), round the
  * exact decimal (HALF_UP both engines), and only then emit double.
  * Averages go through integer arithmetic entirely: both engines compute
  * the identical `(2·units·10^p + n) div 2n` half-up quotient.
  */
object Num {

  /** 2-decimal money/rate column → exact decimal. Width 12 keeps decimal
    * products of three factors within both engines' 38-digit cap. */
  def money(c: Column): Column = c.cast("decimal(12,2)")

  /** Rate column (discount/tax, |x| < 10) → tight decimal. */
  def rate(c: Column): Column = c.cast("decimal(3,2)")

  /** Exact decimal aggregate → round 2 → double (final output form). */
  def d2(c: Column): Column = round(c, 2).cast("double")

  /** Exact sum of a 2-decimal money column, rounded, as double. */
  def sumMoney(c: Column): Column = d2(sum(money(c)))

  /** Exact half-away-from-zero average of a 2-decimal column at `p`
    * decimals, via integer arithmetic (identical in DuckDB with `//`,
    * which truncates toward zero exactly like Spark's `div`). */
  def avgMoney(c: Column, p: Int): Column =
    avgOfUnits(sum((money(c) * 100).cast("long")), 2, p)

  /** Same for an integral column (token counts, JSON ints). */
  def avgInt(c: Column, p: Int): Column =
    avgOfUnits(sum(c.cast("long")), 0, p)

  /** avg of a quantity held as exact long `units` in 10^-k units, to `p`
    * decimal places, half away from zero. */
  private def avgOfUnits(units: Column, k: Int, p: Int): Column = {
    require(p >= k)
    val n = count(lit(1))
    val scaled = abs(units) * lit(math.pow(10, p - k).toLong)
    val q = call_function("div", scaled * 2 + n, n * 2)
    (signum(units).cast("long") * q).cast("double") / lit(math.pow(10, p))
  }

  /** Scalar (non-aggregate) half-up ratio of two non-negative integer
    * columns at `p` decimals — exact integer arithmetic, division-free of
    * float ambiguity. Emits 0 when the denominator is 0. */
  def ratio(num: Column, den: Column, p: Int): Column = {
    val scaled = num.cast("long") * lit(math.pow(10, p).toLong)
    val q = call_function("div", scaled * 2 + den, den * 2)
    when(den === 0, lit(0.0))
      .otherwise(q.cast("double") / lit(math.pow(10, p)))
  }

  /** DuckDB oracle-side mirror of the same formulas, so query and oracle
    * are generated from one definition where practical. */
  object Sql {
    def money(e: String): String = s"CAST($e AS DECIMAL(12,2))"
    def rate(e: String): String = s"CAST($e AS DECIMAL(3,2))"
    def d2(e: String): String = s"CAST(ROUND($e, 2) AS DOUBLE)"
    def sumMoney(e: String): String = d2(s"SUM(${money(e)})")
    def avgMoney(e: String, p: Int): String =
      avgOfUnits(s"CAST(SUM(CAST(${money(e)} * 100 AS BIGINT)) AS BIGINT)", 2, p)
    def avgInt(e: String, p: Int): String =
      avgOfUnits(s"SUM(CAST($e AS BIGINT))", 0, p)
    def ratio(num: String, den: String, p: Int): String = {
      val s = math.pow(10, p).toLong
      val d = math.pow(10, p)
      s"CASE WHEN ($den) = 0 THEN 0.0 ELSE CAST((CAST($num AS BIGINT) * $s * 2 + ($den)) // (($den) * 2) AS DOUBLE) / $d END"
    }
    private def avgOfUnits(units: String, k: Int, p: Int): String = {
      val s = math.pow(10, p - k).toLong
      val d = math.pow(10, p)
      s"CAST(CASE WHEN $units < 0 THEN -1 ELSE 1 END * ((ABS($units) * $s * 2 + COUNT(*)) // (COUNT(*) * 2)) AS DOUBLE) / $d"
    }
  }
}
