package graft.llm

/** Random-hyperplane LSH for cosine similarity (Charikar, STOC'02
  * "Similarity estimation techniques from rounding algorithms").
  *
  * `NumTables` independent hash tables, each hashing a vector to a
  * `BitsPerTable`-bit bucket via the sign pattern of dot products with
  * fixed hyperplanes. Two vectors at angle θ collide in one table with
  * probability (1 − θ/π)^BitsPerTable; unioning candidates over tables
  * trades recall vs. candidate count.
  *
  * Scale path: bucketing is one map pass; candidate generation is an
  * equi-join on (table, bucket) — the 100 TB formulation where the
  * brute-force cross join is impossible. Planes are compile-time
  * LCG-derived constants: no runtime randomness, stable across JVMs.
  */
object Lsh {
  val NumTables = 8
  val BitsPerTable = 8
  val Dim = 64

  /** Deterministic pseudo-gaussian plane components via a fixed LCG:
    * sum of 4 uniform(-1,1) draws (Irwin–Hall ≈ gaussian shape). */
  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L).drop(1)

  val planes: Array[Array[Double]] = {
    val n = NumTables * BitsPerTable * Dim
    val u = lcg(0x9E3779B97F4A7C15L)
      .map(s => ((s >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0)
      .take(n * 4).toArray
    Array.tabulate(NumTables * BitsPerTable) { pi =>
      Array.tabulate(Dim) { d =>
        val o = (pi * Dim + d) * 4
        u(o) + u(o + 1) + u(o + 2) + u(o + 3)
      }
    }
  }

  /** Bucket id of `v` in hash table `t` (0 ≤ t < NumTables). */
  def bucket(v: Array[Double], t: Int): Int = {
    var b = 0
    var i = 0
    while (i < BitsPerTable) {
      val p = planes(t * BitsPerTable + i)
      var dot = 0.0
      var j = 0
      while (j < Dim && j < v.length) { dot += p(j) * v(j); j += 1 }
      if (dot >= 0) b |= (1 << i)
      i += 1
    }
    b
  }

  /** All (table, bucket) keys for a vector. */
  def buckets(v: Array[Double]): Array[(Int, Int)] =
    Array.tabulate(NumTables)(t => (t, bucket(v, t)))
}
