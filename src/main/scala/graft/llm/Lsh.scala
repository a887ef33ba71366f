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

  /** Deterministic pseudo-gaussian plane components: sum of 4
    * uniform(-1,1) draws (Irwin–Hall ≈ gaussian shape), each draw
    * md5-derived per index — position-independent arithmetic DuckDB can
    * reproduce exactly, which puts llm_sim_lsh_topk under the full
    * oracle gate (a sequential LCG would need a 16k-step recurrence in
    * SQL). (h >>> 11) keeps 53 bits, so the Long→Double conversion is
    * exact on both engines. */
  private def u(i: Int): Double =
    ((Md5Hash.h64(i.toString) >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0

  val planes: Array[Array[Double]] = {
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
