package graft.llm

import scala.util.hashing.MurmurHash3

/** Seeded MinHash + LSH banding for near-duplicate detection
  * (SURVEY §2.B llm_dedup_minhash).
  *
  * Determinism: all seeds are compile-time constants; shingle hashing is
  * MurmurHash3 over string content (pure function, stable across JVMs);
  * permutations are the classic (a·x + b) mod p family with p = 2^31−1.
  *
  * Scale path: signatures are computed in one map pass; LSH banding turns
  * near-dup search into an equi-join on (band, bandHash) — a hash
  * shuffle, never an all-pairs comparison. Skewed buckets (a band hash
  * shared by many docs) are the one hazard at 100 TB: cap bucket size or
  * salt the band key before the self-join.
  */
object MinHash {
  val NumPerm = 64
  val Bands = 16
  val RowsPerBand: Int = NumPerm / Bands // 4
  private val P = 2147483647L // 2^31 − 1 (Mersenne prime)

  // Deterministic LCG-derived coefficients; a must be non-zero mod P.
  private val A: Array[Long] = Array.tabulate(NumPerm)(i => 1L + ((1664525L * (i + 1) + 1013904223L) % (P - 1)))
  private val B: Array[Long] = Array.tabulate(NumPerm)(i => (22695477L * (i + 1) + 1L) % P)

  /** Word k-shingles of a whitespace-tokenized text. */
  def shingles(text: String, k: Int = 3): Iterator[String] = {
    val words = text.split(" ").filter(_.nonEmpty)
    if (words.length < k) Iterator(words.mkString(" "))
    else words.sliding(k).map(_.mkString(" "))
  }

  /** 64-long MinHash signature over the text's word 3-shingles. */
  def signature(text: String): Array[Long] = {
    val sig = Array.fill(NumPerm)(Long.MaxValue)
    shingles(text).foreach { sh =>
      val h = (MurmurHash3.stringHash(sh, 0xC0FFEE).toLong & 0x7FFFFFFFL)
      var i = 0
      while (i < NumPerm) {
        val v = (A(i) * h + B(i)) % P
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    sig
  }

  /** Exact Jaccard over word 3-shingle sets (test reference). */
  def exactJaccard(a: String, b: String): Double = {
    val sa = shingles(a).toSet
    val sb = shingles(b).toSet
    if (sa.isEmpty && sb.isEmpty) 1.0
    else sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble
  }

  /** Estimated Jaccard = fraction of matching signature components. */
  def estJaccard(sa: Array[Long], sb: Array[Long]): Double =
    sa.zip(sb).count { case (x, y) => x == y }.toDouble / NumPerm
}
