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

  /** Distinct 64-bit hashes of the word-3-shingle multiset, mirroring the
    * Catalyst formulation `array_distinct(transform(sequence(1,
    * greatest(n-2,1)), i -> array_join(slice(w,i,3),' ')))` over
    * `split(text, ' ')` EXACTLY (split keeps empty tokens, limit −1; the
    * short-text branch joins whatever is there) — so swapping one for
    * the other cannot change which shingles two documents share. The
    * hash only needs to be an injective shingle-string fingerprint
    * (pairs are counted on hash equality, collision odds ~n²/2^65), not
    * any particular engine's hash. One tight JVM pass; no per-element
    * lambda interpretation, no intermediate string array in the plan. */
  def shingleHashes(text: String): Array[Long] = {
    val words = text.split(" ", -1)
    val n = words.length
    def h64(s: String): Long = {
      val h1 = MurmurHash3.stringHash(s, 0xC0FFEE)
      val h2 = MurmurHash3.stringHash(s, 0x5EED42)
      (h1.toLong << 32) | (h2.toLong & 0xFFFFFFFFL)
    }
    if (n < 3) Array(h64(words.mkString(" ")))
    else {
      val seen = new java.util.HashSet[java.lang.Long](n * 2)
      val out = new scala.collection.mutable.ArrayBuffer[Long](n - 2)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= n - 3) {
        sb.setLength(0)
        sb.append(words(i)).append(' ').append(words(i + 1)).append(' ').append(words(i + 2))
        val h = h64(sb.toString)
        if (seen.add(h)) out += h
        i += 1
      }
      out.toArray
    }
  }

  /** 64-long MinHash signature over the text's word 3-shingles. The
    * shingle hash is md5-derived ([[Md5Hash.h32]] masked to 31 bits) so
    * the whole signature — and therefore llm_dedup_minhash's output —
    * is reproducible in DuckDB SQL and sits under the driver's oracle
    * gate rather than an exemption. */
  def signature(text: String): Array[Long] = {
    val sig = Array.fill(NumPerm)(Long.MaxValue)
    shingles(text).foreach { sh =>
      val h = Md5Hash.h32(sh) & 0x7FFFFFFFL
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
