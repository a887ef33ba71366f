package graft.llm

/** 64-bit SimHash over whitespace tokens for near-duplicate detection.
  *
  * Each token contributes a deterministic 64-bit hash; per-bit vote
  * counts are collapsed to the sign bit. Similar documents differ in few
  * bits, so Hamming distance on signatures approximates token-multiset
  * distance.
  *
  * Scale path: the signature is a single map pass; candidate generation
  * uses the pigeonhole banding trick — split the 64 bits into 4 bands of
  * 16; any pair within Hamming distance 3 must agree on at least one
  * whole band, so an equi-join on (band, bandBits) finds all such pairs
  * without an all-pairs comparison. Wider distances are then filtered
  * exactly with bit_count(xor) on the joined candidates.
  */
object SimHash {
  val Bits = 64
  val Bands = 4
  val BandBits: Int = Bits / Bands // 16

  /** Deterministic 64-bit token hash — md5-derived so the signature is
    * reproducible in DuckDB SQL (oracle-checked, not exempt). */
  private def tokenHash(w: String): Long = Md5Hash.h64(w)

  def simhash64(text: String): Long = {
    val acc = new Array[Int](Bits)
    text.split(" ").foreach { w =>
      if (w.nonEmpty) {
        val h = tokenHash(w)
        var i = 0
        while (i < Bits) {
          if (((h >>> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1
          i += 1
        }
      }
    }
    var sig = 0L
    var i = 0
    while (i < Bits) {
      if (acc(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  def band(sig: Long, b: Int): Long = (sig >>> (b * BandBits)) & 0xFFFFL

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
