package graft.llm

import scala.collection.mutable.ArrayBuffer

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
  * "Winnowing: Local Algorithms for Document Fingerprinting").
  *
  * Character k-gram rolling hashes; within every window of W consecutive
  * gram hashes the minimum is selected (rightmost minimum on ties, the
  * paper's "robust winnowing"), consecutive duplicate selections are
  * dropped. Guarantees: any shared substring of length ≥ K + W − 1
  * between two documents yields at least one shared fingerprint.
  *
  * Deterministic: md5-derived gram hashes ([[Md5Hash.h32]], unsigned
  * 32-bit carried in a Long) — the hash DuckDB can also compute, which
  * is what puts llm_fingerprint under the driver's oracle gate instead
  * of a golden-digest exemption. No floating point anywhere.
  */
object Winnowing {
  val K = 5 // gram length in chars
  val W = 4 // winnow window in grams

  def gramHashes(text: String): Array[Long] = {
    if (text.length < K) Array(Md5Hash.h32(text))
    else Array.tabulate(text.length - K + 1)(i => Md5Hash.h32(text.substring(i, i + K)))
  }

  /** Selected fingerprint hashes, in document order, deduplicated on
    * consecutive repeats. */
  def fingerprints(text: String): Array[Long] = {
    val hs = gramHashes(text)
    if (hs.length <= W) return Array(hs.min)
    val out = ArrayBuffer.empty[Long]
    var lastPos = -1
    var start = 0
    while (start + W <= hs.length) {
      // rightmost minimum in window [start, start + W)
      var minPos = start
      var i = start + 1
      while (i < start + W) {
        if (hs(i) <= hs(minPos)) minPos = i
        i += 1
      }
      if (minPos != lastPos) {
        out += hs(minPos)
        lastPos = minPos
      }
      start += 1
    }
    out.toArray
  }
}
