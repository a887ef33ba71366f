package graft.llm

import scala.util.hashing.MurmurHash3
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
  * Deterministic: murmur3 with a fixed seed; no floating point.
  */
object Winnowing {
  val K = 5 // gram length in chars
  val W = 4 // winnow window in grams

  def gramHashes(text: String): Array[Int] = {
    if (text.length < K) Array(MurmurHash3.stringHash(text, 0xF1DE))
    else Array.tabulate(text.length - K + 1)(i =>
      MurmurHash3.stringHash(text.substring(i, i + K), 0xF1DE))
  }

  /** Selected fingerprint hashes, in document order, deduplicated on
    * consecutive repeats. */
  def fingerprints(text: String): Array[Int] = {
    val hs = gramHashes(text)
    if (hs.length <= W) return Array(hs.min)
    val out = ArrayBuffer.empty[Int]
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
