package graft.llm

/** md5-derived integer hashes — the seeded-hash family used by the
  * near-dup signatures (MinHash/SimHash/Winnowing) since round 4.
  *
  * Why md5 and not murmur: both are uniform enough for sketching, but
  * md5 is the one hash both engines share — DuckDB can compute
  * `CAST('0x' || substr(md5(s), 1, k) AS BIGINT)` — which is what lets
  * the signature queries graduate from oracle-exempt to fully
  * DuckDB-checked (the driver's strongest gate). Throughput is lower
  * than murmur per call, but signature hashing is a tiny fraction of
  * each query's cost and the hot loops stay in native expressions. */
object Md5Hash {
  private val tl = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** First 4 md5 bytes, big-endian, as an unsigned 32-bit value in a
    * Long — equals DuckDB's `CAST('0x' || substr(md5(s),1,8) AS BIGINT)`. */
  def h32(s: String): Long = {
    val d = tl.get(); d.reset()
    val b = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((b(0) & 0xFFL) << 24) | ((b(1) & 0xFFL) << 16) | ((b(2) & 0xFFL) << 8) | (b(3) & 0xFFL)
  }

  /** First 8 md5 bytes, big-endian, as the raw 64-bit pattern — equals
    * DuckDB's `CAST('0x' || substr(md5(s),1,16) AS UBIGINT)` bit-for-bit
    * (Scala Long is the same two's-complement word). */
  def h64(s: String): Long = {
    val d = tl.get(); d.reset()
    val b = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(i) & 0xFFL); i += 1 }
    v
  }
}
