package graft.multimodal

/** Multimodal column model: media as opaque `binary` plus typed
  * metadata, mirroring how a 100 TB training pipeline stores images /
  * audio / video next to text (SURVEY north star).
  *
  * The real decode step (JPEG/PNG/audio codecs) is STUBBED — those
  * libraries are not in this container — behind `decodeStub`, a
  * deterministic fake that derives plausible metadata from the bytes.
  * Everything around it (typed schema, Encoders, partition-batched
  * execution via mapPartitions, downstream aggregation) is the real
  * Spark plumbing a production decoder would drop into.
  */
final case class MediaRow(doc_id: Long, kind: String, bytes: Array[Byte])

final case class MediaMeta(
    doc_id: Long,
    kind: String,
    n_bytes: Int,
    width: Int,
    height: Int,
    n_frames: Int,
    sample_rate: Int)

object Media {

  /** Deterministic fake decoder: metadata derived from the md5 of the
    * payload bytes (hex-slice arithmetic, so a SQL oracle can recompute
    * every value — the same graduation trick as the minhash/fingerprint
    * signatures). A real implementation decodes headers here (per
    * partition, so codec state / native buffers are reused across the
    * batch, which is why the operator is mapPartitions and not a
    * per-row UDF). */
  def decodeStub(m: MediaRow): MediaMeta = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(m.bytes).map("%02x".format(_)).mkString
    def slice(from: Int): Long = java.lang.Long.parseLong(hex.substring(from, from + 8), 16)
    val w = (64 + slice(0) % 1857).toInt  // 64..1920
    val ht = (64 + slice(8) % 1017).toInt // 64..1080
    m.kind match {
      case "image" => MediaMeta(m.doc_id, m.kind, m.bytes.length, w, ht, 1, 0)
      case "video" => MediaMeta(m.doc_id, m.kind, m.bytes.length, w, ht,
        (25 * (1 + slice(16) % 256)).toInt, 0)
      case _       => MediaMeta(m.doc_id, m.kind, m.bytes.length, 0, 0, 0,
        if ((slice(24) & 1L) == 0L) 44100 else 16000)
    }
  }

  /** Frame-sampling stub: every `stride`-th frame index of a video, the
    * shape a real frame extractor would fan out to one row per frame. */
  def sampleFrames(meta: MediaMeta, stride: Int): Seq[Int] =
    if (meta.n_frames <= 0) Seq.empty
    else 0 until meta.n_frames by stride
}
