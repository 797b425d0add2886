package graft.functions

/** Multimodal-column processing primitives (driver mandate: image/audio/
  * video as opaque `binary` columns with typed metadata; decode STUBBED —
  * no media libs in this container — but the byte-level plumbing real).
  * Shared by q30 (metadata), q63 (resize), q55 (frame sampling) and the
  * BinaryType fixture spec, so query semantics and tests cannot drift.
  * All functions are driver-free per-row logic, used inside
  * `mapPartitions` — a narrow, no-shuffle transform at any scale.
  */
object Multimodal {

  /** STUB decode: deterministic fake (width, height) derived from payload
    * size, standing in for a JPEG/video header parse. Long arithmetic:
    * `nBytes * 7` in Int overflows past ~306 MB payloads (negative dims,
    * diverging from the oracle's BIGINT math) — real media bytes get big. */
  def stubDims(nBytes: Long): (Int, Int) =
    ((64 + nBytes % 576).toInt, (64 + nBytes * 7 % 416).toInt)

  /** Aspect-preserving fit of (w, h) into maxSide², never upscaling. */
  def fitThumb(w: Int, h: Int, maxSide: Int = 256): (Int, Int) = {
    val longSide = math.max(w, h)
    if (longSide <= maxSide) (w, h)
    else (w * maxSide / longSide, h * maxSide / longSide)
  }

  /** Strided frame sampler over opaque media bytes: every `stride` bytes
    * emit (frameIdx, offset, length, checksum) for a `frameLen`-byte
    * frame, checksum = byte-sum mod 997 (stands in for a frame feature). */
  def frames(payload: Array[Byte], stride: Int = 512, frameLen: Int = 256)
      : Iterator[(Int, Int, Int, Int)] =
    Iterator.range(0, payload.length, stride).zipWithIndex.map {
      case (off, k) =>
        val len = math.min(frameLen, payload.length - off)
        var sum = 0L
        var i = off
        while (i < off + len) { sum += payload(i) & 0xff; i += 1 }
        (k, off, len, (sum % 997).toInt)
    }
}
