package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** Multimodal-column processing primitives (driver mandate: image/audio/
  * video as opaque `binary` columns with typed metadata). Shared by q30
  * (image metadata), q63 (resize), q55 (frame sampling), q120 (audio
  * metadata) and the BinaryType fixture spec, so query semantics and
  * tests cannot drift. All functions are driver-free per-row logic, used
  * inside `mapPartitions` — a narrow, no-shuffle transform at any scale.
  *
  * Decode policy: every format with a pure-JDK decode path is decoded
  * for REAL — [[decodeBmpDims]] parses a BITMAPINFOHEADER, [[decodeWav]]
  * walks RIFF chunks to the fmt/data pair, [[decodePng]] inflates and
  * CRC-checks genuine PNG streams, [[decodeJpegDims]] reads JPEG
  * geometry through `javax.imageio` (ships in the JRE), and
  * [[decodeMp3Meta]] walks MPEG-1 Layer III frame headers (metadata is
  * header arithmetic — only the audio SAMPLES need a codec, and no
  * pure-JDK MP3/H.264 sample decoder exists). The matching [[bmpBytes]]/[[wavBytes]]/
  * [[pngBytes]]/[[jpegBytes]] encoders exist to SYNTHESIZE test
  * payloads (the driver corpus has no media column), mirroring how a
  * real pipeline's upstream produced the container. Decoders are
  * permissive: malformed payloads return None and the row is skipped,
  * the P8 error-row policy (SURVEY §2.3).
  */
object Multimodal {

  /** Deterministic fixture dims derived from payload size — the dim
    * GENERATOR for synthesized test media (the corpus has no real
    * images; a given doc must always map to the same picture). Long
    * arithmetic: `nBytes * 7` in Int overflows past ~306 MB payloads
    * (negative dims, diverging from the oracle's BIGINT math). */
  def stubDims(nBytes: Long): (Int, Int) =
    ((64 + nBytes % 576).toInt, (64 + nBytes * 7 % 416).toInt)

  /** A real (minimal) BMP: 14-byte BITMAPFILEHEADER + 40-byte
    * BITMAPINFOHEADER, 24bpp BI_RGB, little-endian throughout — the
    * layout every BMP reader parses. `pixels` is appended verbatim
    * (callers pass a stand-in payload; header decode never reads it). */
  def bmpBytes(width: Int, height: Int, pixels: Array[Byte] = Array.empty)
      : Array[Byte] = {
    val rowBytes = (width * 3 + 3) / 4 * 4 // rows pad to 4-byte boundary
    val bb = ByteBuffer.allocate(54 + pixels.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
      .putInt(54 + rowBytes * math.abs(height)) // declared file size
      .putInt(0)                                // reserved
      .putInt(54)                               // pixel-array offset
      .putInt(40)                               // biSize (BITMAPINFOHEADER)
      .putInt(width).putInt(height)
      .putShort(1)                              // planes
      .putShort(24)                             // bpp
      .putInt(0)                                // BI_RGB
      .putInt(rowBytes * math.abs(height))      // biSizeImage
      .putInt(2835).putInt(2835)                // 72 dpi in px/metre
      .putInt(0).putInt(0)                      // palette
      .put(pixels)
    bb.array()
  }

  /** REAL header decode: (width, height) from the BITMAPINFOHEADER —
    * magic "BM" checked, int32 LE at offsets 18/22. None on anything
    * that is not a parseable BMP header. */
  def decodeBmpDims(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length < 26 || b(0) != 'B' || b(1) != 'M') None
    else {
      val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      Some((bb.getInt(18), bb.getInt(22)))
    }

  /** A real (minimal) PCM WAV: RIFF header, canonical 16-byte fmt chunk,
    * data chunk whose declared size is `nSamples` 16-bit frames. `pcm`
    * is appended verbatim (stand-in samples). */
  def wavBytes(sampleRate: Int, channels: Int, nSamples: Int,
      pcm: Array[Byte] = Array.empty): Array[Byte] = {
    val blockAlign = channels * 2 // 16-bit PCM
    val dataSize = nSamples * blockAlign
    val bb = ByteBuffer.allocate(44 + pcm.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII"))
      .putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII"))
      .putInt(16)                               // fmt chunk size
      .putShort(1)                              // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * blockAlign)          // byte rate
      .putShort(blockAlign.toShort)
      .putShort(16)                             // bits/sample
      .put("data".getBytes("US-ASCII"))
      .putInt(dataSize)
      .put(pcm)
    bb.array()
  }

  /** REAL RIFF decode: walk the chunk list (not fixed offsets — WAVs in
    * the wild carry LIST/INFO chunks before fmt) to the fmt and data
    * chunks; returns (sampleRate, channels, bitsPerSample, nSamples).
    * None unless both chunks are present and the layout is sane. */
  def decodeWav(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (b.length < 44) return None
    def ascii(off: Int, n: Int) = new String(b, off, n, "US-ASCII")
    if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE") return None
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    // Long offsets: a hostile/corrupt declared chunk size near
    // Int.MaxValue must walk off the END (loop exits), not wrap an Int
    // negative and index out of bounds — decoders return None, never
    // throw (P8 skip policy).
    var off = 12L
    var fmt: Option[(Int, Int, Int)] = None // (rate, channels, bits)
    var dataSize = -1L
    while (off + 8 <= b.length && (fmt.isEmpty || dataSize < 0)) {
      val o = off.toInt
      val id = ascii(o, 4)
      val size = bb.getInt(o + 4)
      if (size < 0) return None
      if (id == "fmt " && size >= 16 && off + 8 + 16 <= b.length)
        fmt = Some((bb.getInt(o + 12), bb.getShort(o + 10).toInt,
          bb.getShort(o + 22).toInt))
      if (id == "data") dataSize = size.toLong
      off += 8L + size + (size & 1) // chunks are word-aligned
    }
    // bytes-per-frame guard: sub-byte sample widths (e.g. 4-bit ADPCM)
    // or zero channels must skip the row, not divide by zero.
    fmt.collect {
      case (rate, ch, bits) if dataSize >= 0 && ch > 0 && bits >= 8 &&
          bits % 8 == 0 && ch.toLong * bits / 8 > 0 =>
        (rate, ch, bits, dataSize / (ch * bits / 8))
    }
  }

  /** REAL sample decode, one level past [[decodeWav]]'s metadata walk:
    * locate the data chunk, then materialize its 16-bit little-endian
    * PCM frames as signed ints. Reads exactly the DECLARED data size
    * (clipped to the bytes actually present — a truncated file yields
    * the samples it has, the P8 permissive stance), so energy metrics
    * computed from the result are reproducible from the container alone.
    * Returns (sampleRate, channels, samples); None for anything that is
    * not a 16-bit PCM WAV. */
  def decodePcm16(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (b.length < 44) return None
    def ascii(off: Int, n: Int) = new String(b, off, n, "US-ASCII")
    if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE") return None
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    var off = 12L
    var fmt: Option[(Int, Int, Int)] = None
    var dataOff = -1L
    var dataSize = -1L
    while (off + 8 <= b.length && (fmt.isEmpty || dataOff < 0)) {
      val o = off.toInt
      val id = ascii(o, 4)
      val size = bb.getInt(o + 4)
      if (size < 0) return None
      if (id == "fmt " && size >= 16 && off + 8 + 16 <= b.length)
        fmt = Some((bb.getInt(o + 12), bb.getShort(o + 10).toInt,
          bb.getShort(o + 22).toInt))
      if (id == "data") { dataOff = off + 8; dataSize = size.toLong }
      off += 8L + size + (size & 1)
    }
    fmt.collect {
      case (rate, ch, bits) if dataOff >= 0 && ch > 0 && bits == 16 =>
        val avail = math.max(0L, math.min(dataSize, b.length - dataOff))
        val n = (avail / 2).toInt
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          out(i) = bb.getShort((dataOff + 2L * i).toInt).toInt
          i += 1
        }
        (rate, ch, out)
    }
  }

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** A real (minimal) 8-bit grayscale PNG: signature, IHDR, one IDAT
    * carrying a hand-rolled zlib stream of STORED deflate blocks over
    * the filter-0 scanlines, IEND — every chunk CRC32-summed per the
    * spec. Stored blocks keep the byte layout deterministic across JVMs
    * (Deflater's compressed output varies by zlib build; the stored
    * framing is fixed: 2-byte zlib header + 5 bytes per ≤64 KiB block +
    * raw bytes + 4-byte Adler-32), so oracles can predict IDAT length
    * arithmetically. `gray` must hold width*height pixel bytes. */
  def pngBytes(width: Int, height: Int, gray: Array[Byte]): Array[Byte] = {
    require(gray.length == width * height, "gray must be width*height bytes")
    val raw = new Array[Byte](height * (width + 1))
    var r = 0
    while (r < height) { // filter byte 0 + row pixels
      System.arraycopy(gray, r * width, raw, r * (width + 1) + 1, width)
      r += 1
    }
    val nBlocks = math.max(1, (raw.length + 65534) / 65535)
    val zlib = ByteBuffer.allocate(2 + 5 * nBlocks + raw.length + 4)
    zlib.put(0x78.toByte).put(0x01.toByte) // CM=8, fastest, no dict
    var off = 0
    while (off < raw.length || (raw.length == 0 && off == 0)) {
      val n = math.min(65535, raw.length - off)
      val fin = off + n >= raw.length
      zlib.put(if (fin) 1.toByte else 0.toByte)
        .put((n & 0xff).toByte).put((n >> 8).toByte)        // LEN (LE)
        .put((~n & 0xff).toByte).put((~n >> 8 & 0xff).toByte) // NLEN
        .put(raw, off, n)
      off += math.max(n, 1)
      if (fin) off = raw.length + 1
    }
    val adler = new java.util.zip.Adler32(); adler.update(raw)
    zlib.putInt(adler.getValue.toInt)
    val ihdr = ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(0.toByte)  // color type: grayscale
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate/adaptive/none
      .array()
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val t = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      ByteBuffer.allocate(12 + data.length)
        .putInt(data.length).put(t).put(data).putInt(crc.getValue.toInt)
        .array()
    }
    PngSig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", zlib.array()) ++
      chunk("IEND", Array.empty)
  }

  /** REAL PNG decode for 8-bit grayscale: verifies the signature, walks
    * the chunk list verifying EVERY chunk's CRC32, parses IHDR, then
    * zlib-INFLATES the concatenated IDAT stream (java.util.zip.Inflater
    * — any conformant zlib stream, not just [[pngBytes]]'s stored
    * blocks) and checks the scanline geometry (filter byte per row).
    * Returns (width, height, bitDepth, colorType, nChunks, idatBytes,
    * pixelSum); None on any CRC mismatch, bad layout, or inflate error
    * (P8 skip policy). */
  def decodePng(b: Array[Byte])
      : Option[(Int, Int, Int, Int, Int, Int, Long)] = {
    if (b.length < 8 + 12 * 2 ||
      !java.util.Arrays.equals(b.slice(0, 8), PngSig)) return None
    val bb = ByteBuffer.wrap(b) // PNG ints are big-endian = BB default
    var off = 8
    var ihdr: Option[(Int, Int, Int, Int)] = None
    val idat = new java.io.ByteArrayOutputStream()
    var nChunks = 0
    var ended = false
    while (!ended && off + 12 <= b.length) {
      val len = bb.getInt(off)
      if (len < 0 || off + 12L + len > b.length) return None
      val crc = new java.util.zip.CRC32()
      crc.update(b, off + 4, 4 + len) // CRC spans type + data
      if (crc.getValue != (bb.getInt(off + 8 + len) & 0xffffffffL))
        return None
      nChunks += 1
      new String(b, off + 4, 4, "US-ASCII") match {
        case "IHDR" if len >= 13 =>
          ihdr = Some((bb.getInt(off + 8), bb.getInt(off + 12),
            b(off + 16) & 0xff, b(off + 17) & 0xff))
        case "IDAT" => idat.write(b, off + 8, len)
        case "IEND" => ended = true
        case _      => () // ancillary chunks (tEXt, pHYs, …) skip
      }
      off += 12 + len
    }
    ihdr match {
      case Some((w, h, depth, color)) if ended && w > 0 && h > 0 &&
          depth == 8 && color == 0 &&
          h.toLong * (w + 1) <= Int.MaxValue =>
        val inf = new java.util.zip.Inflater()
        inf.setInput(idat.toByteArray)
        val out = new Array[Byte](h * (w + 1))
        try {
          val n = inf.inflate(out)
          if (n != out.length || !inf.finished()) None
          else {
            var sum = 0L; var bad = false; var r = 0
            while (r < h && !bad) {
              if (out(r * (w + 1)) != 0) bad = true // filter 0 only
              else {
                var c = 0
                while (c < w) {
                  sum += out(r * (w + 1) + 1 + c) & 0xff; c += 1
                }
              }
              r += 1
            }
            if (bad) None
            else Some((w, h, depth, color, nChunks, idat.size(), sum))
          }
        } catch {
          case _: java.util.zip.DataFormatException => None
        } finally inf.end()
      case _ => None
    }
  }

  /** A real JPEG, encoded by the JDK's own codec — `javax.imageio`
    * ships in every JRE, so the "no codec libs in this container" limit
    * never applied to JPEG (it still does to MP3/H.264, which have no
    * pure-JDK decoder). Content is a deterministic grayscale gradient:
    * JPEG is LOSSY, so pixel values don't round-trip — only the
    * geometry does, and geometry is what the decoder below reads. */
  def jpegBytes(width: Int, height: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { raster.setSample(x, y, 0, (x + y) & 0xff); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** REAL JPEG decode via the JDK reader — dims come from the SOF
    * marker (`reader.getWidth(0)` parses the header only, no inverse
    * DCT): per-file metadata extraction must not pay a full pixel
    * decode at 100 TB. SOI magic (0xFFD8) pre-checked so non-JPEG rows
    * skip without constructing a reader. None on anything undecodable
    * (P8 skip policy). */
  def decodeJpegDims(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(b))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try { r.setInput(iis); Some((r.getWidth(0), r.getHeight(0))) }
        catch { case _: Exception => None }
        finally r.dispose()
      }
    } finally iis.close()
  }

  // Executor hygiene for the ImageIO path: never write decode scratch
  // to disk (the default cache is a temp FILE per stream), and never
  // touch a display. Both are process-wide statics, set once on class
  // load of this object.
  javax.imageio.ImageIO.setUseCache(false)
  locally { sys.props.getOrElseUpdate("java.awt.headless", "true") }

  /** MPEG-1 Layer III side tables (ISO/IEC 11172-3): bitrate index →
    * kbps (index 0 = "free format", 15 = invalid, both rejected by the
    * decoder) and sample-rate index → Hz. Public so the q259 oracle SQL
    * is GENERATED from the same constants (NOTES rule 7). */
  val Mp3Bitrates: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  val Mp3Rates: Array[Int] = Array(44100, 48000, 32000)

  /** A real MPEG-1 Layer III stream: ID3v2.3 tag (10-byte header with
    * SYNCSAFE size + `id3Payload` bytes) followed by `nFrames` frames
    * whose 4-byte headers carry the given bitrate/rate/channel mode.
    * Frame length = floor(144000·kbps/rate) + padding (always 0 here) —
    * the exact hop arithmetic every MP3 walker uses. Bodies are
    * deterministic fill; no JDK codec can synthesize real audio frames,
    * but metadata extraction never reads bodies (that's the point). */
  def mp3Bytes(bitrateIdx: Int, rateIdx: Int, mono: Boolean, nFrames: Int,
      id3Payload: Int = 0): Array[Byte] = {
    require(bitrateIdx >= 1 && bitrateIdx <= 14, s"bitrate idx $bitrateIdx")
    require(rateIdx >= 0 && rateIdx <= 2, s"rate idx $rateIdx")
    val frameLen = 144000 * Mp3Bitrates(bitrateIdx) / Mp3Rates(rateIdx)
    val id3 = 10 + id3Payload
    val out = new Array[Byte](id3 + nFrames * frameLen)
    out(0) = 'I'; out(1) = 'D'; out(2) = '3'
    out(3) = 3; out(4) = 0 // v2.3.0
    out(5) = 0             // flags
    out(6) = ((id3Payload >> 21) & 0x7f).toByte
    out(7) = ((id3Payload >> 14) & 0x7f).toByte
    out(8) = ((id3Payload >> 7) & 0x7f).toByte
    out(9) = (id3Payload & 0x7f).toByte
    var f = 0
    while (f < nFrames) {
      val off = id3 + f * frameLen
      out(off) = 0xff.toByte
      out(off + 1) = 0xfb.toByte // sync | MPEG1 | Layer III | no CRC
      out(off + 2) = ((bitrateIdx << 4) | (rateIdx << 2)).toByte // pad 0
      out(off + 3) = (if (mono) 0xc0 else 0x00).toByte // mode; flags 0
      var i = off + 4
      while (i < off + frameLen) { out(i) = ((i - off) % 251).toByte; i += 1 }
      f += 1
    }
    out
  }

  /** REAL MP3 metadata walk — the frame-header analog of [[decodeWav]]'s
    * chunk walk: skip a leading ID3v2 tag (syncsafe size), then hop
    * frame to frame by the header-length arithmetic, validating each
    * sync word and field range. Audio SAMPLES stay out of scope (no
    * pure-JDK decoder exists) — but bitrate, sample rate, channel mode,
    * frame count and duration are header fields, and a 100 TB curation
    * pass needs exactly those. Returns (bitrateKbps, sampleRate,
    * channels, nFrames, durationMs) over COMPLETE frames; a truncated
    * trailing frame or lost sync stops the walk (P8 permissive stance);
    * None if no complete frame parses. MPEG-1 Layer III only. */
  def decodeMp3Meta(b: Array[Byte]): Option[(Int, Int, Int, Long, Long)] = {
    var off = 0L
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      // syncsafe 28-bit size; hostile bytes with the top bit set would
      // corrupt the size, so mask each byte to 7 bits per the spec
      val sz = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      off = 10L + sz
    }
    var nFrames = 0L
    var br = -1; var rate = -1; var ch = -1
    var ok = true
    while (ok && off + 4 <= b.length) {
      val o = off.toInt
      val h1 = b(o) & 0xff; val h2 = b(o + 1) & 0xff
      val h3 = b(o + 2) & 0xff; val h4 = b(o + 3) & 0xff
      if (h1 != 0xff || (h2 & 0xe0) != 0xe0) ok = false
      else {
        val version = (h2 >> 3) & 3 // 3 = MPEG-1
        val layer = (h2 >> 1) & 3   // 1 = Layer III
        val bi = (h3 >> 4) & 0xf
        val ri = (h3 >> 2) & 3
        val pad = (h3 >> 1) & 1
        if (version != 3 || layer != 1 || bi < 1 || bi > 14 || ri > 2)
          ok = false
        else {
          val flen = 144000 * Mp3Bitrates(bi) / Mp3Rates(ri) + pad
          if (off + flen > b.length) ok = false // truncated final frame
          else {
            if (nFrames == 0) {
              br = Mp3Bitrates(bi); rate = Mp3Rates(ri)
              ch = if (((h4 >> 6) & 3) == 3) 1 else 2
            }
            nFrames += 1
            off += flen
          }
        }
      }
    }
    if (nFrames == 0) None
    // 1152 samples per MPEG-1 Layer III frame; integer ms floor — the
    // all-integer form both engines reproduce exactly
    else Some((br, rate, ch, nFrames, nFrames * 1152L * 1000L / rate))
  }

  /** A real H.264 Annex-B byte stream (ISO/IEC 14496-10 B.1): SPS and
    * PPS parameter sets, then `nGops` groups of one IDR keyframe +
    * `pPerGop` non-IDR slices. Parameter sets and IDR NALs get 4-byte
    * start codes (00 00 00 01 — access-unit convention), non-IDR slices
    * the 3-byte form (00 00 01) — real encoders emit both, so the
    * walker must too. Each NAL is its header byte (forbidden_zero=0,
    * nal_ref_idc, nal_unit_type) + deterministic filler kept free of
    * 00 00 0x sequences (the filler cycles 1..250, so no false start
    * codes and no emulation-prevention bytes are needed). `*Len` sizes
    * INCLUDE the header byte. */
  def h264Bytes(nGops: Int, pPerGop: Int, spsLen: Int, ppsLen: Int,
      idrLen: Int, pLen: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def nal(startCode4: Boolean, header: Int, len: Int): Unit = {
      if (startCode4) out.write(0)
      out.write(0); out.write(0); out.write(1)
      out.write(header)
      var i = 1
      while (i < len) { out.write(1 + (i % 250)); i += 1 }
    }
    nal(startCode4 = true, 0x67, spsLen) // ref_idc=3, type=7 (SPS)
    nal(startCode4 = true, 0x68, ppsLen) // ref_idc=3, type=8 (PPS)
    var g = 0
    while (g < nGops) {
      nal(startCode4 = true, 0x65, idrLen) // ref_idc=3, type=5 (IDR)
      var p = 0
      while (p < pPerGop) {
        nal(startCode4 = false, 0x41, pLen) // ref_idc=2, type=1 (non-IDR)
        p += 1
      }
      g += 1
    }
    out.toByteArray
  }

  /** REAL H.264 NAL-unit walk — the video half of the metadata mandate
    * (the [[decodeMp3Meta]] argument verbatim: only SAMPLE decode needs
    * a codec; stream structure is framing): scan for 3- and 4-byte
    * Annex-B start codes, read each NAL's type from its header byte,
    * and count parameter sets, IDR keyframes and non-IDR slices — the
    * fields a 100 TB video-curation pass filters on (keyframe density,
    * stream sanity) without touching a decoder. Returns (nSps, nPps,
    * nIdr, nNonIdr, nOther); None unless the stream begins with a
    * start code and yields at least one NAL. A forbidden_zero_bit
    * violation ends the walk (P8 permissive stance). */
  def decodeH264Nals(b: Array[Byte]): Option[(Int, Int, Int, Int, Int)] = {
    // start-code positions: i at the 00 00 01 (3-byte) or 00 00 00 01
    def scLen(i: Int): Int =
      if (i + 3 < b.length && b(i) == 0 && b(i + 1) == 0 && b(i + 2) == 0 &&
        b(i + 3) == 1) 4
      else if (i + 2 < b.length && b(i) == 0 && b(i + 1) == 0 && b(i + 2) == 1) 3
      else 0
    if (b.length < 5 || scLen(0) == 0) return None
    var nSps = 0; var nPps = 0; var nIdr = 0; var nNon = 0; var nOther = 0
    var i = 0
    var ok = true
    while (ok && i < b.length) {
      val sl = scLen(i)
      if (sl == 0) ok = false // lost framing — stop at what parsed
      else {
        val h = i + sl
        if (h >= b.length) ok = false // start code at EOF, no header
        else if ((b(h) & 0x80) != 0) ok = false // forbidden_zero_bit
        else {
          (b(h) & 0x1f) match {
            case 7 => nSps += 1
            case 8 => nPps += 1
            case 5 => nIdr += 1
            case 1 => nNon += 1
            case _ => nOther += 1
          }
          // advance to the next start code (payloads are scanned — the
          // synthesizer keeps them start-code-free, and a real stream's
          // emulation-prevention bytes guarantee the same)
          var j = h + 1
          while (j < b.length && scLen(j) == 0) j += 1
          i = j
        }
      }
    }
    if (nSps + nPps + nIdr + nNon + nOther == 0) None
    else Some((nSps, nPps, nIdr, nNon, nOther))
  }

  /** A real ISO-BMFF (MP4) file: `ftyp` + `moov` (with `mvhd` and one
    * spec-shaped `trak`→`tkhd`+`mdia`→`mdhd`+`hdlr` subtree per track)
    * + `mdat` carrying `payload`. Every box is the genuine
    * [u32 size][4cc] framing with version-0 full-box layouts; a video
    * track is always present, `withAudio` adds a `soun` track. The
    * container is what a curation pass walks — track inventory,
    * timescale, duration — samples stay codec territory. */
  def mp4Bytes(timescale: Int, duration: Int, withAudio: Boolean,
      hdlrName: Int, payload: Array[Byte]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Unit = {
      bo.write(((v >> 24) & 0xff).toInt); bo.write(((v >> 16) & 0xff).toInt)
      bo.write(((v >> 8) & 0xff).toInt); bo.write((v & 0xff).toInt)
    }
    def cc(t: String): Unit = bo.write(t.getBytes("US-ASCII"))
    def hdlr(handler: String): Array[Byte] = {
      val name = Array.tabulate(hdlrName)(i => ('a' + i % 26).toByte)
      val p = new java.io.ByteArrayOutputStream()
      p.write(new Array[Byte](8)) // version/flags + pre_defined
      p.write(handler.getBytes("US-ASCII"))
      p.write(new Array[Byte](12)) // reserved
      p.write(name); p.write(0) // nul-terminated name
      box("hdlr", p.toByteArray)
    }
    def box(typ: String, body: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(8 + body.length)
      out.putInt(8 + body.length); out.put(typ.getBytes("US-ASCII"))
      out.put(body); out.array()
    }
    def fullBox0(typ: String, payloadLen: Int)
        (fill: java.nio.ByteBuffer => Unit): Array[Byte] = {
      val body = java.nio.ByteBuffer.allocate(payloadLen)
      body.putInt(0) // version 0 + flags
      fill(body)
      box(typ, body.array())
    }
    def mdhd = fullBox0("mdhd", 24) { p =>
      p.putInt(0); p.putInt(0) // ctime, mtime
      p.putInt(timescale); p.putInt(duration)
      p.putShort(0x55c4.toShort); p.putShort(0) // lang "und", pre_defined
    }
    def tkhd(id: Int) = fullBox0("tkhd", 84) { p =>
      p.putInt(0); p.putInt(0); p.putInt(id); p.putInt(0); p.putInt(duration)
      // reserved(8) layer/group/volume/reserved(8) then the unity matrix
      p.position(p.position() + 16)
      p.putInt(0x00010000); p.position(p.position() + 12)
      p.putInt(0x00010000); p.position(p.position() + 12)
      p.putInt(0x40000000)
      // width/height stay 0 (fixed-point; sample-entry territory)
    }
    def trak(id: Int, handler: String): Array[Byte] =
      box("trak", tkhd(id) ++ box("mdia", mdhd ++ hdlr(handler)))
    val mvhd = fullBox0("mvhd", 100) { p =>
      p.putInt(0); p.putInt(0) // ctime, mtime
      p.putInt(timescale); p.putInt(duration)
      p.putInt(0x00010000); p.putShort(0x0100.toShort) // rate, volume
      p.position(p.position() + 10) // reserved
      p.putInt(0x00010000); p.position(p.position() + 12)
      p.putInt(0x00010000); p.position(p.position() + 12)
      p.putInt(0x40000000) // unity matrix
      p.position(p.position() + 24) // pre_defined
      p.putInt(if (withAudio) 3 else 2) // next_track_ID
    }
    val traks = trak(1, "vide") ++
      (if (withAudio) trak(2, "soun") else Array.empty[Byte])
    u32(16); cc("ftyp"); cc("isom"); u32(512) // major brand + minor ver
    bo.write(box("moov", mvhd ++ traks))
    bo.write(box("mdat", payload))
    bo.toByteArray
  }

  /** REAL ISO-BMFF box walk — the container analog of [[decodeWav]]'s
    * chunk walk: parse [u32 size][4cc] box headers, recurse into the
    * standard container types, and read `mvhd` timing and `hdlr` track
    * roles at their version-0 offsets. Returns (nBoxes incl. nested,
    * timescale, duration, nTracks, hasAudio, mdatBytes); None when the
    * file doesn't open with a well-formed `ftyp`. Malformed sizes stop
    * the walk at what parsed (P8 permissive stance). */
  def decodeMp4Boxes(b: Array[Byte])
      : Option[(Int, Int, Long, Int, Boolean, Long)] = {
    def u32(o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    def cc(o: Int): String = new String(b, o, 4, "US-ASCII")
    if (b.length < 16 || u32(0) < 8 || cc(4) != "ftyp") return None
    val containers = Set("moov", "trak", "mdia", "minf", "stbl", "edts")
    var nBoxes = 0; var timescale = 0; var duration = 0L
    var nTracks = 0; var hasAudio = false; var mdatBytes = 0L
    def walk(start: Int, end: Int): Unit = {
      var o = start
      while (o + 8 <= end) {
        val size = u32(o)
        if (size < 8 || o + size > end) return // lost framing — stop
        val typ = cc(o + 4)
        nBoxes += 1
        typ match {
          case "mvhd" if size >= 28 && (b(o + 8) & 0xff) == 0 =>
            timescale = u32(o + 20).toInt; duration = u32(o + 24)
          case "trak" => nTracks += 1
          case "hdlr" if size >= 24 =>
            if (cc(o + 16) == "soun") hasAudio = true
          case "mdat" => mdatBytes += size - 8
          case _ => ()
        }
        if (containers(typ)) walk(o + 8, o + size.toInt)
        o += size.toInt
      }
    }
    walk(0, b.length)
    Some((nBoxes, timescale, duration, nTracks, hasAudio, mdatBytes))
  }

  /** FLAC sample-rate fixture table (the common studio/stream rates);
    * public so the q279 oracle SQL is generated from the same constants
    * (NOTES rule 7). The FORMAT supports any 20-bit rate — this table
    * is fixture geometry, not a decoder limit. */
  val FlacRates: Array[Int] = Array(44100, 48000, 96000, 22050)

  /** A real FLAC header: "fLaC" magic + STREAMINFO (type 0, 34 bytes,
    * with the genuine 64-bit packed rate/channels/bps/total-samples
    * field) + a PADDING block marked last. Frame data is codec
    * territory and omitted — header walks never read it. */
  def flacBytes(sampleRate: Int, channels: Int, bps: Int,
      totalSamples: Long, padLen: Int): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    bo.write("fLaC".getBytes("US-ASCII"))
    // STREAMINFO, not last
    bo.write(0); bo.write(0); bo.write(0); bo.write(34)
    val si = java.nio.ByteBuffer.allocate(34)
    si.putShort(4096.toShort); si.putShort(4096.toShort) // block sizes
    si.put(new Array[Byte](6)) // min/max frame size (u24 each): unknown
    // 64-bit pack: rate(20) | channels-1(3) | bps-1(5) | totalSamples(36)
    val packed = (sampleRate.toLong << 44) | ((channels - 1).toLong << 41) |
      ((bps - 1).toLong << 36) | (totalSamples & 0xfffffffffL)
    si.putLong(packed)
    si.put(new Array[Byte](16)) // MD5 of unencoded audio: zeros
    bo.write(si.array())
    // PADDING, last-metadata-block flag set
    bo.write(0x81); bo.write((padLen >> 16) & 0xff)
    bo.write((padLen >> 8) & 0xff); bo.write(padLen & 0xff)
    bo.write(new Array[Byte](padLen))
    bo.toByteArray
  }

  /** REAL FLAC metadata walk: magic check, then the
    * [last(1)|type(7)][u24 length] block chain, unpacking STREAMINFO's
    * bit-packed 64-bit field (rate 20 bits, channels-1 3, bps-1 5,
    * total samples 36) — the one genuinely bit-granular header in the
    * audio set. Returns (sampleRate, channels, bps, totalSamples,
    * nBlocks, padBytes); None without magic + STREAMINFO first (the
    * spec requires it first). */
  def decodeFlac(b: Array[Byte])
      : Option[(Int, Int, Int, Long, Int, Long)] = {
    if (b.length < 42 || new String(b, 0, 4, "US-ASCII") != "fLaC")
      return None
    var o = 4
    var nBlocks = 0; var padBytes = 0L
    var rate = -1; var ch = -1; var bps = -1; var total = -1L
    var last = false
    while (!last && o + 4 <= b.length) {
      val hdr = b(o) & 0xff
      last = (hdr & 0x80) != 0
      val typ = hdr & 0x7f
      val len = ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) |
        (b(o + 3) & 0xff)
      if (o + 4 + len > b.length) return None // truncated block
      if (nBlocks == 0 && typ != 0) return None // STREAMINFO must lead
      if (typ == 0 && len >= 34) {
        val p = o + 4 + 10
        var packed = 0L
        var i = 0
        while (i < 8) { packed = (packed << 8) | (b(p + i) & 0xffL); i += 1 }
        rate = (packed >>> 44).toInt
        ch = ((packed >>> 41) & 0x7).toInt + 1
        bps = ((packed >>> 36) & 0x1f).toInt + 1
        total = packed & 0xfffffffffL
      }
      if (typ == 1) padBytes += len
      nBlocks += 1
      o += 4 + len
    }
    if (rate <= 0) None else Some((rate, ch, bps, total, nBlocks, padBytes))
  }

  /** A real baseline TIFF with an EXIF sub-IFD, in EITHER byte order:
    * header ("II"/"MM" + magic 42 + IFD offset), IFD0 with ascending
    * tags (ImageWidth 256, ImageLength 257, BitsPerSample 258, Make 271
    * as out-of-line ASCII, ExifIFDPointer 0x8769), then the Make string
    * and a 1-entry EXIF IFD (ISOSpeedRatings 0x8827). SHORT values are
    * left-justified in the 4-byte value field per the spec — the detail
    * every naive TIFF reader gets wrong on big-endian files. */
  def tiffBytes(bigEndian: Boolean, width: Int, height: Int, iso: Int,
      makeLen: Int): Array[Byte] = {
    val exifOff = 75 + makeLen // 8 hdr + 66 IFD0 + (makeLen+1) ASCII
    val buf = java.nio.ByteBuffer.allocate(93 + makeLen)
      .order(if (bigEndian) java.nio.ByteOrder.BIG_ENDIAN
             else java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put((if (bigEndian) "MM" else "II").getBytes("US-ASCII"))
    buf.putShort(42); buf.putInt(8)
    def entryShort(tag: Int, v: Int): Unit = {
      buf.putShort(tag.toShort); buf.putShort(3) // SHORT
      buf.putInt(1); buf.putShort(v.toShort); buf.putShort(0) // left-justified
    }
    buf.putShort(5) // IFD0 entry count
    entryShort(256, width); entryShort(257, height); entryShort(258, 8)
    buf.putShort(271.toShort); buf.putShort(2) // Make, ASCII
    buf.putInt(makeLen + 1); buf.putInt(74) // out-of-line, right after IFD0
    buf.putShort(0x8769.toShort); buf.putShort(4) // ExifIFDPointer, LONG
    buf.putInt(1); buf.putInt(exifOff)
    buf.putInt(0) // next-IFD: none
    var i = 0
    while (i < makeLen) { buf.put(('a' + i % 26).toByte); i += 1 }
    buf.put(0.toByte) // nul terminator
    buf.putShort(1) // EXIF IFD entry count
    entryShort(0x8827, iso)
    buf.putInt(0) // next-IFD
    buf.array()
  }

  /** REAL TIFF/EXIF IFD walk: detect byte order from the header,
    * validate magic 42, iterate IFD0's 12-byte entries, read
    * left-justified SHORT values and out-of-line counts, follow the
    * EXIF sub-IFD pointer, and honor the next-IFD chain terminator.
    * Returns (bigEndian, width, height, iso, nIfd0, nExif, makeLen);
    * None when header/magic don't parse. Metadata-only, like every
    * walk in this object — pixel strips are codec territory. */
  def decodeTiff(b: Array[Byte])
      : Option[(Boolean, Int, Int, Int, Int, Int, Int)] = {
    if (b.length < 8) return None
    val big =
      if (b(0) == 'M' && b(1) == 'M') true
      else if (b(0) == 'I' && b(1) == 'I') false
      else return None
    def u16(o: Int): Int =
      if (big) ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
      else ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)
    def u32(o: Int): Long =
      if (big) ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
      else ((b(o + 3) & 0xffL) << 24) | ((b(o + 2) & 0xffL) << 16) |
        ((b(o + 1) & 0xffL) << 8) | (b(o) & 0xffL)
    if (u16(2) != 42) return None
    var width = -1; var height = -1; var iso = -1
    var nIfd0 = 0; var nExif = 0; var makeLen = -1
    var exifPtr = -1L
    // IFD chain walk (IFD0, then next-IFD links; fixture has one)
    var ifd = u32(4)
    var guard = 0
    while (ifd > 0 && ifd + 2 <= b.length && guard < 8) {
      val n = u16(ifd.toInt)
      nIfd0 += n
      var i = 0
      while (i < n) {
        val e = ifd.toInt + 2 + 12 * i
        val tag = u16(e); val typ = u16(e + 2); val cnt = u32(e + 4)
        tag match {
          case 256 if typ == 3 => width = u16(e + 8)
          case 257 if typ == 3 => height = u16(e + 8)
          case 271 if typ == 2 => makeLen = cnt.toInt - 1
          case 0x8769          => exifPtr = u32(e + 8)
          case _               => ()
        }
        i += 1
      }
      ifd = u32(ifd.toInt + 2 + 12 * n)
      guard += 1
    }
    if (exifPtr > 0 && exifPtr + 2 <= b.length) {
      val n = u16(exifPtr.toInt)
      nExif = n
      var i = 0
      while (i < n) {
        val e = exifPtr.toInt + 2 + 12 * i
        if (u16(e) == 0x8827 && u16(e + 2) == 3) iso = u16(e + 8)
        i += 1
      }
    }
    if (width < 0 || height < 0) None
    else Some((big, width, height, iso, nIfd0, nExif, makeLen))
  }

  /** A real GIF89a container: header, logical screen descriptor with a
    * global color table, and per frame a graphic-control extension
    * (delay, transparency), an image descriptor, and LZW data
    * sub-blocks (structure genuine; the LZW payload itself is fill —
    * sample decode is codec territory, the block framing is not). */
  def gifBytes(width: Int, height: Int, gctBits: Int, frames: Seq[(Int, Int)])
      : Array[Byte] = {
    // frames: (delayCentiSec, dataLen ≤ 255)
    val bo = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { bo.write(v & 0xff); bo.write((v >> 8) & 0xff) }
    bo.write("GIF89a".getBytes("US-ASCII"))
    u16(width); u16(height)
    bo.write(0x80 | ((gctBits - 1) & 0x7)) // GCT present, size = 2^gctBits
    bo.write(0); bo.write(0)               // bg color, aspect
    bo.write(new Array[Byte](3 * (1 << gctBits)))
    frames.foreach { case (delay, len) =>
      bo.write(0x21); bo.write(0xf9); bo.write(4) // graphic control ext
      bo.write(0x04)                              // packed: no transparency
      u16(delay); bo.write(0); bo.write(0)        // delay, transp idx, term
      bo.write(0x2c)                              // image descriptor
      u16(0); u16(0); u16(width); u16(height)
      bo.write(0)                                 // no local color table
      bo.write(8)                                 // LZW min code size
      bo.write(len)                               // one data sub-block
      var i = 0
      while (i < len) { bo.write(i % 251); i += 1 }
      bo.write(0)                                 // sub-block terminator
    }
    bo.write(0x3b)                                // trailer
    bo.toByteArray
  }

  /** REAL GIF block walk: header + version check, logical screen
    * descriptor (dims, global-color-table size from the packed field),
    * then the block stream — extensions (0x21, sub-block chains;
    * graphic-control delays accumulated), image descriptors (0x2C,
    * local color table honored, LZW sub-blocks measured), to the 0x3B
    * trailer. Returns (width, height, gctEntries, nFrames,
    * totalDelayCs, dataBytes); None without the magic. A malformed
    * block stops the walk at what parsed (P8 stance). */
  def decodeGif(b: Array[Byte])
      : Option[(Int, Int, Int, Int, Long, Long)] = {
    if (b.length < 13) return None
    val magic = new String(b, 0, 6, "US-ASCII")
    if (magic != "GIF89a" && magic != "GIF87a") return None
    def u16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    val w = u16(6); val h = u16(8)
    val packed = b(10) & 0xff
    val gct = if ((packed & 0x80) != 0) 1 << ((packed & 0x7) + 1) else 0
    var o = 13 + 3 * gct
    var frames = 0; var delay = 0L; var dataBytes = 0L
    var done = false
    def subBlocks(): Unit = {
      var len = b(o) & 0xff; o += 1
      while (len != 0 && o + len < b.length) {
        dataBytes += len; o += len
        len = b(o) & 0xff; o += 1
      }
    }
    while (!done && o < b.length) {
      (b(o) & 0xff) match {
        case 0x3b => done = true
        case 0x21 => // extension: label, then sub-block chain
          val label = b(o + 1) & 0xff
          o += 2
          if (label == 0xf9 && (b(o) & 0xff) == 4) delay += u16(o + 2)
          // skip the extension's own sub-blocks without counting them
          var len = b(o) & 0xff; o += 1
          while (len != 0 && o + len < b.length) {
            o += len; len = b(o) & 0xff; o += 1
          }
        case 0x2c =>
          frames += 1
          val lp = b(o + 9) & 0xff
          o += 10
          if ((lp & 0x80) != 0) o += 3 * (1 << ((lp & 0x7) + 1))
          o += 1 // LZW minimum code size
          subBlocks()
        case _ => done = true // lost framing — stop at what parsed
      }
    }
    Some((w, h, gct, frames, delay, dataBytes))
  }

  /** Aspect-preserving fit of (w, h) into maxSide², never upscaling. */
  def fitThumb(w: Int, h: Int, maxSide: Int = 256): (Int, Int) = {
    val longSide = math.max(w, h)
    if (longSide <= maxSide) (w, h)
    else (w * maxSide / longSide, h * maxSide / longSide)
  }

  /** A real WebP container (RIFF): 'RIFF' size 'WEBP', a VP8X extended
    * header (feature flags + 24-bit LE canvas dims minus one), an
    * optional EXIF chunk and a VP8 bitstream stub — RIFF chunks pad to
    * even length. Only the VP8X fields are decode targets (pixel decode
    * needs libwebp); canvas, flags and chunk framing are what a
    * curation pass reads. */
  def webpBytes(width: Int, height: Int, alpha: Boolean, exifLen: Int,
      vp8Len: Int): Array[Byte] = {
    require(width >= 1 && width <= (1 << 24) && height >= 1 &&
      height <= (1 << 24), s"canvas $width x $height")
    def chunkLen(payload: Int): Int = 8 + payload + (payload & 1)
    val total = 12 + chunkLen(10) +
      (if (exifLen > 0) chunkLen(exifLen) else 0) + chunkLen(vp8Len)
    val out = new Array[Byte](total)
    var o = 0
    def put4(s: String): Unit = {
      var i = 0; while (i < 4) { out(o) = s.charAt(i).toByte; o += 1; i += 1 }
    }
    def le32(v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = ((v >> 16) & 0xff).toByte
      out(o + 3) = ((v >> 24) & 0xff).toByte; o += 4
    }
    def le24(v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = ((v >> 16) & 0xff).toByte; o += 3
    }
    put4("RIFF"); le32(total - 8); put4("WEBP")
    put4("VP8X"); le32(10)
    // VP8X flags byte (spec order, MSB first): Rsv Rsv ICC Alpha EXIF
    // XMP Anim Rsv
    out(o) = ((if (alpha) 0x10 else 0) | (if (exifLen > 0) 0x08 else 0)).toByte
    o += 1
    out(o) = 0; out(o + 1) = 0; out(o + 2) = 0; o += 3 // reserved
    le24(width - 1); le24(height - 1)
    if (exifLen > 0) {
      put4("EXIF"); le32(exifLen)
      var i = 0
      while (i < exifLen) { out(o) = ((i * 7 + 3) % 251).toByte; o += 1; i += 1 }
      if ((exifLen & 1) == 1) { out(o) = 0; o += 1 }
    }
    put4("VP8 "); le32(vp8Len)
    var i = 0
    while (i < vp8Len) { out(o) = ((i * 5 + 1) % 251).toByte; o += 1; i += 1 }
    if ((vp8Len & 1) == 1) { out(o) = 0; o += 1 }
    out
  }

  /** WebP RIFF walk: validates the RIFF/WEBP magic, hops even-padded
    * chunks, reads canvas dims and the alpha/EXIF flags from VP8X.
    * Crash-proof on malformed input: a hostile or truncated chunk size
    * ends the walk with whatever parsed (P8 permissive stance); None if
    * no VP8X header was seen. Returns (width, height, hasAlpha,
    * hasExif, nChunks, fileBytes). */
  def decodeWebpMeta(b: Array[Byte])
      : Option[(Int, Int, Boolean, Boolean, Int, Int)] = {
    if (b.length < 12) return None
    def tag(off: Int): String = new String(b, off, 4, "US-ASCII")
    def le32(off: Int): Long =
      (b(off) & 0xffL) | (b(off + 1) & 0xffL) << 8 |
        (b(off + 2) & 0xffL) << 16 | (b(off + 3) & 0xffL) << 24
    if (tag(0) != "RIFF" || tag(8) != "WEBP") return None
    var o = 12
    var n = 0
    var dims: Option[(Int, Int, Boolean, Boolean)] = None
    var ok = true
    while (ok && o + 8 <= b.length) {
      val fourcc = tag(o)
      val len = le32(o + 4)
      if (len < 0 || o + 8 + len > b.length) ok = false
      else {
        if (fourcc == "VP8X" && len >= 10) {
          val fl = b(o + 8) & 0xff
          val w = 1 + ((b(o + 12) & 0xff) | (b(o + 13) & 0xff) << 8 |
            (b(o + 14) & 0xff) << 16)
          val h = 1 + ((b(o + 15) & 0xff) | (b(o + 16) & 0xff) << 8 |
            (b(o + 17) & 0xff) << 16)
          dims = Some((w, h, (fl & 0x10) != 0, (fl & 0x08) != 0))
        }
        n += 1
        o += 8 + len.toInt + (len.toInt & 1)
      }
    }
    dims.map { case (w, h, a, e) => (w, h, a, e, n, b.length) }
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

  // ---------------------------------------------------------------- EBML

  /** Minimal Matroska (EBML) writer: EBML header (DocType "matroska") +
    * Segment(Info(TimestampScale, Duration), Tracks(TrackEntry×k),
    * Cluster×c(Timestamp, SimpleBlock×b)). Element IDs are the public
    * Matroska class IDs written verbatim; every SIZE uses the 8-byte
    * vint form (legal, non-minimal EBML) so the container size is an
    * affine function of payload sizes — the property q342's oracle
    * reconstructs. Uints use fixed widths (TimestampScale and cluster
    * Timestamp 4 bytes, TrackNumber/TrackType 1); Duration is the
    * spec's 8-byte IEEE double. Block payloads carry a real SimpleBlock
    * frame: track vint (0x80|track), 2-byte big-endian timecode, flags.
    */
  def mkvBytes(nTracks: Int, durationMs: Long,
      clusters: Seq[(Long, Seq[Int])]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    def beN(v: Long, w: Int): Unit = {
      var i = w - 1
      while (i >= 0) { bo.write(((v >>> (8 * i)) & 0xff).toInt); i -= 1 }
    }
    def size8(v: Long): Unit = { bo.write(0x01); beN(v, 7) }
    // EBML header: 4 id + 8 size + (DocType: 2 id + 8 size + 8 ascii)
    beN(0x1A45DFA3L, 4); size8(18)
    beN(0x4282L, 2); size8(8); bo.write("matroska".getBytes("US-ASCII"))
    // payload sizes (fixed-width vints make them arithmetic)
    val infoSz = 15L + 18L // TimestampScale(3+8+4) + Duration(2+8+8)
    val trackEntrySz = 20L // TrackNumber(1+8+1) + TrackType(1+8+1)
    val tracksSz = nTracks * (1L + 8 + trackEntrySz)
    val clusterSzs = clusters.map { case (_, blocks) =>
      13L + blocks.map(b => 1L + 8 + 4 + b).sum // Timestamp el + SimpleBlocks
    }
    val segSz = (4 + 8 + infoSz) + (4 + 8 + tracksSz) +
      clusterSzs.map(4 + 8 + _).sum
    beN(0x18538067L, 4); size8(segSz) // Segment
    beN(0x1549A966L, 4); size8(infoSz) // Info
    beN(0x2AD7B1L, 3); size8(4); beN(1000000L, 4) // TimestampScale
    beN(0x4489L, 2); size8(8) // Duration: 8-byte IEEE double
    beN(java.lang.Double.doubleToLongBits(durationMs.toDouble), 8)
    beN(0x1654AE6BL, 4); size8(tracksSz) // Tracks
    (1 to nTracks).foreach { t =>
      bo.write(0xAE); size8(trackEntrySz) // TrackEntry
      bo.write(0xD7); size8(1); bo.write(t) // TrackNumber
      bo.write(0x83); size8(1); bo.write(if (t == 1) 1 else 2) // TrackType
    }
    clusters.zip(clusterSzs).foreach { case ((ts, blocks), csz) =>
      beN(0x1F43B675L, 4); size8(csz) // Cluster
      bo.write(0xE7); size8(4); beN(ts, 4) // Timestamp
      blocks.zipWithIndex.foreach { case (len, bi) =>
        bo.write(0xA3); size8(4L + len) // SimpleBlock
        bo.write(0x80 | (1 + bi % nTracks)) // track vint
        beN((bi * 40L) & 0xffffL, 2) // relative timecode
        bo.write(0x00) // flags
        bo.write(Array.fill(len)('m'.toByte))
      }
    }
    bo.toByteArray
  }

  /** Walk an EBML/Matroska stream by the real vint rules (id width from
    * the leading byte's marker bit, size vints up to 8 bytes, ANY legal
    * width — not just the writer's): returns (nTracks, timestampScale,
    * durationMs, nClusters, nBlocks, blockPayloadBytes). None if the
    * stream doesn't start with the EBML magic. */
  def decodeMkv(b: Array[Byte])
      : Option[(Int, Long, Long, Int, Int, Long)] = {
    if (b.length < 4) return None
    def vintWidth(first: Int, max: Int): Int = {
      var w = 1
      while (w <= max && (first & (0x80 >>> (w - 1))) == 0) w += 1
      w
    }
    def readId(o: Int): (Long, Int) = {
      val w = vintWidth(b(o) & 0xff, 4)
      var v = 0L
      var i = 0
      while (i < w) { v = (v << 8) | (b(o + i) & 0xff); i += 1 }
      (v, w) // ids keep their marker bits (class id convention)
    }
    def readSize(o: Int): (Long, Int) = {
      val w = vintWidth(b(o) & 0xff, 8)
      var v = (b(o) & 0xff & (0xff >>> w)).toLong
      var i = 1
      while (i < w) { v = (v << 8) | (b(o + i) & 0xff); i += 1 }
      (v, w)
    }
    def readUint(o: Int, n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 8) | (b(o + i) & 0xff); i += 1 }
      v
    }
    var nTracks = 0
    var tsScale = 0L
    var duration = 0L
    var nClusters = 0
    var nBlocks = 0
    var blockBytes = 0L
    val master = Set(0x18538067L, 0x1549A966L, 0x1654AE6BL, 0xAEL, 0x1F43B675L)
    def walk(start: Int, end: Int): Unit = {
      var o = start
      while (o < end) {
        val (eid, iw) = readId(o)
        val (sz, sw) = readSize(o + iw)
        val body = o + iw + sw
        eid match {
          case 0xAEL => nTracks += 1
          case 0x1F43B675L => nClusters += 1
          case 0x2AD7B1L => tsScale = readUint(body, sz.toInt)
          case 0x4489L if sz == 8 =>
            duration = java.lang.Double
              .longBitsToDouble(readUint(body, 8)).toLong
          case 0xA3L =>
            nBlocks += 1
            // SimpleBlock payload past the 4-byte frame header
            blockBytes += sz - 4
          case _ => ()
        }
        if (master.contains(eid)) walk(body, body + sz.toInt)
        o = body + sz.toInt
      }
    }
    val (magic, mw) = readId(0)
    if (magic != 0x1A45DFA3L) return None
    val (hsz, hw) = readSize(mw)
    walk(mw + hw + hsz.toInt, b.length)
    Some((nTracks, tsScale, duration, nClusters, nBlocks, blockBytes))
  }
}
