package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.BinaryType
import graft.functions.Multimodal

/** The multimodal mandate over a GENUINE BinaryType column (the corpus
  * stands in text bytes for media payloads; this fixture is real
  * `binary`): schema, mapPartitions batch shape, and frame/thumb logic. */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val payloads = Seq(
    1L -> Array.tabulate(1300)(i => (i % 251).toByte),
    2L -> Array.tabulate(100)(i => (i * 7 % 256).toByte),
    3L -> Array.tabulate(512)(_ => 0xff.toByte))

  test("frame sampling over a BinaryType column") {
    val df = payloads.toDF("id", "payload")
    assert(df.schema("payload").dataType == BinaryType)
    val frames = df.as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        Multimodal.frames(p).map { case (k, off, len, chk) => (id, k, off, len, chk) }
      }).toDF("id", "k", "off", "len", "chk").collect()
    // ceil(1300/512)=3, ceil(100/512)=1, ceil(512/512)=1 frames
    assert(frames.groupBy(_.getLong(0)).view.mapValues(_.length).toMap ==
      Map(1L -> 3, 2L -> 1, 3L -> 1))
    // hand-checked: doc 3 frame 0 = 256 bytes of 0xff → (256*255) % 997
    val d3 = frames.find(_.getLong(0) == 3L).get
    assert(d3.getInt(3) == 256 && d3.getInt(4) == (256 * 255) % 997)
    // short payload: single truncated frame
    val d2 = frames.find(_.getLong(0) == 2L).get
    assert(d2.getInt(2) == 0 && d2.getInt(3) == 100)
  }

  test("BMP: encode → decode round-trips dims; non-BMP bytes rejected") {
    for ((w, h) <- Seq((640, 416), (1, 1), (64, 479)))
      assert(Multimodal.decodeBmpDims(Multimodal.bmpBytes(w, h)) == Some((w, h)))
    // pixel payload must not disturb the header parse
    assert(Multimodal.decodeBmpDims(
      Multimodal.bmpBytes(33, 44, Array.fill(99)(7.toByte))) == Some((33, 44)))
    assert(Multimodal.decodeBmpDims("not an image".getBytes) == None)
    assert(Multimodal.decodeBmpDims(Array[Byte]('B', 'M', 0)) == None) // truncated
    assert(Multimodal.decodeBmpDims(Array.empty) == None)
  }

  test("BMP header bytes: little-endian layout a third-party reader expects") {
    val b = Multimodal.bmpBytes(640, 416)
    assert(b.length == 54)
    assert(b(0) == 'B' && b(1) == 'M')
    // width 640 = 0x280 LE at offset 18; height 416 = 0x1A0 at 22
    assert((b(18) & 0xff) == 0x80 && (b(19) & 0xff) == 0x02 && b(20) == 0 && b(21) == 0)
    assert((b(22) & 0xff) == 0xa0 && (b(23) & 0xff) == 0x01 && b(24) == 0 && b(25) == 0)
    assert((b(28) & 0xff) == 24) // bpp
  }

  test("WAV: encode → decode round-trips format; chunk walk skips extras") {
    assert(Multimodal.decodeWav(Multimodal.wavBytes(16000, 2, 1234)) ==
      Some((16000, 2, 16, 1234L)))
    assert(Multimodal.decodeWav(
      Multimodal.wavBytes(8000, 1, 50, Array.fill(100)(1.toByte))) ==
      Some((8000, 1, 16, 50L)))
    // a LIST chunk before fmt — decoders that hardcode offsets break here
    val base = Multimodal.wavBytes(44100, 1, 10)
    val withList = java.nio.ByteBuffer.allocate(base.length + 12)
      .put(base, 0, 12)
      .put("LIST".getBytes("US-ASCII")).putInt(Integer.reverseBytes(4))
      .put("INFO".getBytes("US-ASCII"))
      .put(base, 12, base.length - 12).array()
    assert(Multimodal.decodeWav(withList) == Some((44100, 1, 16, 10L)))
    assert(Multimodal.decodeWav("RIFFxxxxJUNK".getBytes ++ Array.fill(40)(0.toByte)) == None)
    assert(Multimodal.decodeWav(Array.fill(10)(0.toByte)) == None)
  }

  test("WAV decode never throws on malformed-but-plausible containers") {
    // 4-bit ADPCM: bits/8 == 0 — must skip (None), not divide by zero
    val adpcm = Multimodal.wavBytes(8000, 1, 10)
    val bb4 = java.nio.ByteBuffer.wrap(adpcm.clone())
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb4.putShort(34, 4) // bitsPerSample := 4
    assert(Multimodal.decodeWav(bb4.array()) == None)
    // declared chunk size near Int.MaxValue: the walk must run off the
    // end and return None, not wrap an Int offset negative and throw
    val big = Multimodal.wavBytes(8000, 1, 10)
    val bbBig = java.nio.ByteBuffer.wrap(big.clone())
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bbBig.putInt(16, Int.MaxValue - 3) // fmt chunk size := 0x7FFFFFFC
    assert(Multimodal.decodeWav(bbBig.array()) == None)
    // zero channels must also skip
    val zc = Multimodal.wavBytes(8000, 1, 10)
    val bbZc = java.nio.ByteBuffer.wrap(zc.clone())
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bbZc.putShort(22, 0) // channels := 0
    assert(Multimodal.decodeWav(bbZc.array()) == None)
  }

  test("PNG: encode → decode round-trips dims, chunk CRCs, and pixels") {
    for ((w, h) <- Seq((1, 1), (32, 8), (300, 250))) {
      val gray = Array.tabulate(w * h)(i => (i * 13 % 256).toByte)
      val png = Multimodal.pngBytes(w, h, gray)
      // signature a third-party reader checks
      assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
      val (pw, ph, depth, color, nChunks, idatB, pxSum) =
        Multimodal.decodePng(png).get
      assert((pw, ph, depth, color, nChunks) == (w, h, 8, 0, 3))
      // stored-block zlib framing is arithmetic: raw + 5/64KiB-block + 6
      val raw = h * (w + 1)
      assert(idatB == raw + 5 * math.max(1, (raw + 65534) / 65535) + 6)
      assert(pxSum == gray.map(_ & 0xffL).sum)
    }
    // >64 KiB of scanlines: multi-block stored stream must still inflate
    val big = Multimodal.pngBytes(300, 250, Array.fill(75000)(7.toByte))
    assert(Multimodal.decodePng(big).exists(_._7 == 75000L * 7))
  }

  test("PNG decode rejects corruption: CRC flip, bad filter, truncation") {
    val png = Multimodal.pngBytes(16, 4, Array.fill(64)(9.toByte))
    // flip one pixel byte inside IDAT: chunk CRC32 must catch it
    val corrupt = png.clone()
    corrupt(8 + 25 + 12) = (corrupt(8 + 25 + 12) ^ 0x01).toByte
    assert(Multimodal.decodePng(corrupt) == None)
    assert(Multimodal.decodePng(png.dropRight(7)) == None)  // truncated IEND
    assert(Multimodal.decodePng("not a png at all, but long enough to try"
      .getBytes) == None)
    assert(Multimodal.decodePng(Array.empty) == None)
    // declared chunk length beyond the buffer must not throw
    val hostile = png.clone()
    java.nio.ByteBuffer.wrap(hostile).putInt(8, Int.MaxValue - 2)
    assert(Multimodal.decodePng(hostile) == None)
  }

  test("JPEG: JDK-encoded bytes decode to exact dims; non-JPEG rejected") {
    val jpg = Multimodal.jpegBytes(37, 23)
    // genuine JPEG: SOI marker, then JFIF/EXIF structure ImageIO accepts
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8)
    assert(Multimodal.decodeJpegDims(jpg) == Some((37, 23)))
    // geometry is lossless even though pixels aren't: a second encode of
    // different dims decodes to ITS dims
    assert(Multimodal.decodeJpegDims(Multimodal.jpegBytes(16, 63)) ==
      Some((16, 63)))
    // rejects: BMP bytes (wrong magic), truncation after the SOI marker,
    // empty input — None, never a throw (P8)
    assert(Multimodal.decodeJpegDims(Multimodal.bmpBytes(10, 10)) == None)
    assert(Multimodal.decodeJpegDims(jpg.take(4)) == None)
    assert(Multimodal.decodeJpegDims(Array.empty) == None)
  }

  test("stub decode + thumbnail fit: aspect preserved, never upscaled") {
    val (w, h) = Multimodal.stubDims(1300)
    assert(w == 64 + 1300 % 576 && h == 64 + 1300 * 7 % 416)
    // >306 MB payload: nBytes * 7 overflows Int — must stay positive and
    // match BIGINT arithmetic (ADVICE r1)
    val (bw, bh) = Multimodal.stubDims(400000000L)
    assert(bw == (64 + 400000000L % 576).toInt && bw > 0)
    assert(bh == (64 + 400000000L * 7 % 416).toInt && bh > 0)
    assert(Multimodal.fitThumb(640, 480) == (256, 192))
    assert(Multimodal.fitThumb(100, 250) == (100, 250)) // no upscale
    assert(Multimodal.fitThumb(480, 640) == (192, 256))
  }

  test("MP3: encode → frame-header walk round-trips every field") {
    for (bi <- 1 to 14; ri <- 0 to 2; mono <- Seq(true, false)) {
      val nf = 1 + (bi + ri) % 5
      val b = Multimodal.mp3Bytes(bi, ri, mono, nf, id3Payload = 7)
      val got = Multimodal.decodeMp3Meta(b)
      val br = Multimodal.Mp3Bitrates(bi); val rate = Multimodal.Mp3Rates(ri)
      assert(got.contains((br, rate, if (mono) 1 else 2, nf.toLong,
        nf * 1152L * 1000L / rate)), s"bi=$bi ri=$ri mono=$mono: $got")
      assert(b.length == 17 + nf * (144000 * br / rate),
        "declared geometry must match the byte count")
    }
  }

  test("MP3 decode never throws on malformed-but-plausible streams") {
    // truncated final frame: count only the complete ones
    val full = Multimodal.mp3Bytes(5, 1, mono = true, nFrames = 3)
    val cut = full.dropRight(5)
    assert(Multimodal.decodeMp3Meta(cut).exists(_._4 == 2L),
      "truncated trailing frame must not count")
    // garbage after valid frames: stop at lost sync, keep the prefix
    val noisy = full ++ Array.fill(16)(0x55.toByte)
    assert(Multimodal.decodeMp3Meta(noisy).exists(_._4 == 3L))
    // ID3 tag only, no frames
    assert(Multimodal.decodeMp3Meta(full.take(10)).isEmpty)
    // not an MP3 at all
    assert(Multimodal.decodeMp3Meta("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(Multimodal.decodeMp3Meta(Array.empty[Byte]).isEmpty)
    // hostile ID3 size claiming past EOF: walk must end cleanly
    val hostile = full.clone(); hostile(9) = 0x7f.toByte
    assert(Multimodal.decodeMp3Meta(hostile).isEmpty ||
      Multimodal.decodeMp3Meta(hostile).isDefined) // no throw is the contract
    // free-format (bitrate idx 0) and reserved (15) headers are rejected
    // (first frame header starts at 10 — the tag has no payload here)
    val bad0 = full.clone(); bad0(10 + 2) = (0 << 4 | 1 << 2).toByte
    val bad15 = full.clone(); bad15(10 + 2) = ((15 << 4 | 1 << 2) & 0xff).toByte
    assert(Multimodal.decodeMp3Meta(bad0).isEmpty)
    assert(Multimodal.decodeMp3Meta(bad15).isEmpty)
  }

  test("H.264: Annex-B walk counts every NAL type through both " +
      "start-code forms") {
    for (g <- 1 to 3; p <- 1 to 4) {
      val b = Multimodal.h264Bytes(g, p, spsLen = 9, ppsLen = 5,
        idrLen = 42, pLen = 17)
      assert(Multimodal.decodeH264Nals(b).contains((1, 1, g, g * p, 0)),
        s"g=$g p=$p")
      assert(b.length ==
        (4 + 9) + (4 + 5) + g * (4 + 42) + g * p * (3 + 17))
    }
  }

  test("H.264 walk never throws on malformed streams") {
    val b = Multimodal.h264Bytes(2, 2, 9, 5, 42, 17)
    // no leading start code
    assert(Multimodal.decodeH264Nals("garbage".getBytes).isEmpty)
    assert(Multimodal.decodeH264Nals(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodeH264Nals(b.drop(2)).isEmpty)
    // forbidden_zero_bit set mid-stream: keep the parsed prefix
    val fz = b.clone(); fz(4 + 9 + 4) = 0xe8.toByte // PPS header corrupted
    assert(Multimodal.decodeH264Nals(fz).contains((1, 0, 0, 0, 0)),
      s"walk must stop at the corrupt NAL: ${Multimodal.decodeH264Nals(fz)}")
    // truncation inside a payload: the trailing partial NAL still counts
    // (framing is intact; only its payload is short) — no throw is the
    // contract
    assert(Multimodal.decodeH264Nals(b.dropRight(5)).isDefined)
    // start code at EOF with no header byte
    val tail = b ++ Array[Byte](0, 0, 0, 1)
    assert(Multimodal.decodeH264Nals(tail).contains((1, 1, 2, 4, 0)))
  }

  test("WebP round trip and malformed-container robustness") {
    val b = Multimodal.webpBytes(width = 33, height = 47, alpha = true,
      exifLen = 13, vp8Len = 21)
    assert(Multimodal.decodeWebpMeta(b)
      .contains((33, 47, true, true, 3, b.length)))
    // no EXIF → flag off, 2 chunks
    val b2 = Multimodal.webpBytes(5, 6, alpha = false, exifLen = 0,
      vp8Len = 10)
    assert(Multimodal.decodeWebpMeta(b2)
      .contains((5, 6, false, false, 2, b2.length)))
    // odd payloads pad to even RIFF chunk boundaries
    assert(b.length ==
      12 + (8 + 10) + (8 + 13 + 1) + (8 + 21 + 1))
    assert(Multimodal.decodeWebpMeta(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodeWebpMeta("RIFFxxxxNOPE".getBytes).isEmpty)
    // hostile chunk size past EOF: walk ends cleanly with VP8X parsed
    val hostile = b.clone()
    java.nio.ByteBuffer.wrap(hostile)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(12 + 18 + 4, Int.MaxValue - 2) // EXIF size field
    assert(Multimodal.decodeWebpMeta(hostile)
      .contains((33, 47, true, true, 1, b.length)))
    // truncation before any VP8X header → None
    assert(Multimodal.decodeWebpMeta(b.take(14)).isEmpty)
  }
}
