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
}
