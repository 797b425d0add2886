package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Multimodal

/** EBML walker mechanics beyond q342's oracle: the walker must follow
  * the REAL vint rules (any legal width), not just the writer's fixed
  * 8-byte sizes — pinned with a hand-built minimal-width Matroska
  * fragment. */
class MkvSpec extends AnyFunSuite {

  test("writer/walker round-trip recovers the full geometry") {
    val media = Multimodal.mkvBytes(nTracks = 2, durationMs = 4321,
      clusters = Seq((0L, Seq(20, 30)), (1000L, Seq(40))))
    val got = Multimodal.decodeMkv(media)
    assert(got.contains((2, 1000000L, 4321L, 2, 3, 90L)))
    // affine size law the q342 oracle relies on
    assert(media.length == 99 + 29 * 2 + 25 * 2 + 13 * 3 + 90)
  }

  test("walker accepts minimal-width size vints (foreign writers)") {
    // hand-built: EBML header with an EMPTY payload and 1-byte size,
    // then Segment(Cluster(Timestamp=5, SimpleBlock with 2 data bytes)),
    // every size a minimal 1-byte vint — unlike our writer's 8-byte form
    val b = Array[Int](
      0x1A, 0x45, 0xDF, 0xA3, 0x80, // EBML header, size 0
      0x18, 0x53, 0x80, 0x67, 0x80 | 16, // Segment, size 16
      0x1F, 0x43, 0xB6, 0x75, 0x80 | 11, // Cluster, size 11
      0xE7, 0x81, 0x05, // Timestamp = 5
      0xA3, 0x86, 0x81, 0x00, 0x28, 0x00, 0x6d, 0x6d // SimpleBlock, 2B data
    ).map(_.toByte)
    val got = Multimodal.decodeMkv(b)
    assert(got.contains((0, 0L, 0L, 1, 1, 2L)),
      s"minimal-width walk broke: $got")
  }

  test("non-EBML bytes return None") {
    assert(Multimodal.decodeMkv(Array.fill(64)(9.toByte)).isEmpty)
    assert(Multimodal.decodeMkv(Array[Byte](1, 2)).isEmpty)
  }
}
