package graft.functions

import scala.collection.mutable.ArrayBuffer

/** PKZIP (STORED) writer + walker — the other archive container training
  * corpora arrive in (alongside [[Archives]]' tar). STORED entries only:
  * no compression means member offsets/sizes are pure arithmetic, which
  * is what a shard INDEX needs (random access into an archive without
  * inflating it). The walker is central-directory-driven, exactly like
  * `unzip -l`: find the end-of-central-directory record from the back,
  * walk the central entries, cross-check each local header, and verify
  * payload CRC32s. ZipSpec pins the walker against a Python `zipfile`
  * generated fixture (foreign bytes, not our own writer's).
  *
  * Layout (PKWARE APPNOTE, public):
  *   local header  = "PK\3\4" ver(2) flags(2) method(2) time(2) date(2)
  *                   crc(4) csize(4) usize(4) nlen(2) elen(2) + name
  *   central entry = "PK\1\2" vermade(2) verneed(2) flags(2) method(2)
  *                   time(2) date(2) crc(4) csize(4) usize(4) nlen(2)
  *                   elen(2) clen(2) disk(2) iattr(2) eattr(4) lho(4)
  *                   + name
  *   EOCD          = "PK\5\6" disk(2) cddisk(2) n(2) ntotal(2) cdsize(4)
  *                   cdoff(4) clen(2)
  * All integers little-endian; DOS date 0x0021 = 1980-01-01.
  */
object Zips {

  def crc32(data: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32()
    c.update(data)
    c.getValue
  }

  /** Serialize members (name → payload) as a STORED zip. */
  def zipBytes(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { bo.write(v & 0xff); bo.write((v >>> 8) & 0xff) }
    def u32(v: Long): Unit = {
      bo.write((v & 0xff).toInt); bo.write(((v >>> 8) & 0xff).toInt)
      bo.write(((v >>> 16) & 0xff).toInt); bo.write(((v >>> 24) & 0xff).toInt)
    }
    val metas = members.map { case (name, data) =>
      val lho = bo.size()
      val nb = name.getBytes("US-ASCII")
      val crc = crc32(data)
      bo.write(Array[Byte]('P', 'K', 3, 4))
      u16(20); u16(0); u16(0) // version, flags, method STORED
      u16(0); u16(0x0021) // DOS time 0, date 1980-01-01
      u32(crc); u32(data.length.toLong); u32(data.length.toLong)
      u16(nb.length); u16(0)
      bo.write(nb); bo.write(data)
      (nb, data.length, crc, lho)
    }
    val cdoff = bo.size()
    metas.foreach { case (nb, sz, crc, lho) =>
      bo.write(Array[Byte]('P', 'K', 1, 2))
      u16(20); u16(20); u16(0); u16(0) // made, need, flags, method
      u16(0); u16(0x0021)
      u32(crc); u32(sz.toLong); u32(sz.toLong)
      u16(nb.length); u16(0); u16(0) // nlen, elen, clen
      u16(0); u16(0); u32(0) // disk, iattr, eattr
      u32(lho.toLong)
      bo.write(nb)
    }
    val cdsize = bo.size() - cdoff
    bo.write(Array[Byte]('P', 'K', 5, 6))
    u16(0); u16(0); u16(metas.size); u16(metas.size)
    u32(cdsize.toLong); u32(cdoff.toLong); u16(0)
    bo.toByteArray
  }

  /** Walk a zip via its central directory: one (name, size, dataOffset,
    * crcOk) per member in central-directory order. crcOk verifies BOTH
    * the local-header signature at the recorded offset AND the payload's
    * recomputed CRC32 against the central entry's. Returns Nil if no
    * EOCD is found (not a zip). */
  def decodeZip(b: Array[Byte]): Seq[(String, Long, Long, Boolean)] = {
    def u16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def u32(o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    // EOCD: scan backwards (comment may follow it)
    var e = b.length - 22
    while (e >= 0 && !(b(e) == 'P' && b(e + 1) == 'K' && b(e + 2) == 5 && b(e + 3) == 6))
      e -= 1
    if (e < 0) return Nil
    val n = u16(e + 10)
    var off = u32(e + 16).toInt
    val out = ArrayBuffer[(String, Long, Long, Boolean)]()
    var i = 0
    while (i < n) {
      require(b(off) == 'P' && b(off + 1) == 'K' && b(off + 2) == 1 && b(off + 3) == 2,
        s"bad central entry signature at $off")
      val crc = u32(off + 16)
      val usize = u32(off + 24)
      val nlen = u16(off + 28)
      val elen = u16(off + 30)
      val clen = u16(off + 32)
      val lho = u32(off + 42).toInt
      val name = new String(b, off + 46, nlen, "US-ASCII")
      val localOk = b(lho) == 'P' && b(lho + 1) == 'K' &&
        b(lho + 2) == 3 && b(lho + 3) == 4
      val dataOff = lho + 30 + u16(lho + 26) + u16(lho + 28)
      val crcOk = localOk && {
        val c = new java.util.zip.CRC32()
        c.update(b, dataOff, usize.toInt)
        c.getValue == crc
      }
      out += ((name, usize, dataOff.toLong, crcOk))
      off += 46 + nlen + elen + clen
      i += 1
    }
    out.toSeq
  }
}
