package graft.functions

import scala.collection.mutable.ArrayBuffer

/** POSIX ustar (tar) writer + walker — the container WebDataset actually
  * ships training shards in (one .tar per shard, members grouped by sample
  * key). Complements the repo's own length-prefixed blob-shard format
  * (sources/BlobShardSource.scala) with the interchange format the rest of
  * the ecosystem reads. Pure JDK, byte-faithful: the writer's output is
  * byte-identical to Python `tarfile` USTAR_FORMAT (ArchiveSpec pins this
  * against a python-generated fixture), and the walker verifies each
  * header's checksum the way `tar -t` does.
  *
  * Format (all public knowledge, POSIX.1-1988 ustar):
  *   - 512-byte header per member: name[100] mode[8] uid[8] gid[8]
  *     size[12-octal] mtime[12-octal] chksum[8] typeflag[1] linkname[100]
  *     magic "ustar\0" version "00" uname[32] gname[32] devmajor[8]
  *     devminor[8] prefix[155] pad[12]
  *   - octal fields: zero-padded digits + NUL; chksum is the byte sum of
  *     the header with the chksum field read as 8 spaces, stored as
  *     6 octal digits + NUL + space
  *   - payload padded to a 512 multiple; archive ends with two zero
  *     blocks and is padded to the 10240-byte record size (GNU blocking
  *     factor 20 — what `tarfile` and `tar` emit by default)
  */
object Archives {

  private val RecordSize = 10240

  private def octal(v: Long, width: Int): Array[Byte] = {
    val s = java.lang.Long.toOctalString(v)
    (("0" * (width - 1 - s.length)) + s + "\u0000").getBytes("US-ASCII")
  }

  /** Serialize members (name → payload) as a ustar archive. Names must fit
    * the 100-byte field (no prefix splitting — sample keys always do). */
  def tarBytes(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    members.foreach { case (name, data) =>
      val h = new Array[Byte](512)
      val nb = name.getBytes("US-ASCII")
      require(nb.length <= 100, s"tar name exceeds ustar field: $name")
      System.arraycopy(nb, 0, h, 0, nb.length)
      System.arraycopy(octal(0x1a4, 8), 0, h, 100, 8) // mode 0644
      System.arraycopy(octal(0, 8), 0, h, 108, 8) // uid
      System.arraycopy(octal(0, 8), 0, h, 116, 8) // gid
      System.arraycopy(octal(data.length.toLong, 12), 0, h, 124, 12)
      System.arraycopy(octal(0, 12), 0, h, 136, 12) // mtime
      java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum as spaces
      h(156) = '0' // typeflag: regular file
      System.arraycopy("ustar\u000000".getBytes("US-ASCII"), 0, h, 257, 8)
      var sum = 0L
      var i = 0
      while (i < 512) { sum += (h(i) & 0xff); i += 1 }
      val cs = java.lang.Long.toOctalString(sum)
      val csb = (("0" * (6 - cs.length)) + cs + "\u0000 ").getBytes("US-ASCII")
      System.arraycopy(csb, 0, h, 148, 8)
      bo.write(h)
      bo.write(data)
      bo.write(new Array[Byte](((data.length + 511) / 512) * 512 - data.length))
    }
    bo.write(new Array[Byte](1024)) // end-of-archive marker
    val n = bo.size()
    if (n % RecordSize != 0) // pad to the blocking-factor record
      bo.write(new Array[Byte](RecordSize - n % RecordSize))
    bo.toByteArray
  }

  /** Walk a ustar stream: one (name, size, dataOffset, chksumOk) per
    * member, in archive order. Stops at the first all-zero block (the
    * end-of-archive marker). Tolerates leading spaces in octal fields
    * (some writers space-pad); verifies the stored checksum against the
    * recomputed one so corrupt headers surface as chksumOk=false rather
    * than a garbage walk. */
  def decodeTar(b: Array[Byte]): Seq[(String, Long, Long, Boolean)] = {
    val out = ArrayBuffer[(String, Long, Long, Boolean)]()
    var off = 0
    def allZero(o: Int): Boolean = {
      var i = o
      while (i < o + 512) { if (b(i) != 0) return false; i += 1 }
      true
    }
    def oct(o: Int, n: Int): Long = {
      var i = o
      while (i < o + n && b(i) == ' ') i += 1
      var v = 0L
      while (i < o + n && b(i) >= '0' && b(i) <= '7') { v = v * 8 + (b(i) - '0'); i += 1 }
      v
    }
    while (off + 512 <= b.length && !allZero(off)) {
      var e = off
      while (e < off + 100 && b(e) != 0) e += 1
      val name = new String(b, off, e - off, "US-ASCII")
      val size = oct(off + 124, 12)
      val stored = oct(off + 148, 8)
      var sum = 0L
      var i = 0
      while (i < 512) {
        sum += (if (i >= 148 && i < 156) ' '.toLong else (b(off + i) & 0xff).toLong)
        i += 1
      }
      out += ((name, size, (off + 512).toLong, sum == stored))
      off += 512 + (((size + 511) / 512) * 512).toInt
    }
    out.toSeq
  }
}
