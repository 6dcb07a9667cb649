package graft.ops

/** Minimal ZIP (PKZIP APPNOTE) writer/reader — the other archive
  * container a crawl actually arrives in. Pure JVM: local file
  * headers + central directory + end-of-central-directory record,
  * entries DEFLATE-compressed (raw, nowrap) via the JDK's zlib, CRC-32
  * verified on extraction. Deterministic output: fixed DOS timestamp
  * (1980-01-01), no extra fields, entries in input order.
  *
  * Scope: ≤ 65535 members, 32-bit sizes (no ZIP64) — a shard-sized
  * envelope. The reader walks the CENTRAL directory (the authoritative
  * index, found via the EOCD record at the tail), not a linear
  * local-header scan, so it reads exactly like the JDK and Info-ZIP
  * do; CRC or size mismatches throw rather than yielding corrupt
  * members.
  */
object Zip {

  /** Encode members (name, payload) into one archive (method 8). */
  def encode(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    case class Cd(name: Array[Byte], crc: Long, csize: Int, usize: Int, off: Int)
    val cds = entries.map { case (name, data) =>
      val nameB = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val crc = new java.util.zip.CRC32
      crc.update(data)
      val defl = deflateRaw(data)
      val off = bos.size()
      le32(bos, 0x04034b50); le16(bos, 20); le16(bos, 0); le16(bos, 8)
      le16(bos, 0); le16(bos, 0x21)             // time 00:00:00, date 1980-01-01
      le32(bos, crc.getValue); le32(bos, defl.length); le32(bos, data.length)
      le16(bos, nameB.length); le16(bos, 0)
      bos.write(nameB); bos.write(defl)
      Cd(nameB, crc.getValue, defl.length, data.length, off)
    }
    val cdStart = bos.size()
    cds.foreach { c =>
      le32(bos, 0x02014b50); le16(bos, 20); le16(bos, 20); le16(bos, 0)
      le16(bos, 8); le16(bos, 0); le16(bos, 0x21)
      le32(bos, c.crc); le32(bos, c.csize); le32(bos, c.usize)
      le16(bos, c.name.length); le16(bos, 0); le16(bos, 0) // extra, comment
      le16(bos, 0); le16(bos, 0); le32(bos, 0)             // disk, int/ext attrs
      le32(bos, c.off)
      bos.write(c.name)
    }
    val cdSize = bos.size() - cdStart
    le32(bos, 0x06054b50); le16(bos, 0); le16(bos, 0)
    le16(bos, cds.size); le16(bos, cds.size)
    le32(bos, cdSize); le32(bos, cdStart); le16(bos, 0)
    bos.toByteArray
  }

  /** Decode via EOCD → central directory → local headers. Verifies
    * CRC-32 and both sizes per member. */
  def decode(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    // EOCD: scan back for the signature (tolerates a trailing comment)
    var e = bytes.length - 22
    while (e >= 0 && rd32(bytes, e) != 0x06054b50L) e -= 1
    require(e >= 0, "zip: no end-of-central-directory record")
    val n = rd16(bytes, e + 10)
    var off = rd32(bytes, e + 16).toInt
    val out = Seq.newBuilder[(String, Array[Byte])]
    var i = 0
    while (i < n) {
      require(rd32(bytes, off) == 0x02014b50L, s"zip: bad CD entry at $off")
      val method = rd16(bytes, off + 10)
      val crc = rd32(bytes, off + 16)
      val csize = rd32(bytes, off + 20).toInt
      val usize = rd32(bytes, off + 24).toInt
      val nameLen = rd16(bytes, off + 28)
      val extraLen = rd16(bytes, off + 30)
      val commentLen = rd16(bytes, off + 32)
      val lho = rd32(bytes, off + 42).toInt
      val name = new String(bytes, off + 46, nameLen,
        java.nio.charset.StandardCharsets.UTF_8)
      // local header: skip its (possibly different) name/extra lengths
      require(rd32(bytes, lho) == 0x04034b50L, s"zip: bad local header at $lho")
      val dataOff = lho + 30 + rd16(bytes, lho + 26) + rd16(bytes, lho + 28)
      val raw = java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + csize)
      val data = method match {
        case 0 => require(csize == usize, "zip: stored size mismatch"); raw
        case 8 => inflateRaw(raw, usize)
        case m => throw new IllegalArgumentException(s"zip: method $m")
      }
      require(data.length == usize,
        s"zip: $name inflated ${data.length} != $usize")
      val c = new java.util.zip.CRC32
      c.update(data)
      require(c.getValue == crc, s"zip: $name CRC mismatch")
      out += ((name, data))
      off += 46 + nameLen + extraLen + commentLen
      i += 1
    }
    out.result()
  }

  private def deflateRaw(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(data); d.finish()
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
    d.end()
    bos.toByteArray
  }

  private def inflateRaw(raw: Array[Byte], usize: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater(true)
    inf.setInput(raw)
    val out = new Array[Byte](usize)
    var filled = 0
    while (!inf.finished() && filled < usize)
      filled += inf.inflate(out, filled, usize - filled)
    inf.end()
    require(filled == usize, s"zip: short inflate ($filled of $usize)")
    out
  }

  private def le16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
  }
  private def le32(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
    o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt)
  }
  private def rd16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def rd32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
}
