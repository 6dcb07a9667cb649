package graft.ops

/** Minimal USTAR tar writer/reader — the container behind
  * WebDataset-style training shards (a 100 TB corpus ships as tar
  * shards of named members, streamed sequentially; cf. POSIX.1-1988
  * ustar layout). Pure JVM, no library: 512-byte headers with octal
  * size/checksum fields, payload zero-padded to block size, archive
  * terminated by two zero blocks.
  *
  * Scope: regular files only (typeflag '0'), names ≤ 100 bytes, sizes
  * < 8 GiB (11 octal digits) — exactly the envelope a shard writer
  * produces. The reader verifies the `ustar` magic and the header
  * checksum on every member and stops at the first zero block, so a
  * truncated or bit-flipped shard fails loudly rather than yielding
  * silently short corpora.
  */
object Tar {
  private val BLOCK = 512

  /** Encode members (name, payload) into one USTAR archive. */
  def encode(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    entries.foreach { case (name, data) =>
      bos.write(header(name, data.length))
      bos.write(data)
      val pad = (BLOCK - data.length % BLOCK) % BLOCK
      if (pad > 0) bos.write(new Array[Byte](pad))
    }
    bos.write(new Array[Byte](2 * BLOCK)) // end-of-archive marker
    bos.toByteArray
  }

  private def header(name: String, size: Int): Array[Byte] = {
    val nameB = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    require(nameB.length <= 100, s"tar: name too long (${nameB.length})")
    require(size >= 0, "tar: negative size")
    val h = new Array[Byte](BLOCK)
    System.arraycopy(nameB, 0, h, 0, nameB.length)
    putOctal(h, 100, 8, 420)          // mode 0644
    putOctal(h, 108, 8, 0)            // uid
    putOctal(h, 116, 8, 0)            // gid
    putOctal(h, 124, 12, size)        // size
    putOctal(h, 136, 12, 0)           // mtime (epoch: deterministic)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum = spaces while summing
    h(156) = '0'                      // typeflag: regular file
    h(257) = 'u'; h(258) = 's'; h(259) = 't'; h(260) = 'a'; h(261) = 'r'
    h(262) = 0                        // magic "ustar\0"
    h(263) = '0'; h(264) = '0'        // version "00"
    var sum = 0L
    var i = 0
    while (i < BLOCK) { sum += h(i) & 0xff; i += 1 }
    // chksum field: six octal digits, NUL, space (the historical layout)
    val oct = ("%06o".format(sum)).getBytes("US-ASCII")
    System.arraycopy(oct, 0, h, 148, 6)
    h(154) = 0; h(155) = ' '
    h
  }

  private def putOctal(h: Array[Byte], off: Int, len: Int, v: Long): Unit = {
    // len-1 octal digits, zero-padded, NUL terminator
    val s = ("%0" + (len - 1) + "o").format(v)
    val b = s.getBytes("US-ASCII")
    System.arraycopy(b, 0, h, off, b.length)
    h(off + len - 1) = 0
  }

  /** Decode an archive back to (name, payload) members in order.
    * Verifies magic + checksum per header; throws on corruption. */
  def decode(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = Seq.newBuilder[(String, Array[Byte])]
    var off = 0
    var done = false
    while (!done) {
      require(off + BLOCK <= bytes.length, s"tar: truncated header at $off")
      if (allZero(bytes, off, BLOCK)) done = true
      else {
        require(bytes(off + 257) == 'u' && bytes(off + 258) == 's' &&
          bytes(off + 259) == 't' && bytes(off + 260) == 'a' &&
          bytes(off + 261) == 'r', s"tar: bad magic at $off")
        var sum = 0L
        var i = 0
        while (i < BLOCK) {
          sum += (if (i >= 148 && i < 156) ' '.toInt else bytes(off + i) & 0xff)
          i += 1
        }
        val stored = parseOctal(bytes, off + 148, 8)
        require(stored == sum, s"tar: checksum $stored != $sum at $off")
        var nameEnd = off
        while (nameEnd < off + 100 && bytes(nameEnd) != 0) nameEnd += 1
        val name = new String(bytes, off, nameEnd - off,
          java.nio.charset.StandardCharsets.UTF_8)
        // size stays Long until range-checked: a >=2 GiB member must
        // fail LOUDLY here, not silently truncate through .toInt and
        // mis-slice the copy below (the 11-octal-digit envelope is
        // 8 GiB; a JVM byte[] caps the in-memory shard at 2 GiB)
        val sizeL = parseOctal(bytes, off + 124, 12)
        require(sizeL <= Int.MaxValue.toLong - BLOCK,
          s"tar: member '$name' size $sizeL exceeds in-memory shard limit")
        val size = sizeL.toInt
        val data = java.util.Arrays.copyOfRange(bytes,
          off + BLOCK, off + BLOCK + size)
        out += ((name, data))
        off += BLOCK + ((size + BLOCK - 1) / BLOCK) * BLOCK
      }
    }
    out.result()
  }

  /** `.tar.gz` WebDataset shard: the same USTAR archive wrapped in a
    * single GZIP member (RFC 1952, the JDK's Deflater) — the on-disk
    * form WebDataset loaders actually stream. The tar layout is
    * unchanged, so the compressed twin shares the plain twin's oracle
    * verbatim after [[gunzip]]. */
  def encodeGz(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream
    val gz = new java.util.zip.GZIPOutputStream(baos)
    gz.write(encode(entries))
    gz.finish(); gz.close()
    baos.toByteArray
  }

  /** Inflate a single-member GZIP stream (loud on trailing garbage —
    * a concatenated second member or junk suffix would silently vanish
    * otherwise). GZIPInputStream itself drains to EOF (it transparently
    * decodes concatenated members), so the check must be byte-exact:
    * inflate the one member with Inflater directly and compare the
    * member's total footprint (10-byte header + optional fields +
    * deflate payload + 8-byte trailer) against the input length. */
  def gunzip(bytes: Array[Byte]): Array[Byte] = {
    require(bytes.length >= 18 &&
      (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b && bytes(2) == 8,
      "tar.gz: not a gzip (RFC 1952) stream")
    val flg = bytes(3) & 0xff
    var off = 10
    if ((flg & 4) != 0) { // FEXTRA
      val xlen = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
      off += 2 + xlen
    }
    if ((flg & 8) != 0) { while (bytes(off) != 0) off += 1; off += 1 }  // FNAME
    if ((flg & 16) != 0) { while (bytes(off) != 0) off += 1; off += 1 } // FCOMMENT
    if ((flg & 2) != 0) off += 2                                        // FHCRC
    val inf = new java.util.zip.Inflater(true) // raw deflate
    inf.setInput(bytes, off, bytes.length - off)
    val baos = new java.io.ByteArrayOutputStream(bytes.length * 3)
    val buf = new Array[Byte](65536)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      require(n > 0 || !inf.needsInput(), "tar.gz: truncated deflate stream")
      baos.write(buf, 0, n)
    }
    val consumed = off + (inf.getTotalIn: Int) + 8 // + CRC32 + ISIZE trailer
    inf.end()
    require(bytes.length >= consumed, "tar.gz: truncated gzip trailer")
    require(bytes.length == consumed,
      s"tar.gz: ${bytes.length - consumed} trailing bytes after the gzip member")
    val out = baos.toByteArray
    // verify the member trailer (CRC32 of the uncompressed data, ISIZE mod 2^32)
    val crc = new java.util.zip.CRC32; crc.update(out)
    val tOff = consumed - 8
    def le32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    require(le32(tOff) == crc.getValue, "tar.gz: CRC32 mismatch")
    require(le32(tOff + 4) == (out.length & 0xffffffffL), "tar.gz: ISIZE mismatch")
    out
  }

  /** Decode a `.tar.gz` shard: gunzip, then the USTAR walk. */
  def decodeGz(bytes: Array[Byte]): Seq[(String, Array[Byte])] =
    decode(gunzip(bytes))

  private def parseOctal(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = off
    val end = off + len
    while (i < end && (b(i) == ' ' || b(i) == 0)) i += 1 // leading pad
    while (i < end && b(i) >= '0' && b(i) <= '7') { v = v * 8 + (b(i) - '0'); i += 1 }
    v
  }

  private def allZero(b: Array[Byte], off: Int, len: Int): Boolean = {
    var i = off
    while (i < off + len) { if (b(i) != 0) return false; i += 1 }
    true
  }
}
