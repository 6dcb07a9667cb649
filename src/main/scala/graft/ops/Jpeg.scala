package graft.ops

/** Baseline JPEG (ITU-T T.81, sequential DCT, Huffman) — pure JVM, no
  * imaging libraries. Written from the public specification
  * (https://www.w3.org/Graphics/JPEG/itu-t81.pdf) like the rest of the
  * codec family; golden-tested BOTH directions against the JDK's own
  * javax.imageio JPEG plugin.
  *
  * Encoder: 4:4:4 (no chroma subsampling), one interleaved scan,
  * uniform quantization value `q` (q=1 ≈ the DCT round-trip floor),
  * standard Annex-K Huffman tables, optional restart interval.
  * Decoder: baseline sequential, 8-bit, sampling factors up to 2×2 —
  * 4:4:4, 4:2:2, and the 4:2:0 layout that dominates real crawls —
  * with box chroma upsampling; tables read from the stream (DQT/DHT),
  * DRI/RSTn honored, APPn/COM skipped. Progressive and 12-bit streams
  * are a loud error, not a silent misdecode — exactly the
  * [[Multimodal.decodePng]] posture.
  *
  * JPEG is LOSSY, so unlike the other codecs the round trip is
  * tolerance-banded, not bit-exact: the DCT forward/inverse rounding
  * plus the YCbCr round trip bound the per-pixel error at q=1, and
  * `q_jpeg_features` pins that band as a boolean the DuckDB oracle
  * expects to be uniformly TRUE. Cross-decoder pixel agreement with
  * javax.imageio is likewise banded (the spec does not mandate a
  * bit-exact IDCT); structural fields (dims, marker layout) are exact.
  *
  * Determinism: all trigonometry comes from StrictMath into a
  * precomputed table, and double arithmetic is IEEE-strict on the
  * JVM, so encode and decode are bit-reproducible across executors —
  * what makes the banded flag a stable oracle value at all. */
object Jpeg {

  // ---------------------------------------------------------------
  // Tables
  // ---------------------------------------------------------------

  /** Zig-zag sequence: zigzag index → natural (row-major) index. */
  private val Zig: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // Annex K standard Huffman specifications (BITS counts per code
  // length 1..16, then HUFFVAL). Encoder embeds these; the decoder
  // always reads tables from the stream, so cross-decoder round trips
  // depend only on these being VALID canonical tables covering every
  // (run,size) symbol — which the JpegSpec golden tests exercise.
  private val DcLumBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).toArray
  private val DcChrBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChrVals = (0 to 11).toArray

  private val AcLumBits =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  private val AcChrBits =
    Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChrVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Orthonormal 1-D DCT basis A(u)(x) = c(u)·cos((2x+1)uπ/16),
    * StrictMath so the matrix is identical on every JVM. */
  private val A: Array[Array[Double]] = {
    val m = Array.ofDim[Double](8, 8)
    var u = 0
    while (u < 8) {
      val cu = if (u == 0) StrictMath.sqrt(0.125) else 0.5
      var x = 0
      while (x < 8) {
        m(u)(x) = cu * StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)
        x += 1
      }
      u += 1
    }
    m
  }

  // ---------------------------------------------------------------
  // Bit IO (with JPEG byte stuffing)
  // ---------------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (spec convention). */
    def flush(): Unit = while (n != 0) put(1, 1)
  }

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    def bit(): Int = {
      if (n == 0) {
        var b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          val m = data(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed 0xFF data byte
          else throw new IllegalArgumentException(
            f"jpeg: marker 0xFF$m%02x inside entropy data")
        }
        acc = b; n = 8
      }
      n -= 1
      (acc >>> n) & 1
    }
    def receive(len: Int): Int = {
      var v = 0; var i = 0
      while (i < len) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def align(): Unit = n = 0
  }

  // ---------------------------------------------------------------
  // Huffman tables
  // ---------------------------------------------------------------

  /** Canonical code assignment per T.81 Annex C. */
  private final class HuffEnc(bits: Array[Int], vals: Array[Int]) {
    val codeOf = new Array[Int](256)
    val sizeOf = new Array[Int](256)
    locally {
      var code = 0; var k = 0; var len = 1
      while (len <= 16) {
        var i = 0
        while (i < bits(len - 1)) {
          codeOf(vals(k)) = code; sizeOf(vals(k)) = len
          code += 1; k += 1; i += 1
        }
        code <<= 1; len += 1
      }
      require(k == vals.length, "huffman: BITS/HUFFVAL mismatch")
    }
  }

  /** T.81 F.2.2.3 DECODE support arrays. */
  private final class HuffDec(bits: Array[Int], vals: Array[Int]) {
    val mincode = new Array[Int](17)
    val maxcode = Array.fill(17)(-1)
    val valptr = new Array[Int](17)
    val huffval = vals
    locally {
      var code = 0; var k = 0; var len = 1
      while (len <= 16) {
        if (bits(len - 1) > 0) {
          valptr(len) = k
          mincode(len) = code
          code += bits(len - 1); k += bits(len - 1)
          maxcode(len) = code - 1
        }
        code <<= 1; len += 1
      }
    }
    def decode(br: BitReader): Int = {
      var len = 1
      var code = br.bit()
      while (maxcode(len) < 0 || code > maxcode(len)) {
        code = (code << 1) | br.bit()
        len += 1
        require(len <= 16, "jpeg: corrupt huffman code")
      }
      huffval(valptr(len) + code - mincode(len))
    }
  }

  /** DC/AC magnitude category (number of bits to encode v). */
  private def magSize(v: Int): Int = {
    var a = math.abs(v); var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** T.81 F.2.2.1 EXTEND: map a `len`-bit received value to its signed
    * coefficient. */
  private def extend(v: Int, len: Int): Int =
    if (len == 0) 0
    else if (v < (1 << (len - 1))) v - (1 << len) + 1
    else v

  // ---------------------------------------------------------------
  // Encoder
  // ---------------------------------------------------------------

  private def be16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }
  private def marker(out: java.io.ByteArrayOutputStream, m: Int): Unit = {
    out.write(0xff); out.write(m)
  }

  /** Forward 8×8 DCT + uniform quantization of one level-shifted
    * block (row-major `blk`), coefficients out in natural order. */
  private def fdctQuant(blk: Array[Double], q: Int): Array[Int] = {
    val t = new Array[Double](64)
    // rows: t = blk · Aᵀ
    var y = 0
    while (y < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0; var x = 0
        while (x < 8) { s += blk(y * 8 + x) * A(u)(x); x += 1 }
        t(y * 8 + u) = s; u += 1
      }
      y += 1
    }
    val out = new Array[Int](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0; var yy = 0
        while (yy < 8) { s += A(v)(yy) * t(yy * 8 + u); yy += 1 }
        out(v * 8 + u) = StrictMath.round(s / q).toInt
        u += 1
      }
      v += 1
    }
    out
  }

  /** Dequantized coefficients (natural order) → 8×8 samples, rounded
    * and clamped to 0..255 after the +128 level shift. */
  private def idct(coef: Array[Int]): Array[Int] = {
    val t = new Array[Double](64)
    var y = 0
    while (y < 8) { // t = Aᵀ · coef  (sum over v)
      var u = 0
      while (u < 8) {
        var s = 0.0; var v = 0
        while (v < 8) { s += A(v)(y) * coef(v * 8 + u); v += 1 }
        t(y * 8 + u) = s; u += 1
      }
      y += 1
    }
    val out = new Array[Int](64)
    var yy = 0
    while (yy < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0; var u = 0
        while (u < 8) { s += t(yy * 8 + u) * A(u)(x); u += 1 }
        val p = StrictMath.round(s + 128.0).toInt
        out(yy * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        x += 1
      }
      yy += 1
    }
    out
  }

  private def encodeBlock(bw: BitWriter, coef: Array[Int], pred: Int,
                          dc: HuffEnc, ac: HuffEnc): Int = {
    val diff = coef(0) - pred
    val s = magSize(diff)
    bw.put(dc.codeOf(s), dc.sizeOf(s))
    if (s > 0)
      bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
    var run = 0
    var k = 1
    while (k < 64) {
      val v = coef(Zig(k))
      if (v == 0) run += 1
      else {
        while (run > 15) { bw.put(ac.codeOf(0xf0), ac.sizeOf(0xf0)); run -= 16 }
        val sz = magSize(v)
        val rs = (run << 4) | sz
        bw.put(ac.codeOf(rs), ac.sizeOf(rs))
        bw.put(if (v < 0) v + (1 << sz) - 1 else v, sz)
        run = 0
      }
      k += 1
    }
    if (run > 0) bw.put(ac.codeOf(0x00), ac.sizeOf(0x00)) // EOB
    coef(0)
  }

  /** Encode top-down row-major RGB triples as a baseline JPEG:
    * 4:4:4, uniform quantizer `q` (1 = round-trip floor), standard
    * Annex-K Huffman tables, one interleaved scan; `restartInterval`
    * MCUs between RSTn markers when > 0. */
  def encode(w: Int, h: Int, rgb: Array[Int], q: Int = 1,
             restartInterval: Int = 0): Array[Byte] = {
    require(rgb.length == w * h * 3, "jpeg encode: rgb length != w*h*3")
    require(q >= 1 && q <= 255, "jpeg encode: q out of 1..255")
    val out = new java.io.ByteArrayOutputStream
    marker(out, 0xd8) // SOI
    // APP0/JFIF
    marker(out, 0xe0); be16(out, 16)
    out.write(Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    // DQT: table 0 (luma) and 1 (chroma), both uniform q, zigzag order
    var ti = 0
    while (ti < 2) {
      marker(out, 0xdb); be16(out, 67); out.write(ti)
      var i = 0
      while (i < 64) { out.write(q); i += 1 }
      ti += 1
    }
    // SOF0: 8-bit, 3 components, all 1×1 sampling
    marker(out, 0xc0); be16(out, 17)
    out.write(8); be16(out, h); be16(out, w); out.write(3)
    out.write(1); out.write(0x11); out.write(0) // Y  → qtable 0
    out.write(2); out.write(0x11); out.write(1) // Cb → qtable 1
    out.write(3); out.write(0x11); out.write(1) // Cr → qtable 1
    // DHT ×4
    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(out, 0xc4); be16(out, 19 + vals.length)
      out.write((cls << 4) | id)
      bits.foreach(out.write); vals.foreach(out.write)
    }
    dht(0, 0, DcLumBits, DcLumVals); dht(1, 0, AcLumBits, AcLumVals)
    dht(0, 1, DcChrBits, DcChrVals); dht(1, 1, AcChrBits, AcChrVals)
    if (restartInterval > 0) { marker(out, 0xdd); be16(out, 4); be16(out, restartInterval) }
    // SOS
    marker(out, 0xda); be16(out, 12); out.write(3)
    out.write(1); out.write(0x00)
    out.write(2); out.write(0x11)
    out.write(3); out.write(0x11)
    out.write(0); out.write(63); out.write(0) // Ss, Se, AhAl

    val dcLum = new HuffEnc(DcLumBits, DcLumVals)
    val acLum = new HuffEnc(AcLumBits, AcLumVals)
    val dcChr = new HuffEnc(DcChrBits, DcChrVals)
    val acChr = new HuffEnc(AcChrBits, AcChrVals)
    var bw = new BitWriter(out)
    val mcuW = (w + 7) / 8
    val mcuH = (h + 7) / 8
    val preds = new Array[Int](3)
    val blk = new Array[Double](64)
    var mcu = 0
    var rst = 0
    var my = 0
    while (my < mcuH) {
      var mx = 0
      while (mx < mcuW) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush()
          marker(out, 0xd0 + rst) // RSTn
          rst = (rst + 1) & 7
          preds(0) = 0; preds(1) = 0; preds(2) = 0
          bw = new BitWriter(out)
        }
        var comp = 0
        while (comp < 3) {
          var by = 0
          while (by < 8) {
            var bx = 0
            while (bx < 8) {
              // edge-replicated padding outside the image
              val px = math.min(mx * 8 + bx, w - 1)
              val py = math.min(my * 8 + by, h - 1)
              val p = (py * w + px) * 3
              val r = rgb(p); val g = rgb(p + 1); val b = rgb(p + 2)
              val s = comp match {
                case 0 => 0.299 * r + 0.587 * g + 0.114 * b
                case 1 => -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
                case _ => 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
              }
              val si = StrictMath.round(s).toInt
              val sc = if (si < 0) 0 else if (si > 255) 255 else si
              blk(by * 8 + bx) = sc - 128.0
              bx += 1
            }
            by += 1
          }
          val coef = fdctQuant(blk, q)
          preds(comp) = encodeBlock(bw, coef,
            preds(comp),
            if (comp == 0) dcLum else dcChr,
            if (comp == 0) acLum else acChr)
          comp += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(out, 0xd9) // EOI
    out.toByteArray
  }

  /** Encode as 4:2:0 baseline JPEG — the storage layout real crawls
    * use (chroma at quarter resolution): per 16×16 MCU, four Y blocks
    * plus one Cb and one Cr block built from 2×2 box-averaged chroma.
    * Same quantizer/tables as [[encode]]; typically ~2× smaller for
    * the same luma fidelity. */
  def encode420(w: Int, h: Int, rgb: Array[Int], q: Int = 1): Array[Byte] = {
    require(rgb.length == w * h * 3, "jpeg encode420: rgb length != w*h*3")
    require(q >= 1 && q <= 255, "jpeg encode420: q out of 1..255")
    val mcuW = (w + 15) / 16
    val mcuH = (h + 15) / 16
    val pw = mcuW * 16
    val ph = mcuH * 16
    // full-res YCbCr planes, edge-replicated to the padded grid
    val yP = new Array[Int](pw * ph)
    val cbP = new Array[Int](pw * ph)
    val crP = new Array[Int](pw * ph)
    var py = 0
    while (py < ph) {
      var px = 0
      while (px < pw) {
        val sx = math.min(px, w - 1); val sy = math.min(py, h - 1)
        val p = (sy * w + sx) * 3
        val r = rgb(p); val g = rgb(p + 1); val b = rgb(p + 2)
        def cl(d: Double): Int = {
          val v = StrictMath.round(d).toInt
          if (v < 0) 0 else if (v > 255) 255 else v
        }
        yP(py * pw + px) = cl(0.299 * r + 0.587 * g + 0.114 * b)
        cbP(py * pw + px) = cl(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0)
        crP(py * pw + px) = cl(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0)
        px += 1
      }
      py += 1
    }
    // quarter-res chroma via 2×2 box mean (round half up)
    val cw = pw / 2; val ch = ph / 2
    val cbS = new Array[Int](cw * ch)
    val crS = new Array[Int](cw * ch)
    var cy = 0
    while (cy < ch) {
      var cx = 0
      while (cx < cw) {
        val o = 2 * cy * pw + 2 * cx
        cbS(cy * cw + cx) =
          (cbP(o) + cbP(o + 1) + cbP(o + pw) + cbP(o + pw + 1) + 2) / 4
        crS(cy * cw + cx) =
          (crP(o) + crP(o + 1) + crP(o + pw) + crP(o + pw + 1) + 2) / 4
        cx += 1
      }
      cy += 1
    }
    val out = new java.io.ByteArrayOutputStream
    marker(out, 0xd8)
    marker(out, 0xe0); be16(out, 16)
    out.write(Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    var ti = 0
    while (ti < 2) {
      marker(out, 0xdb); be16(out, 67); out.write(ti)
      var i = 0
      while (i < 64) { out.write(q); i += 1 }
      ti += 1
    }
    marker(out, 0xc0); be16(out, 17)
    out.write(8); be16(out, h); be16(out, w); out.write(3)
    out.write(1); out.write(0x22); out.write(0) // Y  2×2 → qtable 0
    out.write(2); out.write(0x11); out.write(1) // Cb 1×1 → qtable 1
    out.write(3); out.write(0x11); out.write(1) // Cr 1×1 → qtable 1
    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(out, 0xc4); be16(out, 19 + vals.length)
      out.write((cls << 4) | id)
      bits.foreach(out.write); vals.foreach(out.write)
    }
    dht(0, 0, DcLumBits, DcLumVals); dht(1, 0, AcLumBits, AcLumVals)
    dht(0, 1, DcChrBits, DcChrVals); dht(1, 1, AcChrBits, AcChrVals)
    marker(out, 0xda); be16(out, 12); out.write(3)
    out.write(1); out.write(0x00)
    out.write(2); out.write(0x11)
    out.write(3); out.write(0x11)
    out.write(0); out.write(63); out.write(0)

    val dcLum = new HuffEnc(DcLumBits, DcLumVals)
    val acLum = new HuffEnc(AcLumBits, AcLumVals)
    val dcChr = new HuffEnc(DcChrBits, DcChrVals)
    val acChr = new HuffEnc(AcChrBits, AcChrVals)
    val bw = new BitWriter(out)
    val blk = new Array[Double](64)
    val preds = new Array[Int](3)
    def block(plane: Array[Int], rowW: Int, x0: Int, y0: Int,
              comp: Int, dc: HuffEnc, ac: HuffEnc): Unit = {
      var by = 0
      while (by < 8) {
        var bx = 0
        while (bx < 8) {
          blk(by * 8 + bx) = plane((y0 + by) * rowW + x0 + bx) - 128.0
          bx += 1
        }
        by += 1
      }
      preds(comp) = encodeBlock(bw, fdctQuant(blk, q), preds(comp), dc, ac)
    }
    var my = 0
    while (my < mcuH) {
      var mx = 0
      while (mx < mcuW) {
        // four Y blocks, raster order (T.81 A.2.3)
        block(yP, pw, mx * 16, my * 16, 0, dcLum, acLum)
        block(yP, pw, mx * 16 + 8, my * 16, 0, dcLum, acLum)
        block(yP, pw, mx * 16, my * 16 + 8, 0, dcLum, acLum)
        block(yP, pw, mx * 16 + 8, my * 16 + 8, 0, dcLum, acLum)
        block(cbS, cw, mx * 8, my * 8, 1, dcChr, acChr)
        block(crS, cw, mx * 8, my * 8, 2, dcChr, acChr)
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(out, 0xd9)
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // Decoder
  // ---------------------------------------------------------------

  /** Decode a baseline JPEG → (w, h, top-down RGB triples). Grayscale
    * streams replicate Y into all three channels. Sampling factors up
    * to 2×2 are supported — 4:4:4, 4:2:2, and the 4:2:0 layout that
    * dominates real crawls — with box (nearest-neighbor) chroma
    * upsampling; cross-decoder pixel agreement on subsampled streams
    * is therefore banded a little wider than 4:4:4 (libjpeg-family
    * decoders default to triangular upsampling). */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    require(bytes.length > 4 && (bytes(0) & 0xff) == 0xff
      && (bytes(1) & 0xff) == 0xd8, "jpeg decode: bad SOI")
    // frame-type dispatch: walk markers up to the SOF and route —
    // baseline/extended-sequential stay on the single-scan decoder,
    // SOF2 takes the progressive path, anything else rejects loudly
    var dp = 2
    def du16(at: Int): Int = ((bytes(at) & 0xff) << 8) | (bytes(at + 1) & 0xff)
    var route = 0 // 0 = undecided, 1 = baseline, 2 = progressive
    while (route == 0) {
      require((bytes(dp) & 0xff) == 0xff, "jpeg decode: lost marker sync")
      val m = bytes(dp + 1) & 0xff
      m match {
        case 0xc0 | 0xc1 => route = 1
        case 0xc2 => route = 2
        case sof if sof >= 0xc3 && sof <= 0xcf
            && sof != 0xc4 && sof != 0xc8 && sof != 0xcc =>
          throw new IllegalArgumentException(
            f"jpeg decode: unsupported frame type 0x$sof%02x")
        case 0xd8 | 0x01 => dp += 2 // SOI / TEM: standalone
        case rst if rst >= 0xd0 && rst <= 0xd7 =>
          throw new IllegalArgumentException(
            f"jpeg decode: standalone RST 0x$rst%02x before SOF")
        case 0xd9 | 0xda =>
          throw new IllegalArgumentException("jpeg decode: missing SOF")
        case _ => dp += 2 + du16(dp + 2)
      }
    }
    if (route == 2) decodeProgressive(bytes) else decodeBaseline(bytes)
  }

  /** Baseline / extended-sequential (SOF0/SOF1) single-scan decode. */
  private def decodeBaseline(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    var pos = 2
    val qtab = Array.ofDim[Int](4, 64) // natural order
    val dcTabs = new Array[HuffDec](4)
    val acTabs = new Array[HuffDec](4)
    var w = -1; var h = -1
    var nComp = 0
    var compId: Array[Int] = null
    var compQ: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var compDc: Array[Int] = null
    var compAc: Array[Int] = null
    var restartInterval = 0
    var scanStart = -1

    def u16(at: Int): Int = ((bytes(at) & 0xff) << 8) | (bytes(at + 1) & 0xff)

    while (scanStart < 0) {
      require((bytes(pos) & 0xff) == 0xff, "jpeg decode: lost marker sync")
      val m = bytes(pos + 1) & 0xff
      pos += 2
      m match {
        case 0xd8 => // stray SOI: ignore
        case 0xdb =>
          val len = u16(pos); var p = pos + 2
          while (p < pos + len) {
            val pq = (bytes(p) & 0xff) >> 4
            val tq = bytes(p) & 0x0f
            require(pq == 0, "jpeg decode: only 8-bit quant tables")
            var i = 0
            while (i < 64) { qtab(tq)(Zig(i)) = bytes(p + 1 + i) & 0xff; i += 1 }
            p += 65
          }
          pos += len
        case 0xc4 =>
          val len = u16(pos); var p = pos + 2
          while (p < pos + len) {
            val cls = (bytes(p) & 0xff) >> 4
            val id = bytes(p) & 0x0f
            val bits = (0 until 16).map(i => bytes(p + 1 + i) & 0xff).toArray
            val nv = bits.sum
            val vals = (0 until nv).map(i => bytes(p + 17 + i) & 0xff).toArray
            if (cls == 0) dcTabs(id) = new HuffDec(bits, vals)
            else acTabs(id) = new HuffDec(bits, vals)
            p += 17 + nv
          }
          pos += len
        case 0xc0 | 0xc1 => // baseline (c1 = extended sequential, same layout)
          val len = u16(pos)
          require((bytes(pos + 2) & 0xff) == 8, "jpeg decode: only 8-bit precision")
          h = u16(pos + 3); w = u16(pos + 5)
          nComp = bytes(pos + 7) & 0xff
          compId = new Array[Int](nComp); compQ = new Array[Int](nComp)
          compH = new Array[Int](nComp); compV = new Array[Int](nComp)
          var c = 0
          while (c < nComp) {
            compId(c) = bytes(pos + 8 + 3 * c) & 0xff
            val hv = bytes(pos + 9 + 3 * c) & 0xff
            compH(c) = (hv >> 4) & 0x0f
            compV(c) = hv & 0x0f
            require(compH(c) >= 1 && compH(c) <= 2
              && compV(c) >= 1 && compV(c) <= 2,
              f"jpeg decode: sampling factor 0x$hv%02x out of the 1..2 range")
            compQ(c) = bytes(pos + 10 + 3 * c) & 0xff
            c += 1
          }
          pos += len
        case 0xc2 => // unreachable: decode() routes SOF2 to the
          // progressive path before this walker runs
          throw new IllegalArgumentException("jpeg decode: unexpected SOF2")
        case 0xdd =>
          restartInterval = u16(pos + 2); pos += u16(pos)
        case 0xda =>
          val len = u16(pos)
          val ns = bytes(pos + 2) & 0xff
          require(ns == nComp, "jpeg decode: partial scans not supported")
          compDc = new Array[Int](nComp); compAc = new Array[Int](nComp)
          var c = 0
          while (c < ns) {
            val cid = bytes(pos + 3 + 2 * c) & 0xff
            val idx = compId.indexOf(cid)
            require(idx >= 0, s"jpeg decode: scan component $cid not in frame")
            compDc(idx) = (bytes(pos + 4 + 2 * c) & 0xff) >> 4
            compAc(idx) = bytes(pos + 4 + 2 * c) & 0x0f
            c += 1
          }
          scanStart = pos + len
        case 0xd9 =>
          throw new IllegalArgumentException("jpeg decode: EOI before SOS")
        case 0x01 => // TEM: standalone (no length segment), legal; skip
        case rst if rst >= 0xd0 && rst <= 0xd7 =>
          // RSTn is standalone too — falling through to the length
          // branch would read two garbage 'length' bytes and turn a
          // malformed stream into a confusing downstream error; a
          // restart marker before any SOS is malformed, say so loudly
          throw new IllegalArgumentException(
            f"jpeg decode: standalone RST 0x$rst%02x before SOS")
        case _ => // APPn, COM, anything else with a length: skip
          pos += u16(pos)
      }
    }
    require(w > 0 && h > 0, "jpeg decode: missing SOF")
    require(nComp == 1 || nComp == 3, s"jpeg decode: $nComp components")

    val hmax = compH.max
    val vmax = compV.max
    val br = new BitReader(bytes, scanStart)
    val mcuW = (w + 8 * hmax - 1) / (8 * hmax)
    val mcuH = (h + 8 * vmax - 1) / (8 * vmax)
    val preds = new Array[Int](nComp)
    val coef = new Array[Int](64)
    // per-component planes at the component's OWN resolution,
    // block-padded to the MCU grid
    val planeW = Array.tabulate(nComp)(c => mcuW * 8 * compH(c))
    val planes = Array.tabulate(nComp)(c =>
      new Array[Int](planeW(c) * mcuH * 8 * compV(c)))
    var mcu = 0
    var rstExpect = 0
    var my = 0
    while (my < mcuH) {
      var mx = 0
      while (mx < mcuW) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.align()
          require((bytes(br.pos) & 0xff) == 0xff
            && (bytes(br.pos + 1) & 0xff) == 0xd0 + rstExpect,
            s"jpeg decode: expected RST$rstExpect at ${br.pos}")
          br.pos += 2
          rstExpect = (rstExpect + 1) & 7
          java.util.Arrays.fill(preds, 0)
        }
        var c = 0
        while (c < nComp) {
          // h×v blocks per MCU, raster order within the MCU (T.81 A.2.3)
          var j = 0
          while (j < compV(c)) {
            var i = 0
            while (i < compH(c)) {
              java.util.Arrays.fill(coef, 0)
              val qt = qtab(compQ(c))
              val t = dcTabs(compDc(c)).decode(br)
              preds(c) += extend(br.receive(t), t)
              coef(0) = preds(c) * qt(0)
              var k = 1
              var eob = false
              while (k < 64 && !eob) {
                val rs = acTabs(compAc(c)).decode(br)
                val run = rs >> 4
                val sz = rs & 0x0f
                if (sz == 0) {
                  if (run == 15) k += 16 // ZRL
                  else eob = true
                } else {
                  k += run
                  require(k < 64, "jpeg decode: AC run past block end")
                  coef(Zig(k)) = extend(br.receive(sz), sz) * qt(Zig(k))
                  k += 1
                }
              }
              val px = idct(coef)
              val x0 = (mx * compH(c) + i) * 8
              val y0 = (my * compV(c) + j) * 8
              var by = 0
              while (by < 8) {
                var bx = 0
                while (bx < 8) {
                  planes(c)((y0 + by) * planeW(c) + x0 + bx) = px(by * 8 + bx)
                  bx += 1
                }
                by += 1
              }
              i += 1
            }
            j += 1
          }
          c += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }

    planesToRgb(w, h, nComp, compH, compV, hmax, vmax, planeW, planes)
  }

  /** Shared output tail of both decode paths: nearest-neighbor chroma
    * upsample from per-component planes + YCbCr→RGB (or grayscale
    * replication). */
  private def planesToRgb(w: Int, h: Int, nComp: Int, compH: Array[Int],
      compV: Array[Int], hmax: Int, vmax: Int, planeW: Array[Int],
      planes: Array[Array[Int]]): (Int, Int, Array[Int]) = {
    val rgb = new Array[Int](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        def sample(c: Int): Int =
          planes(c)((y * compV(c) / vmax) * planeW(c) + x * compH(c) / hmax)
        if (nComp == 1) {
          val g = sample(0)
          rgb(o) = g; rgb(o + 1) = g; rgb(o + 2) = g
        } else {
          val yy = sample(0)
          val cb = sample(1) - 128
          val cr = sample(2) - 128
          def clamp(d: Double): Int = {
            val v = StrictMath.round(d).toInt
            if (v < 0) 0 else if (v > 255) 255 else v
          }
          rgb(o) = clamp(yy + 1.402 * cr)
          rgb(o + 1) = clamp(yy - 0.344136 * cb - 0.714136 * cr)
          rgb(o + 2) = clamp(yy + 1.772 * cb)
        }
        x += 1
      }
      y += 1
    }
    (w, h, rgb)
  }

  // ---------------------------------------------------------------
  // Progressive decoder (SOF2)
  // ---------------------------------------------------------------

  /** Find the next marker position at or after `from`, skipping
    * entropy-coded data: stuffed 0xFF00 bytes and RST markers are part
    * of the scan; anything else 0xFFxx is the next segment. */
  private def skipEntropy(bytes: Array[Byte], from: Int): Int = {
    var p = from
    var done = false
    while (!done) {
      if ((bytes(p) & 0xff) == 0xff) {
        val m = bytes(p + 1) & 0xff
        if (m == 0x00 || (m >= 0xd0 && m <= 0xd7)) p += 2 else done = true
      } else p += 1
    }
    p
  }

  /** Progressive (SOF2) decode: spectral selection + successive
    * approximation per ITU-T T.81 Annex G (G.1.2 coding models,
    * G.2 decoder control). Coefficients accumulate RAW (unquantized,
    * scaled by the scan's point transform) across scans into
    * per-component block grids padded to the interleaved MCU
    * geometry; dequantization + IDCT + upsample run once at EOI.
    * DC scans may be interleaved (MCU order) or single-component;
    * AC scans are single-component over the component's own block
    * raster (T.81 G.1.1.1.1). The AC refinement correction-bit model
    * follows G.1.2.3 (the same algebra libjpeg's
    * decode_mcu_AC_refine implements): a zero-history coefficient
    * can newly appear with magnitude ±1<<Al, every nonzero-history
    * coefficient crossed on the way consumes one correction bit, and
    * EOB runs still pay correction bits over the rest of the band.
    * Restart markers reset DC predictors AND the EOB run. */
  private def decodeProgressive(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    var pos = 2
    val qtab = Array.ofDim[Int](4, 64) // natural order
    val dcTabs = new Array[HuffDec](4)
    val acTabs = new Array[HuffDec](4)
    var w = -1; var h = -1
    var nComp = 0
    var compId: Array[Int] = null
    var compQ: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var restartInterval = 0
    var hmax = 0; var vmax = 0; var mcuW = 0; var mcuH = 0
    var coefs: Array[Array[Int]] = null // raw coefficients, natural order
    var bWpad: Array[Int] = null; var bHpad: Array[Int] = null
    var bW: Array[Int] = null; var bH: Array[Int] = null
    var seenScan = false

    def u16(at: Int): Int = ((bytes(at) & 0xff) << 8) | (bytes(at + 1) & 0xff)

    def doScan(ns: Int, sc: Array[Int], sdc: Array[Int], sac: Array[Int],
               ss: Int, se: Int, ah: Int, al: Int, br: BitReader): Unit = {
      var eobrun = 0
      val preds = new Array[Int](nComp)
      var rstExpect = 0
      var units = 0
      def restartCheck(): Unit =
        if (restartInterval > 0 && units > 0 && units % restartInterval == 0) {
          br.align()
          require((bytes(br.pos) & 0xff) == 0xff
            && (bytes(br.pos + 1) & 0xff) == 0xd0 + rstExpect,
            s"jpeg decode: expected RST$rstExpect at ${br.pos}")
          br.pos += 2
          rstExpect = (rstExpect + 1) & 7
          java.util.Arrays.fill(preds, 0)
          eobrun = 0
        }
      def dcUnit(c: Int, ci: Int, bx: Int, by: Int): Unit = {
        val base = (by * bWpad(c) + bx) * 64
        if (ah == 0) {
          val dc = dcTabs(sdc(ci))
          require(dc != null, "jpeg decode: missing DC table")
          val t = dc.decode(br)
          preds(c) += extend(br.receive(t), t)
          coefs(c)(base) = preds(c) << al
        } else if (br.bit() == 1) coefs(c)(base) |= (1 << al)
      }
      def acFirst(arr: Array[Int], base: Int, ac: HuffDec): Unit = {
        if (eobrun > 0) eobrun -= 1
        else {
          var k = ss
          var done = false
          while (k <= se && !done) {
            val rs = ac.decode(br)
            val r = rs >> 4; val s = rs & 0x0f
            if (s == 0) {
              if (r == 15) k += 16 // ZRL
              else {
                eobrun = (1 << r) - 1
                if (r > 0) eobrun += br.receive(r)
                done = true
              }
            } else {
              k += r
              require(k <= se, "jpeg decode: AC run past band end")
              arr(base + Zig(k)) = extend(br.receive(s), s) << al
              k += 1
            }
          }
        }
      }
      def acRefine(arr: Array[Int], base: Int, ac: HuffDec): Unit = {
        val p1 = 1 << al; val m1 = -1 << al
        def correct(zi: Int): Unit =
          if (br.bit() == 1 && (arr(zi) & p1) == 0)
            arr(zi) += (if (arr(zi) >= 0) p1 else m1)
        var k = ss
        if (eobrun == 0) {
          var done = false
          while (k <= se && !done) {
            val rs = ac.decode(br)
            var r = rs >> 4; val s = rs & 0x0f
            var newval = 0
            if (s == 0) {
              if (r != 15) {
                eobrun = 1 << r
                if (r > 0) eobrun += br.receive(r)
                done = true
              } // r == 15: ZRL, skip 16 zero-history coefficients below
            } else {
              require(s == 1, "jpeg decode: refinement magnitude != 1")
              newval = if (br.bit() == 1) p1 else m1
            }
            if (!done) {
              var placed = false
              while (k <= se && !placed) {
                val zi = base + Zig(k)
                if (arr(zi) != 0) correct(zi)
                else if (r == 0) placed = true
                else r -= 1
                if (!placed) k += 1
              }
              if (newval != 0) {
                require(k <= se, "jpeg decode: refinement placement past band")
                arr(base + Zig(k)) = newval
              }
              k += 1
            }
          }
        }
        if (eobrun > 0) {
          while (k <= se) {
            val zi = base + Zig(k)
            if (arr(zi) != 0) correct(zi)
            k += 1
          }
          eobrun -= 1
        }
      }

      if (ss == 0) {
        require(se == 0, "jpeg decode: DC scan with Se != 0")
        if (ns > 1) { // interleaved DC scan, MCU order
          var my = 0
          while (my < mcuH) {
            var mx = 0
            while (mx < mcuW) {
              restartCheck()
              var ci = 0
              while (ci < ns) {
                val c = sc(ci)
                var j = 0
                while (j < compV(c)) {
                  var i = 0
                  while (i < compH(c)) {
                    dcUnit(c, ci, mx * compH(c) + i, my * compV(c) + j)
                    i += 1
                  }
                  j += 1
                }
                ci += 1
              }
              units += 1
              mx += 1
            }
            my += 1
          }
        } else { // single-component DC scan: the component's own raster
          val c = sc(0)
          var by = 0
          while (by < bH(c)) {
            var bx = 0
            while (bx < bW(c)) {
              restartCheck()
              dcUnit(c, 0, bx, by)
              units += 1
              bx += 1
            }
            by += 1
          }
        }
      } else {
        require(ns == 1, "jpeg decode: interleaved AC scan")
        require(se >= ss && se < 64, "jpeg decode: bad spectral band")
        val c = sc(0)
        val arr = coefs(c)
        val ac = acTabs(sac(0))
        require(ac != null, "jpeg decode: missing AC table")
        var by = 0
        while (by < bH(c)) {
          var bx = 0
          while (bx < bW(c)) {
            restartCheck()
            val base = (by * bWpad(c) + bx) * 64
            if (ah == 0) acFirst(arr, base, ac) else acRefine(arr, base, ac)
            units += 1
            bx += 1
          }
          by += 1
        }
      }
    }

    var eoi = false
    while (!eoi) {
      require((bytes(pos) & 0xff) == 0xff, "jpeg decode: lost marker sync")
      val m = bytes(pos + 1) & 0xff
      pos += 2
      m match {
        case 0xd8 => // stray SOI: ignore
        case 0xdb =>
          val len = u16(pos); var p = pos + 2
          while (p < pos + len) {
            val pq = (bytes(p) & 0xff) >> 4
            val tq = bytes(p) & 0x0f
            require(pq == 0, "jpeg decode: only 8-bit quant tables")
            var i = 0
            while (i < 64) { qtab(tq)(Zig(i)) = bytes(p + 1 + i) & 0xff; i += 1 }
            p += 65
          }
          pos += len
        case 0xc4 =>
          val len = u16(pos); var p = pos + 2
          while (p < pos + len) {
            val cls = (bytes(p) & 0xff) >> 4
            val id = bytes(p) & 0x0f
            val bits = (0 until 16).map(i => bytes(p + 1 + i) & 0xff).toArray
            val nv = bits.sum
            val vals = (0 until nv).map(i => bytes(p + 17 + i) & 0xff).toArray
            if (cls == 0) dcTabs(id) = new HuffDec(bits, vals)
            else acTabs(id) = new HuffDec(bits, vals)
            p += 17 + nv
          }
          pos += len
        case 0xc2 =>
          val len = u16(pos)
          require((bytes(pos + 2) & 0xff) == 8, "jpeg decode: only 8-bit precision")
          h = u16(pos + 3); w = u16(pos + 5)
          nComp = bytes(pos + 7) & 0xff
          require(nComp == 1 || nComp == 3, s"jpeg decode: $nComp components")
          compId = new Array[Int](nComp); compQ = new Array[Int](nComp)
          compH = new Array[Int](nComp); compV = new Array[Int](nComp)
          var c = 0
          while (c < nComp) {
            compId(c) = bytes(pos + 8 + 3 * c) & 0xff
            val hv = bytes(pos + 9 + 3 * c) & 0xff
            compH(c) = (hv >> 4) & 0x0f
            compV(c) = hv & 0x0f
            require(compH(c) >= 1 && compH(c) <= 2
              && compV(c) >= 1 && compV(c) <= 2,
              f"jpeg decode: sampling factor 0x$hv%02x out of the 1..2 range")
            compQ(c) = bytes(pos + 10 + 3 * c) & 0xff
            c += 1
          }
          hmax = compH.max; vmax = compV.max
          mcuW = (w + 8 * hmax - 1) / (8 * hmax)
          mcuH = (h + 8 * vmax - 1) / (8 * vmax)
          bWpad = Array.tabulate(nComp)(c => mcuW * compH(c))
          bHpad = Array.tabulate(nComp)(c => mcuH * compV(c))
          bW = Array.tabulate(nComp)(c =>
            (((w * compH(c) + hmax - 1) / hmax) + 7) / 8)
          bH = Array.tabulate(nComp)(c =>
            (((h * compV(c) + vmax - 1) / vmax) + 7) / 8)
          coefs = Array.tabulate(nComp)(c =>
            new Array[Int](bWpad(c) * bHpad(c) * 64))
          pos += len
        case 0xc0 | 0xc1 =>
          throw new IllegalArgumentException("jpeg decode: mixed frame types")
        case 0xdd =>
          restartInterval = u16(pos + 2); pos += u16(pos)
        case 0xda =>
          require(coefs != null, "jpeg decode: SOS before SOF2")
          val len = u16(pos)
          val ns = bytes(pos + 2) & 0xff
          val sc = new Array[Int](ns)
          val sdc = new Array[Int](ns)
          val sac = new Array[Int](ns)
          var i = 0
          while (i < ns) {
            val cid = bytes(pos + 3 + 2 * i) & 0xff
            val idx = compId.indexOf(cid)
            require(idx >= 0, s"jpeg decode: scan component $cid not in frame")
            sc(i) = idx
            sdc(i) = (bytes(pos + 4 + 2 * i) & 0xff) >> 4
            sac(i) = bytes(pos + 4 + 2 * i) & 0x0f
            i += 1
          }
          val ss = bytes(pos + 3 + 2 * ns) & 0xff
          val se = bytes(pos + 4 + 2 * ns) & 0xff
          val ahal = bytes(pos + 5 + 2 * ns) & 0xff
          val br = new BitReader(bytes, pos + len)
          doScan(ns, sc, sdc, sac, ss, se, ahal >> 4, ahal & 0x0f, br)
          seenScan = true
          pos = skipEntropy(bytes, br.pos)
        case 0xd9 => eoi = true
        case 0x01 => // TEM: standalone, skip
        case rst if rst >= 0xd0 && rst <= 0xd7 =>
          throw new IllegalArgumentException(
            f"jpeg decode: standalone RST 0x$rst%02x outside a scan")
        case _ => pos += u16(pos)
      }
    }
    require(w > 0 && h > 0 && seenScan, "jpeg decode: no scan data")

    // dequantize + IDCT every padded block into component planes
    val planeW = Array.tabulate(nComp)(c => bWpad(c) * 8)
    val planes = Array.tabulate(nComp)(c =>
      new Array[Int](planeW(c) * bHpad(c) * 8))
    val deq = new Array[Int](64)
    var c = 0
    while (c < nComp) {
      val qt = qtab(compQ(c))
      val arr = coefs(c)
      var by = 0
      while (by < bHpad(c)) {
        var bx = 0
        while (bx < bWpad(c)) {
          val base = (by * bWpad(c) + bx) * 64
          var k = 0
          while (k < 64) { deq(k) = arr(base + k) * qt(k); k += 1 }
          val px = idct(deq)
          val x0 = bx * 8; val y0 = by * 8
          var r = 0
          while (r < 8) {
            var cl = 0
            while (cl < 8) {
              planes(c)((y0 + r) * planeW(c) + x0 + cl) = px(r * 8 + cl)
              cl += 1
            }
            r += 1
          }
          bx += 1
        }
        by += 1
      }
      c += 1
    }
    planesToRgb(w, h, nComp, compH, compV, hmax, vmax, planeW, planes)
  }
}
