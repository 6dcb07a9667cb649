package graft.ops

/** GIF89a (LZW) — pure JVM, no imaging libraries; written from the
  * public specification (https://www.w3.org/Graphics/GIF/spec-gif89a.txt)
  * like the rest of the codec family and golden-tested BOTH directions
  * against javax.imageio. The second COMPRESSED image leg after PNG,
  * and a different compression family (LZW with variable-width
  * LSB-first codes vs deflate): lossless for ≤256-color images, so —
  * unlike JPEG — the round trip is bit-exact and `q_gif_features`
  * gets a fully exact analytic oracle.
  *
  * Encoder: global color table built from the image's distinct colors
  * (>256 is a loud error — palettization is a modeling choice, not
  * something a codec should silently do), one image block, LZW with
  * the standard CLEAR/EOI protocol and dictionary reset at 4096.
  * Decoder: single-image GIF87a/89a, extensions skipped, interlaced
  * row order handled, local color table honored. */
object Gif {

  private val Header = "GIF89a".getBytes("US-ASCII")

  /** LSB-first bit writer packing into ≤255-byte sub-blocks. */
  private final class SubBlockWriter(out: java.io.ByteArrayOutputStream) {
    private val buf = new Array[Byte](255)
    private var n = 0
    private var acc = 0
    private var bits = 0
    private def flushByte(): Unit = {
      buf(n) = (acc & 0xff).toByte; n += 1; acc >>>= 8; bits -= 8
      if (n == 255) { out.write(255); out.write(buf, 0, 255); n = 0 }
    }
    def put(code: Int, width: Int): Unit = {
      acc |= code << bits
      bits += width
      while (bits >= 8) flushByte()
    }
    def finish(): Unit = {
      if (bits > 0) flushByte()
      if (n > 0) { out.write(n); out.write(buf, 0, n) }
      out.write(0) // block terminator
    }
  }

  /** Encode top-down row-major RGB triples as a GIF89a with a global
    * color table; requires ≤256 distinct colors. */
  def encode(w: Int, h: Int, rgb: Array[Int]): Array[Byte] = {
    require(rgb.length == w * h * 3, "gif encode: rgb length != w*h*3")
    require(rgb.forall(v => v >= 0 && v <= 255),
      "gif encode: channel value outside 0..255")
    // palette in first-appearance order (deterministic)
    val paletteIdx = new java.util.LinkedHashMap[Int, Int]()
    val pixels = new Array[Int](w * h)
    var i = 0
    while (i < w * h) {
      val c = (rgb(3 * i) << 16) | (rgb(3 * i + 1) << 8) | rgb(3 * i + 2)
      var idx = paletteIdx.getOrDefault(c, -1)
      if (idx < 0) {
        idx = paletteIdx.size()
        require(idx < 256, "gif encode: more than 256 distinct colors")
        paletteIdx.put(c, idx)
      }
      pixels(i) = idx
      i += 1
    }
    val nColors = paletteIdx.size()
    // color-table size: power of two ≥ max(2, nColors)
    var ctBits = 1
    while ((1 << ctBits) < nColors) ctBits += 1
    val ctSize = 1 << ctBits
    val out = new java.io.ByteArrayOutputStream
    out.write(Header)
    // logical screen descriptor: dims, global table flag + size
    out.write(w & 0xff); out.write(w >>> 8)
    out.write(h & 0xff); out.write(h >>> 8)
    out.write(0x80 | ((ctBits - 1) << 4) | (ctBits - 1))
    out.write(0) // background color index
    out.write(0) // pixel aspect ratio
    val colors = new Array[Int](ctSize)
    paletteIdx.forEach((c, idx) => colors(idx) = c)
    var ci = 0
    while (ci < ctSize) {
      out.write((colors(ci) >>> 16) & 0xff)
      out.write((colors(ci) >>> 8) & 0xff)
      out.write(colors(ci) & 0xff)
      ci += 1
    }
    // image descriptor (no local table, no interlace)
    out.write(0x2c)
    out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(w & 0xff); out.write(w >>> 8)
    out.write(h & 0xff); out.write(h >>> 8)
    out.write(0)
    // LZW
    val minCode = math.max(2, ctBits)
    out.write(minCode)
    val clear = 1 << minCode
    val eoi = clear + 1
    val bw = new SubBlockWriter(out)
    // dictionary: string -> code, keyed as (prefixCode << 8 | nextByte)
    var dict = new java.util.HashMap[Int, Int]()
    var nextCode = eoi + 1
    var width = minCode + 1
    bw.put(clear, width)
    var prev = -1
    i = 0
    while (i < pixels.length) {
      val k = pixels(i)
      if (prev < 0) prev = k
      else {
        val key = (prev << 8) | k
        val hit = dict.getOrDefault(key, -1)
        if (hit >= 0) prev = hit
        else {
          bw.put(prev, width)
          // Width bump BEFORE this emission's own add: the decoder
          // only learns entry #n after reading code #n, so it is one
          // dictionary add behind the encoder at all times — checking
          // pre-add keeps both sides switching widths on the same
          // code index (the classic GIF-LZW sync point).
          if (nextCode == (1 << width) && width < 12) width += 1
          if (nextCode < 4096) {
            dict.put(key, nextCode)
            nextCode += 1
          } else {
            bw.put(clear, width)
            dict = new java.util.HashMap[Int, Int]()
            nextCode = eoi + 1
            width = minCode + 1
          }
          prev = k
        }
      }
      i += 1
    }
    if (prev >= 0) {
      bw.put(prev, width)
      // the decoder adds an entry after the final data code too —
      // mirror its possible width switch before emitting EOI
      if (nextCode == (1 << width) && width < 12) width += 1
    }
    bw.put(eoi, width)
    bw.finish()
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Decode a single-image GIF → (w, h, top-down RGB triples). */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    require(bytes.length > 13 && bytes(0) == 'G' && bytes(1) == 'I'
      && bytes(2) == 'F' && bytes(3) == '8'
      && (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a',
      "gif decode: bad signature")
    def u16(at: Int): Int = (bytes(at) & 0xff) | ((bytes(at + 1) & 0xff) << 8)
    var pos = 6
    val sw = u16(pos); val sh = u16(pos + 2)
    val packed = bytes(pos + 4) & 0xff
    pos += 7
    var globalCt: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val n = 1 << ((packed & 7) + 1)
      globalCt = Array.tabulate(n)(j =>
        ((bytes(pos + 3 * j) & 0xff) << 16) |
          ((bytes(pos + 3 * j + 1) & 0xff) << 8) |
          (bytes(pos + 3 * j + 2) & 0xff))
      pos += 3 * n
    }
    // walk blocks to the first image descriptor
    while ((bytes(pos) & 0xff) == 0x21) { // extension: skip sub-blocks
      pos += 2
      while ((bytes(pos) & 0xff) != 0) pos += 1 + (bytes(pos) & 0xff)
      pos += 1
    }
    require((bytes(pos) & 0xff) == 0x2c, "gif decode: no image descriptor")
    val ix = u16(pos + 1); val iy = u16(pos + 3)
    val iw = u16(pos + 5); val ih = u16(pos + 7)
    val ipacked = bytes(pos + 9) & 0xff
    val interlaced = (ipacked & 0x40) != 0
    require(ix == 0 && iy == 0 && iw == sw && ih == sh,
      "gif decode: sub-rectangle images not supported")
    pos += 10
    var ct = globalCt
    if ((ipacked & 0x80) != 0) {
      val n = 1 << ((ipacked & 7) + 1)
      ct = Array.tabulate(n)(j =>
        ((bytes(pos + 3 * j) & 0xff) << 16) |
          ((bytes(pos + 3 * j + 1) & 0xff) << 8) |
          (bytes(pos + 3 * j + 2) & 0xff))
      pos += 3 * n
    }
    require(ct != null, "gif decode: no color table")
    val minCode = bytes(pos) & 0xff
    pos += 1
    // concatenate sub-blocks
    val data = new java.io.ByteArrayOutputStream
    while ((bytes(pos) & 0xff) != 0) {
      val n = bytes(pos) & 0xff
      data.write(bytes, pos + 1, n)
      pos += 1 + n
    }
    val lz = data.toByteArray
    // LZW decode, LSB-first
    val clear = 1 << minCode
    val eoi = clear + 1
    val pixels = new Array[Int](iw * ih)
    var np = 0
    // dictionary of (prefix code, suffix byte); roots are implicit
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    var nextCode = eoi + 1
    var width = minCode + 1
    var acc = 0L
    var bits = 0
    var bp = 0
    var prevCode = -1
    val stack = new Array[Int](4096)
    def emit(code0: Int): Int = { // push the string for code, emit, return first byte
      var sp = 0
      var code = code0
      while (code >= clear + 2) { stack(sp) = suffix(code); sp += 1; code = prefix(code) }
      val first = code
      pixels(np) = code; np += 1
      while (sp > 0) { sp -= 1; pixels(np) = stack(sp); np += 1 }
      first
    }
    var done = false
    while (!done) {
      while (bits < width && bp < lz.length) {
        acc |= (lz(bp) & 0xffL) << bits; bits += 8; bp += 1
      }
      require(bits >= width, "gif decode: truncated LZW stream")
      val code = (acc & ((1L << width) - 1)).toInt
      acc >>>= width; bits -= width
      if (code == clear) {
        nextCode = eoi + 1; width = minCode + 1; prevCode = -1
      } else if (code == eoi) done = true
      else if (prevCode < 0) {
        require(code < clear, "gif decode: first code not a root")
        pixels(np) = code; np += 1
        prevCode = code
      } else {
        val first =
          if (code < nextCode) emit(code)
          else { // KwKwK case: code == nextCode
            require(code == nextCode, "gif decode: code out of range")
            var sp = 0
            var c = prevCode
            while (c >= clear + 2) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
            val f = c
            pixels(np) = c; np += 1
            while (sp > 0) { sp -= 1; pixels(np) = stack(sp); np += 1 }
            pixels(np) = f; np += 1
            f
          }
        if (nextCode < 4096) {
          prefix(nextCode) = prevCode; suffix(nextCode) = first
          nextCode += 1
          if (nextCode == (1 << width) && width < 12) width += 1
        }
        prevCode = code
      }
      if (np >= pixels.length && !done) {
        // image complete; a trailing EOI may follow — stop either way
        done = true
      }
    }
    require(np == pixels.length,
      s"gif decode: short pixel stream ($np of ${pixels.length})")
    // interlaced streams deliver rows in the 8/8, 4/8, 2/4, 1/2 pass
    // order — map stream row → display row
    val rowOf: Int => Int =
      if (!interlaced) identity
      else {
        val order = (0 until ih by 8) ++ (4 until ih by 8) ++
          (2 until ih by 4) ++ (1 until ih by 2)
        order.toArray.apply _
      }
    val rgb = new Array[Int](iw * ih * 3)
    var j = 0
    while (j < pixels.length) {
      val c = ct(pixels(j))
      val row = rowOf(j / iw)
      val o = (row * iw + j % iw) * 3
      rgb(o) = (c >>> 16) & 0xff
      rgb(o + 1) = (c >>> 8) & 0xff
      rgb(o + 2) = c & 0xff
      j += 1
    }
    (iw, ih, rgb)
  }
}
