package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column operators for training-data pipelines: media
  * payloads travel as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extract / frame-sample run as
  * partition-wise batch transforms (one codec init per partition,
  * rows streamed through it — the Scala shape of a `mapInPandas`
  * batch UDF).
  *
  * The codecs are REAL pure-JVM implementations of the three
  * container formats simple enough to need no native library —
  * WAV (RIFF PCM 16-bit), BMP (24-bit uncompressed) and PPM (P6) —
  * written from the public format specs. Compressed formats
  * (JPEG/MP3/H.264) would slot in behind the same
  * [[decodeFeatures]] dispatch with a real codec dependency; the
  * Spark-side plumbing (binary schema, per-partition init, feature
  * shape) is identical. Byte-level conformance is pinned by golden
  * tests (MultimodalSpec); end-to-end decode correctness is
  * oracle-gated by q_media_features / q_image_features /
  * q_media_neardup, whose DuckDB twins recompute the expected
  * sample/pixel statistics analytically without ever touching the
  * bytes.
  */
object Multimodal {

  /** Canonical media-row schema: id + opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType))))))

  // ------------------------------------------------------------------
  // WAV (RIFF PCM) — http://soundfile.sapp.org/doc/WaveFormat/
  // ------------------------------------------------------------------

  private def le16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def le32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte; b(off + 3) = ((v >> 24) & 0xff).toByte
  }
  private def rd16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def rd32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Encode mono 16-bit PCM samples into a canonical WAV container. */
  def encodeWavPcm16(samples: Array[Int], sampleRate: Int): Array[Byte] = {
    val dataSize = samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    "RIFF".getBytes.copyToArray(out, 0)
    le32(out, 4, 36 + dataSize)
    "WAVE".getBytes.copyToArray(out, 8)
    "fmt ".getBytes.copyToArray(out, 12)
    le32(out, 16, 16)            // fmt chunk size
    le16(out, 20, 1)             // PCM
    le16(out, 22, 1)             // mono
    le32(out, 24, sampleRate)
    le32(out, 28, sampleRate * 2) // byte rate
    le16(out, 32, 2)             // block align
    le16(out, 34, 16)            // bits/sample
    "data".getBytes.copyToArray(out, 36)
    le32(out, 40, dataSize)
    var i = 0
    while (i < samples.length) { le16(out, 44 + i * 2, samples(i) & 0xffff); i += 1 }
    out
  }

  // ------------------------------------------------------------------
  // G.711 µ-law companding (ITU-T G.711, the WAV format-7 payload) —
  // the codec family's compressed-AUDIO leg. Unlike JPEG, the lossy
  // transform here is EXACT integer math per sample, so a DuckDB
  // oracle can replay encode∘decode bit-for-bit (`q_ulaw_features`);
  // UlawSpec sweeps all 65536 inputs against an independent spelling
  // of the same formulas and golden-tests against javax.sound.
  // ------------------------------------------------------------------

  /** Compress one 16-bit sample to the 8-bit µ-law code: clip to
    * ±32635, add the 0x84 bias, segment = MSB position, 4-bit
    * mantissa, all bits complemented on the wire. */
  def ulawEncode(sample: Int): Int = {
    val sign = if (sample < 0) 0x80 else 0
    // abs via Long: -(-32768) overflows Int
    val mag0 = math.min(math.abs(sample.toLong), 32635L).toInt
    val mag = mag0 + 0x84
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (mag & mask) == 0) { exp -= 1; mask >>= 1 }
    val mant = (mag >> (exp + 3)) & 0x0f
    (~(sign | (exp << 4) | mant)) & 0xff
  }

  /** Expand one µ-law code back to its quantized 16-bit sample —
    * exact inverse of the segment/mantissa packing. */
  def ulawDecode(code: Int): Int = {
    val u = (~code) & 0xff
    val exp = (u >> 4) & 7
    val mant = u & 0x0f
    val mag = (((mant << 3) + 0x84) << exp) - 0x84
    if ((u & 0x80) != 0) -mag else mag
  }

  /** Encode samples as a µ-law WAV (format 7, 8 bits/sample; fmt
    * chunk carries the cbSize=0 extension as the spec requires for
    * non-PCM). */
  def encodeWavUlaw(samples: Array[Int], sampleRate: Int): Array[Byte] = {
    val dataSize = samples.length
    val out = new Array[Byte](46 + dataSize + (dataSize & 1))
    "RIFF".getBytes.copyToArray(out, 0)
    le32(out, 4, out.length - 8)
    "WAVE".getBytes.copyToArray(out, 8)
    "fmt ".getBytes.copyToArray(out, 12)
    le32(out, 16, 18)            // fmt chunk size (non-PCM: +cbSize)
    le16(out, 20, 7)             // WAVE_FORMAT_MULAW
    le16(out, 22, 1)             // mono
    le32(out, 24, sampleRate)
    le32(out, 28, sampleRate)    // byte rate (1 byte/sample)
    le16(out, 32, 1)             // block align
    le16(out, 34, 8)             // bits/sample
    le16(out, 36, 0)             // cbSize
    "data".getBytes.copyToArray(out, 38)
    le32(out, 42, dataSize)
    var i = 0
    while (i < samples.length) {
      out(46 + i) = ulawEncode(samples(i)).toByte; i += 1
    }
    out
  }

  // ------------------------------------------------------------------
  // IMA/DVI ADPCM (WAV format 0x11) — the codec family's first
  // PREDICTIVE audio format: each 4-bit nibble encodes the delta from
  // an adaptive predictor, so decode is a stateful fold, not a
  // per-sample map like µ-law. Tables and update rules are the
  // standard IMA ones (IMA Digital Audio Focus/Technical Working
  // Group recommendation, as carried by the Microsoft WAV DVI/IMA
  // registration). Everything is exact integer math, so a DuckDB
  // recursive CTE can replay the whole encode∘decode fold bit-for-bit
  // (`q_adpcm_features`); AdpcmSpec pins encoder-reconstruction ≡
  // decoder output and golden bytes.
  // ------------------------------------------------------------------

  /** The 89-entry IMA step-size table (quantizer step per state). */
  val adpcmStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767)

  /** Step-index adjustment per 3-bit magnitude (sign bit ignored). */
  val adpcmIndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  @inline private def clampS16(v: Int): Int =
    if (v > 32767) 32767 else if (v < -32768) -32768 else v
  @inline private def clampIdx(v: Int): Int =
    if (v > 88) 88 else if (v < 0) 0 else v

  /** Quantize one sample against predictor state → (nibble, pred',
    * idx'). pred' is exactly what the decoder will reconstruct — the
    * encoder tracks its own quantization error (that closed loop is
    * what makes ADPCM stable, and what lets the oracle replay only
    * the encoder and still know the decoded values). */
  def adpcmEncodeStep(sample: Int, pred: Int, idx: Int): (Int, Int, Int) = {
    val step = adpcmStepTable(idx)
    val diff0 = sample - pred
    val sign = if (diff0 < 0) 8 else 0
    var diff = if (diff0 < 0) -diff0 else diff0
    var delta = 0
    if (diff >= step) { delta = 4; diff -= step }
    if (diff >= (step >> 1)) { delta |= 2; diff -= step >> 1 }
    if (diff >= (step >> 2)) delta |= 1
    val nib = sign | delta
    val (p2, i2) = adpcmDecodeStep(nib, pred, idx)
    (nib, p2, i2)
  }

  /** Apply one 4-bit code to predictor state → (pred', idx'); pred'
    * IS the decoded sample. vpdiff accumulates step·(bit/2^k) + the
    * step>>3 rounding term, exactly as the IMA reference pseudocode. */
  def adpcmDecodeStep(nib: Int, pred: Int, idx: Int): (Int, Int) = {
    val step = adpcmStepTable(idx)
    var vpdiff = step >> 3
    if ((nib & 4) != 0) vpdiff += step
    if ((nib & 2) != 0) vpdiff += step >> 1
    if ((nib & 1) != 0) vpdiff += step >> 2
    val p2 = clampS16(if ((nib & 8) != 0) pred - vpdiff else pred + vpdiff)
    val i2 = clampIdx(idx + adpcmIndexTable(nib & 7))
    (p2, i2)
  }

  /** Samples per ADPCM block for our canonical 256-byte block align:
    * 1 header sample + 252 payload bytes × 2 nibbles. */
  val AdpcmSamplesPerBlock = 505

  /** Encode mono samples as IMA ADPCM WAV (format 0x11). Block layout
    * (mono, blockAlign=256): 4-byte header [predictor int16 LE =
    * verbatim first sample of the block, step index uint8, reserved],
    * then nibble pairs low-first. The step index carries ACROSS
    * blocks (the header just checkpoints it); a `fact` chunk records
    * the true sample count so a padded final block decodes to exactly
    * the input length. */
  def encodeWavAdpcm(samples: Array[Int], sampleRate: Int): Array[Byte] = {
    val spb = AdpcmSamplesPerBlock
    val blockAlign = 4 + (spb - 1) / 2
    val nBlocks = math.max(1, (samples.length + spb - 1) / spb)
    val dataSize = nBlocks * blockAlign
    val out = new Array[Byte](60 + dataSize)
    "RIFF".getBytes.copyToArray(out, 0)
    le32(out, 4, out.length - 8)
    "WAVE".getBytes.copyToArray(out, 8)
    "fmt ".getBytes.copyToArray(out, 12)
    le32(out, 16, 20)            // fmt chunk size: 18 + 2 extension
    le16(out, 20, 0x11)          // WAVE_FORMAT_IMA_ADPCM
    le16(out, 22, 1)             // mono
    le32(out, 24, sampleRate)
    le32(out, 28, sampleRate * blockAlign / spb) // nominal byte rate
    le16(out, 32, blockAlign)
    le16(out, 34, 4)             // bits/sample
    le16(out, 36, 2)             // cbSize
    le16(out, 38, spb)           // wSamplesPerBlock
    "fact".getBytes.copyToArray(out, 40)
    le32(out, 44, 4)
    le32(out, 48, samples.length)
    "data".getBytes.copyToArray(out, 52)
    le32(out, 56, dataSize)
    var idx = 0
    var b = 0
    while (b < nBlocks) {
      val base = 60 + b * blockAlign
      val s0 = b * spb
      val first = if (s0 < samples.length) clampS16(samples(s0)) else 0
      le16(out, base, first & 0xffff)
      out(base + 2) = idx.toByte
      out(base + 3) = 0
      var pred = first
      var k = 1
      while (k < spb) {
        val si = s0 + k
        val sample = if (si < samples.length) samples(si) else pred
        val (nib, p2, i2) = adpcmEncodeStep(sample, pred, idx)
        pred = p2; idx = i2
        val off = base + 4 + (k - 1) / 2
        if (((k - 1) & 1) == 0) out(off) = nib.toByte
        else out(off) = (out(off) | (nib << 4)).toByte
        k += 1
      }
      b += 1
    }
    out
  }

  /** Decode a WAV container → (sampleRate, samples). Walks the chunk
    * list (fmt / data in any order, unknown chunks skipped with even
    * padding, as the spec requires). PCM 16-bit mono passes samples
    * through; µ-law mono (format 7) expands each code to its
    * quantized 16-bit value; IMA ADPCM mono (format 0x11) runs the
    * adaptive-predictor fold per block — anything else is a loud
    * error, not a silent misdecode. */
  def decodeWav(bytes: Array[Byte]): (Int, Array[Int]) = {
    require(bytes.length >= 44 && tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE",
      "decodeWav: not a RIFF/WAVE container")
    var off = 12
    var sampleRate = -1
    var fmt = -1
    var dataOff = -1
    var dataSz = 0
    var blockAlign = 0
    var spb = 0
    var factN = -1
    while (off + 8 <= bytes.length) {
      val id = tag(bytes, off)
      val sz = rd32(bytes, off + 4)
      val body = off + 8
      id match {
        case "fmt " =>
          fmt = rd16(bytes, body)
          val ch = rd16(bytes, body + 2)
          val bits = rd16(bytes, body + 14)
          require((fmt == 1 && ch == 1 && bits == 16)
            || (fmt == 7 && ch == 1 && bits == 8)
            || (fmt == 0x11 && ch == 1 && bits == 4),
            s"decodeWav: only PCM16/µ-law/IMA-ADPCM mono supported (fmt=$fmt ch=$ch bits=$bits)")
          sampleRate = rd32(bytes, body + 4)
          blockAlign = rd16(bytes, body + 12)
          if (fmt == 0x11) spb = rd16(bytes, body + 18)
        case "fact" =>
          factN = rd32(bytes, body)
        case "data" =>
          dataOff = body; dataSz = sz
        case _ => // skip unknown chunk
      }
      off = body + sz + (sz & 1) // chunks are word-aligned
    }
    require(sampleRate > 0 && dataOff >= 0 && fmt > 0,
      "decodeWav: missing fmt or data chunk")
    val data =
      if (fmt == 0x11) {
        require(spb > 0 && blockAlign == 4 + (spb - 1) / 2 && factN >= 0,
          s"decodeWav: bad ADPCM layout (spb=$spb align=$blockAlign fact=$factN)")
        val d = new Array[Int](factN)
        var i = 0
        var base = dataOff
        while (i < factN) {
          var pred = rd16(bytes, base).toShort.toInt
          var idx = bytes(base + 2) & 0xff
          d(i) = pred; i += 1
          var k = 1
          while (k < spb && i < factN) {
            val byte = bytes(base + 4 + (k - 1) / 2) & 0xff
            val nib = if (((k - 1) & 1) == 0) byte & 0x0f else byte >> 4
            val (p2, i2) = adpcmDecodeStep(nib, pred, idx)
            pred = p2; idx = i2
            d(i) = pred; i += 1; k += 1
          }
          base += blockAlign
        }
        d
      } else if (fmt == 1) {
        val n = dataSz / 2
        val d = new Array[Int](n)
        var i = 0
        while (i < n) {
          d(i) = rd16(bytes, dataOff + i * 2).toShort.toInt // sign-extend
          i += 1
        }
        d
      } else {
        val d = new Array[Int](dataSz)
        var i = 0
        while (i < dataSz) { d(i) = ulawDecode(bytes(dataOff + i) & 0xff); i += 1 }
        d
      }
    (sampleRate, data)
  }

  // ------------------------------------------------------------------
  // BMP (24-bit uncompressed, BITMAPINFOHEADER) — rows bottom-up,
  // BGR byte order, each row padded to a 4-byte boundary.
  // ------------------------------------------------------------------

  /** Encode top-down row-major RGB triples (3 ints/pixel, 0..255). */
  def encodeBmp24(w: Int, h: Int, rgb: Array[Int]): Array[Byte] = {
    require(rgb.length == w * h * 3, "encodeBmp24: rgb length != w*h*3")
    val rowSize = (w * 3 + 3) / 4 * 4
    val dataSize = rowSize * h
    val out = new Array[Byte](54 + dataSize)
    out(0) = 'B'; out(1) = 'M'
    le32(out, 2, 54 + dataSize)
    le32(out, 10, 54)            // pixel-data offset
    le32(out, 14, 40)            // BITMAPINFOHEADER
    le32(out, 18, w)
    le32(out, 22, h)             // positive → bottom-up
    le16(out, 26, 1)             // planes
    le16(out, 28, 24)            // bpp
    le32(out, 30, 0)             // BI_RGB (uncompressed)
    le32(out, 34, dataSize)
    var y = 0
    while (y < h) {
      val srcRow = h - 1 - y     // file row y = image row h-1-y
      var x = 0
      while (x < w) {
        val p = (srcRow * w + x) * 3
        val o = 54 + y * rowSize + x * 3
        out(o) = (rgb(p + 2) & 0xff).toByte     // B
        out(o + 1) = (rgb(p + 1) & 0xff).toByte // G
        out(o + 2) = (rgb(p) & 0xff).toByte     // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode a 24-bit uncompressed BMP → (w, h, top-down RGB triples). */
  def decodeBmp(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "decodeBmp: not a BMP")
    val dataOff = rd32(bytes, 10)
    val hdrSize = rd32(bytes, 14)
    require(hdrSize >= 40, s"decodeBmp: unsupported header size $hdrSize")
    val w = rd32(bytes, 18)
    val hRaw = rd32(bytes, 22)
    val bottomUp = hRaw > 0
    val h = math.abs(hRaw)
    val bpp = rd16(bytes, 28)
    val comp = rd32(bytes, 30)
    require(bpp == 24 && comp == 0,
      s"decodeBmp: only 24bpp uncompressed supported (bpp=$bpp comp=$comp)")
    val rowSize = (w * 3 + 3) / 4 * 4
    val rgb = new Array[Int](w * h * 3)
    var y = 0
    while (y < h) {
      val fileRow = if (bottomUp) h - 1 - y else y
      var x = 0
      while (x < w) {
        val o = dataOff + fileRow * rowSize + x * 3
        val p = (y * w + x) * 3
        rgb(p) = bytes(o + 2) & 0xff     // R
        rgb(p + 1) = bytes(o + 1) & 0xff // G
        rgb(p + 2) = bytes(o) & 0xff     // B
        x += 1
      }
      y += 1
    }
    (w, h, rgb)
  }

  // ------------------------------------------------------------------
  // PPM (P6 binary) — "P6\n<w> <h>\n255\n" + top-down RGB bytes.
  // ------------------------------------------------------------------

  def encodePpm(w: Int, h: Int, rgb: Array[Int]): Array[Byte] = {
    require(rgb.length == w * h * 3, "encodePpm: rgb length != w*h*3")
    val hdr = s"P6\n$w $h\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](hdr.length + rgb.length)
    hdr.copyToArray(out, 0)
    var i = 0
    while (i < rgb.length) { out(hdr.length + i) = (rgb(i) & 0xff).toByte; i += 1 }
    out
  }

  /** Decode a binary PPM (P6) → (w, h, top-down RGB triples). Handles
    * arbitrary whitespace and `#` comments in the header, per spec. */
  def decodePpm(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    require(bytes.length > 2 && bytes(0) == 'P' && bytes(1) == '6',
      "decodePpm: not a P6 PPM")
    var off = 2
    def nextInt(): Int = {
      // skip whitespace and comment lines
      var inComment = false
      while (off < bytes.length &&
             (inComment || bytes(off).toChar.isWhitespace || bytes(off) == '#')) {
        if (bytes(off) == '#') inComment = true
        else if (bytes(off) == '\n') inComment = false
        off += 1
      }
      var v = 0
      while (off < bytes.length && bytes(off) >= '0' && bytes(off) <= '9') {
        v = v * 10 + (bytes(off) - '0'); off += 1
      }
      v
    }
    val w = nextInt(); val h = nextInt(); val maxv = nextInt()
    require(maxv == 255, s"decodePpm: only maxval 255 supported (got $maxv)")
    off += 1 // exactly one whitespace byte after maxval, per spec
    val rgb = new Array[Int](w * h * 3)
    var i = 0
    while (i < rgb.length) { rgb(i) = bytes(off + i) & 0xff; i += 1 }
    (w, h, rgb)
  }

  // ------------------------------------------------------------------
  // PNG (truecolor 8-bit, non-interlaced) — the first COMPRESSED format
  // a multimodal pipeline meets. Pure JVM: the zlib stream goes through
  // java.util.zip.{Deflater, Inflater} (public platform API), CRC32
  // through java.util.zip.CRC32. Spec: W3C PNG (RFC 2083) —
  // https://www.w3.org/TR/png-3/ . Encoder emits filter 0 rows; the
  // decoder reconstructs ALL five spec filters (None/Sub/Up/Average/
  // Paeth), pinned by golden tests over hand-filtered streams.
  // ------------------------------------------------------------------

  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  private def be32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = ((v >>> 24) & 0xff).toByte; b(off + 1) = ((v >>> 16) & 0xff).toByte
    b(off + 2) = ((v >>> 8) & 0xff).toByte; b(off + 3) = (v & 0xff).toByte
  }
  private def rdBe32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](12 + data.length)
    be32(out, 0, data.length)
    typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII).copyToArray(out, 4)
    data.copyToArray(out, 8)
    val crc = new java.util.zip.CRC32
    crc.update(out, 4, 4 + data.length) // CRC covers type + data
    be32(out, 8 + data.length, crc.getValue.toInt)
    out
  }

  /** Encode top-down row-major RGB triples as a truecolor-8 PNG
    * (one IDAT, every scanline filter 0). */
  def encodePng(w: Int, h: Int, rgb: Array[Int]): Array[Byte] = {
    require(rgb.length == w * h * 3, "encodePng: rgb length != w*h*3")
    val ihdr = new Array[Byte](13)
    be32(ihdr, 0, w); be32(ihdr, 4, h)
    ihdr(8) = 8  // bit depth
    ihdr(9) = 2  // color type: truecolor RGB
    // compression 0, filter method 0, interlace 0 (bytes 10..12 zero)
    val raw = new Array[Byte](h * (1 + w * 3)) // filter byte + row
    var y = 0
    while (y < h) {
      val o = y * (1 + w * 3) + 1 // raw(o-1) = 0: filter None
      var i = 0
      while (i < w * 3) { raw(o + i) = (rgb(y * w * 3 + i) & 0xff).toByte; i += 1 }
      y += 1
    }
    val deflater = new java.util.zip.Deflater
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val bos = new java.io.ByteArrayOutputStream
    while (!deflater.finished()) bos.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    PngSig ++ pngChunk("IHDR", ihdr) ++ pngChunk("IDAT", bos.toByteArray) ++
      pngChunk("IEND", Array.empty[Byte])
  }

  /** Decode a truecolor-8 non-interlaced PNG → (w, h, top-down RGB
    * triples). Walks chunks (multi-IDAT streams concatenate, ancillary
    * chunks skip), inflates, then reconstructs per-scanline filters
    * 0–4 exactly as specified (Paeth predictor included). Anything but
    * 8-bit truecolor non-interlaced is a loud error, not a silent
    * misdecode. */
  def decodePng(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    require(bytes.length > 8 && PngSig.indices.forall(i => bytes(i) == PngSig(i)),
      "decodePng: bad signature")
    var off = 8
    var w = -1; var h = -1
    val idat = new java.io.ByteArrayOutputStream
    var done = false
    while (!done && off + 12 <= bytes.length) {
      val len = rdBe32(bytes, off)
      val typ = new String(bytes, off + 4, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      val body = off + 8
      typ match {
        case "IHDR" =>
          w = rdBe32(bytes, body); h = rdBe32(bytes, body + 4)
          val (depth, color, interlace) =
            (bytes(body + 8), bytes(body + 9), bytes(body + 12))
          require(depth == 8 && color == 2 && interlace == 0,
            s"decodePng: only truecolor-8 non-interlaced supported" +
              s" (depth=$depth color=$color interlace=$interlace)")
        case "IDAT" => idat.write(bytes, body, len)
        case "IEND" => done = true
        case _ => // ancillary chunk: skip
      }
      off = body + len + 4 // + CRC
    }
    require(w > 0 && h > 0 && idat.size() > 0, "decodePng: missing IHDR/IDAT")
    val stride = w * 3
    val raw = new Array[Byte](h * (1 + stride))
    val inflater = new java.util.zip.Inflater
    inflater.setInput(idat.toByteArray)
    var filled = 0
    while (!inflater.finished() && filled < raw.length)
      filled += inflater.inflate(raw, filled, raw.length - filled)
    inflater.end()
    require(filled == raw.length,
      s"decodePng: short inflate ($filled of ${raw.length})")
    // per-scanline reconstruction; prev = reconstructed row above (zeros
    // for the first row, per spec)
    val rgb = new Array[Int](w * h * 3)
    val cur = new Array[Int](stride)
    val prev = new Array[Int](stride)
    var y = 0
    while (y < h) {
      val o = y * (1 + stride)
      val filter = raw(o) & 0xff
      var i = 0
      while (i < stride) {
        val x = raw(o + 1 + i) & 0xff
        val a = if (i >= 3) cur(i - 3) else 0   // left (bpp = 3)
        val b = prev(i)                          // above
        val c = if (i >= 3) prev(i - 3) else 0   // upper-left
        cur(i) = filter match {
          case 0 => x
          case 1 => (x + a) & 0xff
          case 2 => (x + b) & 0xff
          case 3 => (x + (a + b) / 2) & 0xff
          case 4 => // Paeth predictor, straight from the spec
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            (x + pred) & 0xff
          case f => throw new IllegalArgumentException(
            s"decodePng: unknown filter $f on row $y")
        }
        rgb(y * stride + i) = cur(i)
        i += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    (w, h, rgb)
  }

  // ------------------------------------------------------------------
  // Motion-JPEG frame container: video as a sequence of independently
  // coded JPEG frames with an index — the access pattern that matters
  // for training pipelines (seek to frame k without decoding 0..k-1).
  // Layout: "MJPG" | u32 nFrames | u32 lengths[nFrames] | frames.
  // ------------------------------------------------------------------

  /** Pack already-encoded JPEG frames into an indexed container. */
  def encodeMjpeg(frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty, "encodeMjpeg: no frames")
    val out = new java.io.ByteArrayOutputStream
    out.write("MJPG".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val hdr = new Array[Byte](4 + 4 * frames.length)
    le32(hdr, 0, frames.length)
    frames.zipWithIndex.foreach { case (f, i) => le32(hdr, 4 + 4 * i, f.length) }
    out.write(hdr)
    frames.foreach(out.write)
    out.toByteArray
  }

  /** Number of frames in a container. */
  def mjpegFrameCount(bytes: Array[Byte]): Int = {
    require(tag(bytes, 0) == "MJPG", "mjpeg: bad magic")
    rd32(bytes, 4)
  }

  /** Raw bytes of frame `k` (0-based) — an INDEX SEEK: frames 0..k−1
    * are skipped by arithmetic on the length table, no decode. */
  def mjpegFrameBytes(bytes: Array[Byte], k: Int): Array[Byte] = {
    val n = mjpegFrameCount(bytes)
    require(k >= 0 && k < n, s"mjpeg: frame $k of $n")
    var off = 8 + 4 * n
    var i = 0
    while (i < k) { off += rd32(bytes, 8 + 4 * i); i += 1 }
    val len = rd32(bytes, 8 + 4 * k)
    java.util.Arrays.copyOfRange(bytes, off, off + len)
  }

  /** Decode frame `k`: the frame blob routes through the format sniff,
    * so clips may carry any supported image codec per frame (JPEG for
    * size, GIF/PNG when the pipeline needs lossless frames). */
  def decodeMjpegFrame(bytes: Array[Byte], k: Int): (Int, Int, Array[Int]) = {
    val f = mjpegFrameBytes(bytes, k)
    detectFormat(f) match {
      case "jpg" => Jpeg.decode(f)
      case "gif" => Gif.decode(f)
      case "png" => decodePng(f)
      case "bmp" => decodeBmp(f)
      case "ppm" => decodePpm(f)
      case other => throw new IllegalArgumentException(
        s"mjpeg: unsupported frame format $other")
    }
  }

  /** Container sniff by magic bytes. */
  def detectFormat(bytes: Array[Byte]): String =
    if (bytes == null || bytes.length < 4) "unknown"
    else if (bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F') "wav"
    else if (bytes(0) == 'B' && bytes(1) == 'M') "bmp"
    else if (bytes(0) == 'P' && bytes(1) == '6') "ppm"
    else if (bytes(0) == PngSig(0) && bytes(1) == 'P' && bytes(2) == 'N'
      && bytes(3) == 'G') "png"
    else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8
      && (bytes(2) & 0xff) == 0xff) "jpg"
    else if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F'
      && bytes(3) == '8') "gif"
    else if (bytes(0) == 'q' && bytes(1) == 'o' && bytes(2) == 'i'
      && bytes(3) == 'f') "qoi"
    else "unknown"

  // ------------------------------------------------------------------
  // Feature extraction over decoded media
  // ------------------------------------------------------------------

  /** Decode any supported payload into the uniform feature shape
    * (width, height, 8-dim features):
    *  - audio: width = sample count, height = sample rate, feature j =
    *    Σ of samples at positions ≡ j (mod 8) — signed sums, so the
    *    vector is zero-mean across unrelated clips (all-|x| features
    *    make every pair of clips look alike);
    *  - image: width/height = pixel dims, features = [Σr, Σg, Σb,
    *    Σ(y+1)·r, Σ(y+1)·g, Σ(y+1)·b, w, h] — the row-weighted sums
    *    catch vertical-orientation misdecodes plain sums cannot.
    * All features are integer-valued (exact in Float far below 2^24),
    * so downstream similarity math is engine-reproducible. */
  def decodeFeatures(content: Array[Byte]): (Int, Int, Array[Float]) = {
    if (content == null || content.isEmpty) return (0, 0, Array.fill(8)(0f))
    detectFormat(content) match {
      case "wav" =>
        val (sr, s) = decodeWav(content)
        val f = new Array[Float](8)
        var i = 0
        while (i < s.length) { f(i & 7) += s(i); i += 1 }
        (s.length, sr, f)
      case "bmp" | "ppm" | "png" | "jpg" | "gif" | "qoi" =>
        // jpg features are approximate (lossy decode) — fine for
        // similarity, excluded from the exact-oracle feature queries;
        // gif and qoi (like png) are lossless and exact
        val (w, h, rgb) =
          if (content(0) == 'B') decodeBmp(content)
          else if (content(0) == 'P') decodePpm(content)
          else if (content(0) == 'G') Gif.decode(content)
          else if (content(0) == 'q') Qoi.decode(content)
          else if ((content(0) & 0xff) == 0xff) Jpeg.decode(content)
          else decodePng(content)
        val f = new Array[Float](8)
        var p = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val r = rgb(p); val g = rgb(p + 1); val b = rgb(p + 2)
            f(0) += r; f(1) += g; f(2) += b
            f(3) += (y + 1) * r; f(4) += (y + 1) * g; f(5) += (y + 1) * b
            p += 3; x += 1
          }
          y += 1
        }
        f(6) = w.toFloat; f(7) = h.toFloat
        (w, h, f)
      case other =>
        throw new IllegalArgumentException(s"decodeFeatures: unsupported format $other")
    }
  }

  /** 64-bit difference hash (dHash) of a decoded image — the standard
    * perceptual near-dup fingerprint, defined here with EXACT integer
    * math so an independent engine can replay it bit-for-bit (no
    * resampling-library semantics):
    *  - luminance = (299·r + 587·g + 114·b) div 1000 (integer Rec.601);
    *  - the image box-partitions into a 9-col × 8-row grid, pixel
    *    (x, y) → cell ((x·9) div w, (y·8) div h); cell value =
    *    sum(lum) div count (integer division);
    *  - row byte r = Σ_c [cell(r, c+1) > cell(r, c)] · 2^c, c in 0..7.
    * Returned as the 8 row bytes (hyphen-joined decimal string — a
    * join/group key both engines produce identically). Brightness and
    * contrast shifts preserve the gradient signs, so recompressed or
    * slightly-edited copies collide; requires w ≥ 9 and h ≥ 8. */
  def dHash(w: Int, h: Int, rgb: Array[Int]): String = {
    require(w >= 9 && h >= 8, s"dHash needs w>=9, h>=8 (got ${w}x$h)")
    val sums = Array.ofDim[Long](8, 9)
    val cnts = Array.ofDim[Long](8, 9)
    var p = 0
    var y = 0
    while (y < h) {
      val cy = y * 8 / h
      var x = 0
      while (x < w) {
        val lum = (299L * rgb(p) + 587L * rgb(p + 1) + 114L * rgb(p + 2)) / 1000L
        val cx = x * 9 / w
        sums(cy)(cx) += lum; cnts(cy)(cx) += 1
        p += 3; x += 1
      }
      y += 1
    }
    val out = new StringBuilder
    var r = 0
    while (r < 8) {
      var byte = 0
      var c = 0
      while (c < 8) {
        val cur = sums(r)(c) / cnts(r)(c)
        val nxt = sums(r)(c + 1) / cnts(r)(c + 1)
        if (nxt > cur) byte |= (1 << c)
        c += 1
      }
      if (r > 0) out.append('-')
      out.append(byte)
      r += 1
    }
    out.toString
  }

  /** Partition-wise feature extraction: one codec init per partition
    * (the expensive part for real codecs), rows streamed through it.
    * Output keeps the id plus extracted width/height/features.
    * `skipBad = true` drops undecodable payloads instead of failing
    * the task — the malformed-row-skip policy (P7) a pipeline over
    * scraped media needs; the default stays loud for curated data. */
  def extractFeatures(df: DataFrame, skipBad: Boolean): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("features", ArrayType(FloatType))))
    implicit val enc = Encoders.row(outSchema)
    df.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val content = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          if (skipBad) {
            try {
              val (w, h, feat) = decodeFeatures(content)
              Some(Row(r.getLong(0), w, h, feat.toSeq))
            } catch { case _: Exception => None }
          } else {
            val (w, h, feat) = decodeFeatures(content)
            Some(Row(r.getLong(0), w, h, feat.toSeq))
          }
        }
      }
  }

  def extractFeatures(df: DataFrame): DataFrame =
    extractFeatures(df, skipBad = false)

  /** Frame sampling: pure column expressions — slice the payload into
    * `frameSize`-byte frames and keep every `stride`-th one. For real
    * video this is the keyframe-stride pattern; the byte-slicing
    * plumbing (offsets, tail handling) is identical. */
  def frameSample(contentCol: String, frameSize: Int,
                  stride: Int): org.apache.spark.sql.Column =
    expr(
      s"""filter(
            transform(
              sequence(0, greatest(cast((length($contentCol) + ${frameSize - 1})
                                        / $frameSize as int) - 1, 0)),
              i -> case when i % $stride = 0
                        then substring($contentCol, i * $frameSize + 1, $frameSize)
                   end),
            f -> f is not null)""")

  /** Media near-duplicates: decoded feature vectors → exact cosine
    * pairs via the BLOCKED distributed plan (equi-join fan-out, no
    * nested-loop operator; see [[VectorOps.cosineNearDupBlocked]]).
    * The cross-modal composition point: once media becomes a feature
    * column, every embedding operator (ANN, SemDeDup, outlier gates)
    * applies unchanged. */
  def mediaNearDups(df: DataFrame, threshold: Double): DataFrame =
    VectorOps.cosineNearDupBlocked(
      extractFeatures(df).select(col("media_id"), col("features")),
      "media_id", "features", threshold)

  /** Resize metadata transform: the dimension math every thumbnailer
    * runs; the pixel resample itself belongs to the codec layer. */
  def resizeMeta(meta: org.apache.spark.sql.Column, maxDim: Int): org.apache.spark.sql.Column = {
    val w = meta.getField("width"); val h = meta.getField("height")
    val scale = least(lit(1.0), lit(maxDim) / greatest(w, h).cast("double"))
    struct(meta.getField("format").as("format"),
      floor(w * scale).cast("int").as("width"),
      floor(h * scale).cast("int").as("height"))
  }
}
