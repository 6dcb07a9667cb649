package graft.ops

/** Pure-JVM FLAC (subset) codec, written from the public format spec
  * (RFC 9639 / https://xiph.org/flac/format.html). Reference pipeline
  * behavior: the multimodal family treats audio as opaque binary
  * columns decoded partition-wise (see `analytics` CSV ingestion in
  * the reference, /root/reference/internal/sink/csv.go:107 — the
  * engine's job is typed decode of at-rest bytes); FLAC is the
  * lossless leg next to WAV/µ-law/ADPCM.
  *
  * Encoder (subset): 16-bit PCM, 1-2 independent channels, fixed
  * 4096-sample blocks (explicit 16-bit block size in every frame
  * header so partial tails need no special casing), per-block best
  * FIXED predictor (orders 0-4 by least Σ|residual|, the standard
  * estimator), Rice residuals with a chosen partition order and
  * exact per-partition parameter search (escape to raw when raw is
  * cheaper), UTF-8 frame numbers, CRC-8 header / CRC-16 frame
  * trailers, and the STREAMINFO MD5 of the unencoded little-endian
  * samples.
  *
  * Decoder: everything the encoder emits PLUS general LPC subframes
  * (4-bit precision, signed shift, signed quantized coefficients —
  * the s[n] = r[n] + (Σ c_i·s[n-1-i] >> shift) reconstruction in
  * 64-bit), any Rice partition order, both Rice methods (4- and
  * 5-bit parameters) and the raw-bits escape, wasted-bits unary
  * prefixes, and verifies CRC-8, CRC-16 and the stream MD5 — a
  * truncated or bit-flipped stream fails loudly, never silently
  * (the module family's posture). Both sides handle all three stereo
  * decorrelation modes — left/side, right/side, and mid/side (channel
  * assignments 8-10): always on decode; on encode behind the opt-in
  * `stereo` flag, chosen per frame against independent channels by
  * exact encoded bits. General LPC is likewise decode-always /
  * encode-opt-in (`lpcOrder`); the DEFAULT encode path stays the
  * fixed-predictor form, byte-identical to round 8.
  */
object Flac {
  private val BlockSize = 4096

  // ---------------------------------------------------------------
  // CRCs (FLAC frame polynomials)
  // ---------------------------------------------------------------

  private val crc8Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i
      var b = 0
      while (b < 8) { c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff; b += 1 }
      t(i) = c; i += 1
    }
    t
  }
  private val crc16Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 8
      var b = 0
      while (b < 8) { c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff else (c << 1) & 0xffff; b += 1 }
      t(i) = c; i += 1
    }
    t
  }
  private def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var c = 0; var i = from
    while (i < until) { c = crc8Table(c ^ (bytes(i) & 0xff)); i += 1 }
    c
  }
  private def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var c = 0; var i = from
    while (i < until) { c = crc16Table(((c >> 8) ^ (bytes(i) & 0xff)) & 0xff) ^ ((c << 8) & 0xffff); i += 1 }
    c
  }

  // ---------------------------------------------------------------
  // Bit IO (MSB-first, no byte stuffing — unlike JPEG)
  // ---------------------------------------------------------------

  private final class BW {
    val out = new java.io.ByteArrayOutputStream
    private var acc = 0
    private var n = 0
    var bitsWritten: Long = 0 // exact-cost probe for predictor selection
    def put(v: Long, bits: Int): Unit = {
      bitsWritten += bits
      var i = bits - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >>> i) & 1L).toInt
        n += 1
        if (n == 8) { out.write(acc); acc = 0; n = 0 }
        i -= 1
      }
    }
    def putUnary(q: Int): Unit = { var i = 0; while (i < q) { put(0, 1); i += 1 }; put(1, 1) }
    def alignZero(): Unit = while (n != 0) put(0, 1)
    def size: Int = out.size() // whole bytes flushed so far
  }

  private final class BR(val data: Array[Byte], startByte: Int) {
    var pos: Int = startByte // byte position of the NEXT unread byte
    private var acc = 0
    private var n = 0
    def bit(): Int = {
      if (n == 0) {
        require(pos < data.length, "flac: truncated stream")
        acc = data(pos) & 0xff; pos += 1; n = 8
      }
      n -= 1
      (acc >>> n) & 1
    }
    def bits(k: Int): Long = {
      var v = 0L; var i = 0
      while (i < k) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def sbits(k: Int): Int = {
      val v = bits(k)
      (v << (64 - k) >> (64 - k)).toInt // sign extend
    }
    def unary(): Int = {
      var q = 0
      while (bit() == 0) { q += 1; require(q < (1 << 24), "flac: runaway unary") }
      q
    }
    def aligned: Boolean = n == 0
    def alignSkip(): Unit = n = 0
  }

  // ---------------------------------------------------------------
  // Encode
  // ---------------------------------------------------------------

  /** Encode 16-bit PCM (`pcm(ch)(i)`, 1 or 2 independent channels) to
    * a FLAC stream. `partOrder` selects the Rice partition order used
    * in every frame (must divide the block evenly after warmup; 0 is
    * always legal). `lpcOrder` > 0 additionally fits a general LPC
    * predictor per block (Levinson-Durbin up to that order, 12-bit
    * quantized coefficients) and picks fixed-vs-LPC by EXACT encoded
    * subframe bits; 0 (the default) keeps the round-8 fixed-predictor
    * path byte-identical. `stereo` = true additionally tries the three
    * stereo decorrelation modes per frame (left/side, side/right,
    * mid/side — the decoder already handles all three) and keeps the
    * cheapest by exact bits. Lossless in every combination — residuals
    * are computed against the same quantized reconstruction the
    * decoder replays, and the stream MD5 gate verifies every decode. */
  def encode(pcm: Array[Array[Int]], sampleRate: Int = 16000,
             partOrder: Int = 0, lpcOrder: Int = 0,
             stereo: Boolean = false): Array[Byte] = {
    require(lpcOrder >= 0 && lpcOrder <= 31, "flac encode: lpc order 0-31")
    val channels = pcm.length
    require(channels == 1 || channels == 2, "flac encode: 1 or 2 channels")
    val total = pcm(0).length.toLong
    require(channels == 1 || pcm(1).length == pcm(0).length,
      "flac encode: channel length mismatch")
    pcm.foreach(_.foreach(s =>
      require(s >= -32768 && s <= 32767, "flac encode: 16-bit range")))

    val out = new java.io.ByteArrayOutputStream
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO (last metadata block), 34 bytes
    val si = new BW
    si.put(BlockSize, 16); si.put(BlockSize, 16) // min/max block size
    si.put(0, 24); si.put(0, 24)                 // min/max frame size unknown
    si.put(sampleRate, 20)
    si.put(channels - 1, 3)
    si.put(15, 5)                                // bits per sample - 1
    si.put(total, 36)
    // MD5 of the unencoded signal: interleaved samples, little-endian
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < pcm(0).length) {
      var c = 0
      while (c < channels) {
        val s = pcm(c)(i)
        md.update((s & 0xff).toByte); md.update(((s >> 8) & 0xff).toByte)
        c += 1
      }
      i += 1
    }
    val sib = si.out.toByteArray
    out.write(0x80)                              // last-block flag | type 0
    out.write(0); out.write(0); out.write(34)
    out.write(sib, 0, 18)
    out.write(md.digest(), 0, 16)

    var frameNo = 0L
    var off = 0
    while (off < pcm(0).length) {
      val bs = math.min(BlockSize, pcm(0).length - off)
      out.write(encodeFrame(pcm, off, bs, frameNo, channels, partOrder,
        lpcOrder, stereo))
      off += bs
      frameNo += 1
    }
    out.toByteArray
  }

  private def utf8Len(v: Long): Int =
    if (v < 0x80) 1 else if (v < 0x800) 2 else if (v < 0x10000) 3
    else if (v < 0x200000) 4 else if (v < 0x4000000) 5 else 6

  private def putUtf8(bw: BW, v: Long): Unit = utf8Len(v) match {
    case 1 => bw.put(v, 8)
    case n =>
      bw.put((0xff << (8 - n)) & 0xff | (v >>> (6 * (n - 1))), 8)
      var i = n - 2
      while (i >= 0) { bw.put(0x80L | ((v >>> (6 * i)) & 0x3f), 8); i -= 1 }
  }

  private def readUtf8(br: BR): Long = {
    val b0 = br.bits(8).toInt
    if ((b0 & 0x80) == 0) b0.toLong
    else {
      var n = 0
      var m = b0
      while ((m & 0x80) != 0) { n += 1; m <<= 1 }
      require(n >= 2 && n <= 7, "flac: bad UTF-8 frame number")
      var v = (b0 & (0x7f >> n)).toLong
      var i = 1
      while (i < n) {
        val b = br.bits(8).toInt
        require((b & 0xc0) == 0x80, "flac: bad UTF-8 continuation")
        v = (v << 6) | (b & 0x3f)
        i += 1
      }
      v
    }
  }

  /** Residuals of the fixed predictor of `order` over block samples. */
  private def fixedResidual(s: Array[Int], order: Int): Array[Int] = {
    val n = s.length
    val r = new Array[Int](n - order)
    var i = order
    while (i < n) {
      r(i - order) = order match {
        case 0 => s(i)
        case 1 => s(i) - s(i - 1)
        case 2 => s(i) - 2 * s(i - 1) + s(i - 2)
        case 3 => s(i) - 3 * s(i - 1) + 3 * s(i - 2) - s(i - 3)
        case _ => s(i) - 4 * s(i - 1) + 6 * s(i - 2) - 4 * s(i - 3) + s(i - 4)
      }
      i += 1
    }
    r
  }

  private def fold(v: Int): Long = if (v >= 0) 2L * v else -2L * v - 1

  /** Exact Rice cost of a partition at parameter p. */
  private def riceCost(res: Array[Int], from: Int, until: Int, p: Int): Long = {
    var c = 0L; var i = from
    while (i < until) { c += (fold(res(i)) >>> p) + 1 + p; i += 1 }
    c
  }

  /** Rice-partitioned residual block (method + partition order +
    * per-partition exact parameter search with the raw escape) —
    * shared by the fixed and LPC subframe writers. */
  private def writeResidual(bw: BW, res: Array[Int], bs: Int, order: Int,
                            partOrder: Int): Unit = {
    val po = if ((bs % (1 << partOrder)) == 0 &&
      (bs >> partOrder) > order) partOrder else 0
    bw.put(0, 2)                 // residual method: 4-bit Rice
    bw.put(po, 4)
    val parts = 1 << po
    var pi = 0
    while (pi < parts) {
      val pLen = bs >> po
      val from = if (pi == 0) 0 else pi * pLen - order
      val until = (pi + 1) * pLen - order
      // exact parameter search incl. the raw escape
      var bestP = 0
      var bestBits = Long.MaxValue
      var p = 0
      while (p <= 14) {
        val cost = riceCost(res, from, until, p)
        if (cost < bestBits) { bestBits = cost; bestP = p }
        p += 1
      }
      // raw escape width: smallest signed width covering the
      // partition (an order-4 residual on 16-bit input can need 21)
      var rawLen = 1
      var i0 = from
      while (i0 < until) {
        val v = res(i0)
        var nb = 1
        while (!(v >= -(1 << (nb - 1)) && v <= (1 << (nb - 1)) - 1)) nb += 1
        if (nb > rawLen) rawLen = nb
        i0 += 1
      }
      val rawBits = 5L + (until - from).toLong * rawLen
      if (rawBits < bestBits) {
        bw.put(0xf, 4) // escape
        bw.put(rawLen, 5)
        var i = from
        while (i < until) { bw.put(res(i).toLong, rawLen); i += 1 }
      } else {
        bw.put(bestP, 4)
        var i = from
        while (i < until) {
          val f = fold(res(i))
          bw.putUnary((f >>> bestP).toInt)
          if (bestP > 0) bw.put(f & ((1L << bestP) - 1), bestP)
          i += 1
        }
      }
      pi += 1
    }
  }

  private def writeFixedSubframe(bw: BW, s: Array[Int], bs: Int, order: Int,
                                 bps: Int, partOrder: Int): Unit = {
    val res = fixedResidual(s, order)
    bw.put(0, 1)                 // subframe pad bit
    bw.put(8 + order, 6)         // FIXED, order
    bw.put(0, 1)                 // no wasted bits
    var w = 0
    // warmup samples: two's-complement low `bps` bits (17 for a
    // stereo-decorrelation side channel, 16 otherwise)
    while (w < order) { bw.put(s(w).toLong, bps); w += 1 }
    writeResidual(bw, res, bs, order, partOrder)
  }

  private def writeLpcSubframe(bw: BW, s: Array[Int], bs: Int, prec: Int,
                               shift: Int, coef: Array[Int],
                               bps: Int, partOrder: Int): Unit = {
    val order = coef.length
    val res = lpcResidual(s, shift, coef)
    bw.put(0, 1)                 // subframe pad bit
    bw.put(31 + order, 6)        // LPC, order
    bw.put(0, 1)                 // no wasted bits
    var w = 0
    while (w < order) { bw.put(s(w).toLong, bps); w += 1 }
    bw.put(prec - 1, 4)
    bw.put(shift.toLong, 5)      // always ≥ 0 here (decoder requires it)
    var j = 0
    while (j < order) { bw.put(coef(j).toLong, prec); j += 1 }
    writeResidual(bw, res, bs, order, partOrder)
  }

  /** Best subframe for one channel: the round-8 heuristic fixed pick
    * when `lpcOrder` ≤ 0 (byte-identical default), else exact-bit
    * selection over fixed 0-4 + the Levinson-Durbin fit. */
  private def writeBestSubframe(bw: BW, s: Array[Int], bs: Int, bps: Int,
                                partOrder: Int, lpcOrder: Int): Unit = {
    if (lpcOrder <= 0) {
      var bestOrd = 0
      var bestCost = Long.MaxValue
      var o = 0
      while (o <= math.min(4, bs - 1)) {
        val r = fixedResidual(s, o)
        var sum = 0L
        r.foreach(v => sum += math.abs(v.toLong))
        if (sum < bestCost) { bestCost = sum; bestOrd = o }
        o += 1
      }
      writeFixedSubframe(bw, s, bs, bestOrd, bps, partOrder)
    } else {
      val candidates: Seq[BW => Unit] =
        (0 to math.min(4, bs - 1)).map(o =>
          (w: BW) => writeFixedSubframe(w, s, bs, o, bps, partOrder)) ++
        lpcFit(s, lpcOrder).toSeq.map { case (prec, shift, qc) =>
          (w: BW) => writeLpcSubframe(w, s, bs, prec, shift, qc, bps, partOrder)
        }
      val best = candidates.minBy { f =>
        val probe = new BW; f(probe); probe.bitsWritten
      }
      best(bw)
    }
  }

  /** Residuals of the quantized-LPC predictor — the EXACT mirror of
    * the decoder's reconstruction (64-bit accumulate, arithmetic
    * shift), which is what makes the subframe lossless regardless of
    * how lossy the coefficient quantization was. */
  private def lpcResidual(s: Array[Int], shift: Int,
                          coef: Array[Int]): Array[Int] = {
    val order = coef.length
    val n = s.length
    val r = new Array[Int](n - order)
    var i = order
    while (i < n) {
      var acc = 0L
      var j = 0
      while (j < order) { acc += coef(j).toLong * s(i - 1 - j); j += 1 }
      r(i - order) = s(i) - (acc >> shift).toInt
      i += 1
    }
    r
  }

  /** Levinson-Durbin LPC fit over the block's (rectangular-window)
    * autocorrelation, then 12-bit coefficient quantization with the
    * largest in-range shift. Returns (precision, shift, coefs) — the
    * fit stops early at instability (|reflection| ≥ 1), and None means
    * the block is degenerate (too short, zero energy, or zero
    * coefficients) and only the fixed predictors apply. */
  private def lpcFit(s: Array[Int], maxOrder: Int): Option[(Int, Int, Array[Int])] = {
    val n = s.length
    if (n <= 2 * maxOrder) return None
    val ac = new Array[Double](maxOrder + 1)
    var lag = 0
    while (lag <= maxOrder) {
      var acc = 0.0
      var i = lag
      while (i < n) { acc += s(i).toDouble * s(i - lag); i += 1 }
      ac(lag) = acc
      lag += 1
    }
    if (ac(0) <= 0.0) return None // digital silence: CONSTANT territory
    var err = ac(0)
    val lpc = new Array[Double](maxOrder)
    var m = 0
    var stop = false
    while (m < maxOrder && !stop) {
      var k = ac(m + 1)
      var j = 0
      while (j < m) { k -= lpc(j) * ac(m - j); j += 1 }
      k /= err
      if (java.lang.Double.isNaN(k) || math.abs(k) >= 1.0) stop = true
      else {
        // reflection update: c'_i = c_i − k·c_{m−1−i}
        var i = 0
        while (i < m / 2) {
          val t = lpc(i)
          lpc(i) = t - k * lpc(m - 1 - i)
          lpc(m - 1 - i) = lpc(m - 1 - i) - k * t
          i += 1
        }
        if (m % 2 == 1) lpc(m / 2) -= k * lpc(m / 2)
        lpc(m) = k
        err *= 1.0 - k * k
        m += 1
      }
    }
    if (m == 0) return None
    val prec = 12
    var cmax = 0.0
    var i = 0
    while (i < m) { cmax = math.max(cmax, math.abs(lpc(i))); i += 1 }
    if (cmax == 0.0) return None
    // shift: largest so round(c·2^shift) stays within prec-1 signed bits
    var shift = 0
    while (shift < 15 && cmax * (1L << (shift + 1)) < (1 << (prec - 1)) - 1)
      shift += 1
    val qc = new Array[Int](m)
    i = 0
    while (i < m) {
      val q = math.round(lpc(i) * (1L << shift))
      qc(i) = math.max(-(1 << (prec - 1)),
        math.min((1 << (prec - 1)) - 1, q.toInt))
      i += 1
    }
    Some((prec, shift, qc))
  }

  private def encodeFrame(pcm: Array[Array[Int]], off: Int, bs: Int,
                          frameNo: Long, channels: Int,
                          partOrder: Int, lpcOrder: Int = 0,
                          stereo: Boolean = false): Array[Byte] = {
    // channel plan: independent always; with `stereo` on a 2-channel
    // stream, also the three decorrelation modes (side = L−R spans 17
    // bits; mid = (L+R)>>1 — the exact inverses of the decoder's
    // reconstruction), picked by EXACT total subframe bits
    val chan = Array.tabulate(channels) { c =>
      val s = new Array[Int](bs); System.arraycopy(pcm(c), off, s, 0, bs); s
    }
    // (channel-assignment header field, per-subframe (samples, bps))
    val indep: (Int, Array[(Array[Int], Int)]) =
      (channels - 1, chan.map(s => (s, 16)))
    val modes: Seq[(Int, Array[(Array[Int], Int)])] =
      if (!stereo || channels != 2) Seq(indep)
      else {
        val l = chan(0); val r = chan(1)
        val side = Array.tabulate(bs)(i => l(i) - r(i))
        val mid = Array.tabulate(bs)(i => (l(i) + r(i)) >> 1)
        Seq(indep,
          (8, Array((l, 16), (side, 17))),   // left/side
          (9, Array((side, 17), (r, 16))),   // side/right
          (10, Array((mid, 16), (side, 17)))) // mid/side
      }
    val (asnField, subs) =
      if (modes.size == 1) modes.head
      else modes.minBy { case (_, ss) =>
        ss.map { case (s, bps) =>
          val probe = new BW
          writeBestSubframe(probe, s, bs, bps, partOrder, lpcOrder)
          probe.bitsWritten
        }.sum
      }

    val bw = new BW
    bw.put(0x3ffe, 14)       // sync
    bw.put(0, 1)             // reserved
    bw.put(0, 1)             // fixed-blocksize stream
    bw.put(0x7, 4)           // block size: 16-bit value-1 at header end
    bw.put(0, 4)             // sample rate: from STREAMINFO
    bw.put(asnField, 4)      // channel assignment (indep or decorrelated)
    bw.put(0x4, 3)           // 16 bits per sample
    bw.put(0, 1)             // reserved
    putUtf8(bw, frameNo)
    bw.put(bs - 1, 16)
    // CRC-8 over the header bytes written so far (bit-aligned here)
    val headBytes = bw.out.toByteArray
    bw.put(crc8(headBytes, 0, headBytes.length), 8)

    subs.foreach { case (s, bps) =>
      writeBestSubframe(bw, s, bs, bps, partOrder, lpcOrder)
    }
    bw.alignZero()
    val body = bw.out.toByteArray
    val withCrc = new java.io.ByteArrayOutputStream
    withCrc.write(body, 0, body.length)
    val c16 = crc16(body, 0, body.length)
    withCrc.write((c16 >> 8) & 0xff); withCrc.write(c16 & 0xff)
    withCrc.toByteArray
  }

  // ---------------------------------------------------------------
  // Decode
  // ---------------------------------------------------------------

  /** Decode a FLAC stream to (sampleRate, channels, pcm). Verifies
    * frame CRC-8/CRC-16 and the STREAMINFO MD5; any mismatch or
    * truncation is a loud error. */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Array[Int]]) = {
    require(bytes.length > 42 && bytes(0) == 'f' && bytes(1) == 'L'
      && bytes(2) == 'a' && bytes(3) == 'C', "flac: bad magic")
    var pos = 4
    var sampleRate = -1
    var channels = -1
    var bps = -1
    var total = -1L
    var md5Expect: Array[Byte] = null
    var last = false
    while (!last) {
      val h = bytes(pos) & 0xff
      last = (h & 0x80) != 0
      val typ = h & 0x7f
      val len = ((bytes(pos + 1) & 0xff) << 16) | ((bytes(pos + 2) & 0xff) << 8) |
        (bytes(pos + 3) & 0xff)
      if (typ == 0) {
        val br = new BR(bytes, pos + 4)
        br.bits(16); br.bits(16); br.bits(24); br.bits(24)
        sampleRate = br.bits(20).toInt
        channels = br.bits(3).toInt + 1
        bps = br.bits(5).toInt + 1
        total = br.bits(36)
        md5Expect = java.util.Arrays.copyOfRange(bytes, pos + 4 + 18, pos + 4 + 34)
      }
      pos += 4 + len
    }
    require(sampleRate > 0 && channels >= 1, "flac: missing STREAMINFO")
    require(bps == 16, s"flac: only 16-bit supported, got $bps")
    require(channels <= 2, s"flac: only 1-2 channels supported, got $channels")
    require(total >= 0 && total <= Int.MaxValue, "flac: bad total samples")

    val pcm = Array.fill(channels)(new Array[Int](total.toInt))
    var written = 0
    while (written < total) {
      val frameStart = pos
      val br = new BR(bytes, pos)
      require(br.bits(14) == 0x3ffe, s"flac: lost frame sync at $pos")
      br.bits(1) // reserved
      br.bits(1) // blocking strategy (frame/sample number both fine here)
      val bsCode = br.bits(4).toInt
      val srCode = br.bits(4).toInt
      val chanAsn = br.bits(4).toInt
      val ssCode = br.bits(3).toInt
      br.bits(1)
      // 0..7 independent; 8 left/side; 9 right/side; 10 mid/side —
      // the stereo decorrelation modes libFLAC emits by default
      val decorrelated = chanAsn >= 8 && chanAsn <= 10
      require((decorrelated && channels == 2) || chanAsn == channels - 1,
        s"flac: channel assignment $chanAsn vs $channels channels")
      require(ssCode == 4, "flac: frame sample size != 16 bit")
      readUtf8(br)
      val bs = bsCode match {
        case 1 => 192
        case n if n >= 2 && n <= 5 => 576 << (n - 2)
        case 6 => br.bits(8).toInt + 1
        case 7 => br.bits(16).toInt + 1
        case n if n >= 8 => 256 << (n - 8)
        case _ => throw new IllegalArgumentException("flac: reserved block size")
      }
      srCode match {
        case 0 => ()
        case 12 => br.bits(8)
        case 13 | 14 => br.bits(16)
        case n if n <= 11 => ()
        case _ => throw new IllegalArgumentException("flac: bad sample rate code")
      }
      val headerEnd = br.pos // CRC-8 byte is next (header is byte-aligned)
      require(br.aligned, "flac: misaligned frame header")
      val c8 = br.bits(8).toInt
      require(c8 == crc8(bytes, frameStart, headerEnd),
        s"flac: frame header CRC mismatch at $frameStart")

      // the SIDE channel carries one extra bit of sample resolution
      // (T.81-analog in the FLAC spec: side = L−R spans 17 bits)
      def chanBps(c: Int): Int = chanAsn match {
        case 8 => if (c == 1) 17 else 16  // left/side
        case 9 => if (c == 0) 17 else 16  // side/right
        case 10 => if (c == 1) 17 else 16 // mid/side
        case _ => 16
      }
      val raw = Array.tabulate(channels)(c => decodeSubframe(br, bs, chanBps(c)))
      val chans: Array[Array[Int]] = chanAsn match {
        case 8 => // left/side: R = L − S
          Array(raw(0), Array.tabulate(bs)(i => raw(0)(i) - raw(1)(i)))
        case 9 => // side/right: L = R + S
          Array(Array.tabulate(bs)(i => raw(1)(i) + raw(0)(i)), raw(1))
        case 10 => // mid/side: m2 = (mid<<1)|(side&1); L,R = (m2±side)>>1
          val l = new Array[Int](bs); val r = new Array[Int](bs)
          var i = 0
          while (i < bs) {
            val m2 = (raw(0)(i) << 1) | (raw(1)(i) & 1)
            l(i) = (m2 + raw(1)(i)) >> 1
            r(i) = (m2 - raw(1)(i)) >> 1
            i += 1
          }
          Array(l, r)
        case _ => raw
      }
      var c = 0
      while (c < channels) {
        System.arraycopy(chans(c), 0, pcm(c), written, bs)
        c += 1
      }
      br.alignSkip()
      val bodyEnd = br.pos
      val c16 = ((bytes(bodyEnd) & 0xff) << 8) | (bytes(bodyEnd + 1) & 0xff)
      require(c16 == crc16(bytes, frameStart, bodyEnd),
        s"flac: frame CRC-16 mismatch at $frameStart")
      pos = bodyEnd + 2
      written += bs
    }
    require(written == total, "flac: sample count mismatch")
    // stream MD5 over the decoded signal
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < total.toInt) {
      var c = 0
      while (c < channels) {
        val s = pcm(c)(i)
        md.update((s & 0xff).toByte); md.update(((s >> 8) & 0xff).toByte)
        c += 1
      }
      i += 1
    }
    require(java.util.Arrays.equals(md.digest(), md5Expect),
      "flac: stream MD5 mismatch")
    (sampleRate, channels, pcm)
  }

  private def decodeSubframe(br: BR, bs: Int, bps: Int): Array[Int] = {
    require(br.bits(1) == 0, "flac: subframe pad bit set")
    val typ = br.bits(6).toInt
    val wastedFlag = br.bits(1).toInt
    val wasted = if (wastedFlag == 1) br.unary() + 1 else 0
    val ebps = bps - wasted
    val s = new Array[Int](bs)
    typ match {
      case 0 => // CONSTANT
        val v = br.sbits(ebps)
        java.util.Arrays.fill(s, v)
      case 1 => // VERBATIM
        var i = 0
        while (i < bs) { s(i) = br.sbits(ebps); i += 1 }
      case t if t >= 8 && t <= 12 => // FIXED order 0-4
        val order = t - 8
        var i = 0
        while (i < order) { s(i) = br.sbits(ebps); i += 1 }
        val res = decodeResidual(br, bs, order)
        i = order
        while (i < bs) {
          val r = res(i - order)
          s(i) = order match {
            case 0 => r
            case 1 => r + s(i - 1)
            case 2 => r + 2 * s(i - 1) - s(i - 2)
            case 3 => r + 3 * s(i - 1) - 3 * s(i - 2) + s(i - 3)
            case _ => r + 4 * s(i - 1) - 6 * s(i - 2) + 4 * s(i - 3) - s(i - 4)
          }
          i += 1
        }
      case t if t >= 32 => // LPC order 1-32
        val order = t - 31
        require(order <= bs, "flac: LPC order exceeds block")
        var i = 0
        while (i < order) { s(i) = br.sbits(ebps); i += 1 }
        val precM1 = br.bits(4).toInt
        require(precM1 != 15, "flac: invalid LPC precision")
        val prec = precM1 + 1
        val shift = br.sbits(5)
        require(shift >= 0, "flac: negative LPC shift")
        val coef = new Array[Int](order)
        i = 0
        while (i < order) { coef(i) = br.sbits(prec); i += 1 }
        val res = decodeResidual(br, bs, order)
        i = order
        while (i < bs) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coef(j).toLong * s(i - 1 - j); j += 1 }
          s(i) = res(i - order) + (acc >> shift).toInt
          i += 1
        }
      case t =>
        throw new IllegalArgumentException(s"flac: reserved subframe type $t")
    }
    if (wasted > 0) {
      var i = 0
      while (i < bs) { s(i) <<= wasted; i += 1 }
    }
    s
  }

  private def decodeResidual(br: BR, bs: Int, order: Int): Array[Int] = {
    val method = br.bits(2).toInt
    require(method == 0 || method == 1, "flac: reserved residual method")
    val pBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 0xf else 0x1f
    val po = br.bits(4).toInt
    val parts = 1 << po
    require(bs % parts == 0 && (bs >> po) > order,
      "flac: bad rice partition order")
    val res = new Array[Int](bs - order)
    var idx = 0
    var pi = 0
    while (pi < parts) {
      val pLen = (bs >> po) - (if (pi == 0) order else 0)
      val p = br.bits(pBits).toInt
      if (p == escape) {
        val raw = br.bits(5).toInt
        var i = 0
        while (i < pLen) {
          res(idx) = if (raw == 0) 0 else br.sbits(raw)
          idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < pLen) {
          val q = br.unary().toLong
          val f = (q << p) | br.bits(p)
          res(idx) = (if ((f & 1) == 0) f >>> 1 else -((f + 1) >>> 1)).toInt
          idx += 1; i += 1
        }
      }
      pi += 1
    }
    res
  }
}
