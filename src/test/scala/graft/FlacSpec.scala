package graft

import graft.ops.Flac
import org.scalatest.funsuite.AnyFunSuite

/** FLAC codec pins. No FLAC reference implementation ships in this
  * container (javax.sound has no FLAC SPI), so the golden strategy is
  * the one the lossless legs use when the JDK can't arbitrate:
  * bit-exact round trips through our encoder (whose output layout is
  * pinned structurally against the public spec — magic, STREAMINFO
  * fields, frame sync), hand-assembled fixture streams whose expected
  * samples are computed by hand from the spec's reconstruction
  * formulas (exercising the LPC path the encoder doesn't emit), and
  * loud-failure checks on corrupted bytes (CRC-8, CRC-16, MD5). */
class FlacSpec extends AnyFunSuite {

  private def triangle(n: Int, seed: Int): Array[Int] =
    Array.tabulate(n) { i =>
      (i * (200 + seed % 32)) % 8000 - 4000 + (seed * 31 + i) % 5
    }

  test("mono round trip: multi-block with partial tail, MD5 verified") {
    val pcm = triangle(4096 * 2 + 777, 7) // two full blocks + partial
    val bytes = Flac.encode(Array(pcm), sampleRate = 22050)
    assert(bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' && bytes(3) == 'C')
    val (sr, ch, out) = Flac.decode(bytes)
    assert(sr == 22050 && ch == 1)
    assert(out(0).sameElements(pcm))
  }

  test("stereo round trip: independent channels, exact") {
    val l = triangle(5000, 3)
    val r = triangle(5000, 11).map(v => -v)
    val bytes = Flac.encode(Array(l, r))
    val (_, ch, out) = Flac.decode(bytes)
    assert(ch == 2)
    assert(out(0).sameElements(l) && out(1).sameElements(r))
  }

  test("rice partitions: partition order 2 round-trips and shrinks nothing away") {
    val pcm = triangle(4096, 5)
    val p0 = Flac.encode(Array(pcm), partOrder = 0)
    val p2 = Flac.encode(Array(pcm), partOrder = 2)
    val (_, _, o0) = Flac.decode(p0)
    val (_, _, o2) = Flac.decode(p2)
    assert(o0(0).sameElements(pcm) && o2(0).sameElements(pcm))
  }

  test("noise stream survives via the raw escape (incompressible input)") {
    // LCG noise spans the full 16-bit range: rice would explode, the
    // escape keeps the frame bounded; decode stays exact
    var st = 12345
    val pcm = Array.fill(6000) {
      st = st * 1103515245 + 12345
      (st >> 16) & 0xffff match { case v => (v << 16) >> 16 }
    }
    val bytes = Flac.encode(Array(pcm))
    val (_, _, out) = Flac.decode(bytes)
    assert(out(0).sameElements(pcm))
  }

  test("lpc encoder: tonal fixture round-trips exactly and beats the fixed predictors") {
    // mid-frequency sine (ω = π/3): the order-2 LPC recursion
    // s[n] = 2cos(ω)s[n−1] − s[n−2] is EXACT for a sinusoid, while
    // every fixed polynomial predictor leaves a residual proportional
    // to the amplitude — the signal class LPC exists for. Mild LCG
    // dither keeps the stream from degenerating to CONSTANT runs.
    var st = 99
    val pcm = Array.tabulate(4096 * 2 + 500) { i =>
      st = st * 1103515245 + 12345
      val dither = (st >> 28) % 4
      (12000 * math.sin(i * math.Pi / 3)).toInt + dither
    }
    require(pcm.forall(v => v >= -32768 && v <= 32767))
    val fixed = Flac.encode(Array(pcm))
    val lpc = Flac.encode(Array(pcm), lpcOrder = 8)
    // lossless: the decoder's MD5 gate arbitrates both streams
    val (_, _, oF) = Flac.decode(fixed)
    val (_, _, oL) = Flac.decode(lpc)
    assert(oF(0).sameElements(pcm) && oL(0).sameElements(pcm))
    info(s"fixed=${fixed.length}B lpc=${lpc.length}B " +
      f"ratio=${lpc.length.toDouble / fixed.length}%.3f")
    assert(lpc.length < fixed.length,
      s"LPC should out-compress fixed predictors on a tonal signal: " +
        s"lpc=${lpc.length} fixed=${fixed.length}")
  }

  test("lpc encoder: exact-cost selection never loses to the default path") {
    // on every fixture class the exact-bit candidate search (which
    // includes all five fixed predictors) is ≤ the heuristic default;
    // noise and constants must round-trip through the LPC entry too
    for (pcm <- Seq(
        triangle(5000, 3),
        Array.fill(6000)(77),
        { var st = 5; Array.fill(5000) {
            st = st * 1103515245 + 12345; ((st >> 16) << 16) >> 16 } })) {
      val dflt = Flac.encode(Array(pcm))
      val sel = Flac.encode(Array(pcm), lpcOrder = 8)
      val (_, _, out) = Flac.decode(sel)
      assert(out(0).sameElements(pcm))
      assert(sel.length <= dflt.length,
        s"exact selection regressed: sel=${sel.length} dflt=${dflt.length}")
    }
  }

  test("stereo decorrelation encoder: correlated channels shrink, decode exact") {
    // R tracks L closely → side = L−R is tiny → decorrelated modes
    // out-compress independent channels; uncorrelated channels must
    // never LOSE to independent (the mode pick is min over exact bits
    // including independent itself)
    val l = triangle(4096 * 2 + 300, 4)
    var st = 17
    val rCorr = l.map { v =>
      st = st * 1103515245 + 12345
      math.max(-32768, math.min(32767, v + ((st >> 28) % 8)))
    }
    val indep = Flac.encode(Array(l, rCorr))
    val dec = Flac.encode(Array(l, rCorr), stereo = true)
    val (_, ch, out) = Flac.decode(dec)
    assert(ch == 2 && out(0).sameElements(l) && out(1).sameElements(rCorr))
    info(s"independent=${indep.length}B decorrelated=${dec.length}B")
    assert(dec.length < indep.length,
      s"decorrelation should win on correlated channels: ${dec.length} vs ${indep.length}")
    // uncorrelated: picks at worst the independent mode, stays exact
    val rUnc = triangle(l.length, 23).map(v => -v)
    val dec2 = Flac.encode(Array(l, rUnc), stereo = true)
    val (_, _, out2) = Flac.decode(dec2)
    assert(out2(0).sameElements(l) && out2(1).sameElements(rUnc))
    assert(dec2.length <= Flac.encode(Array(l, rUnc)).length)
    // and stereo + LPC compose (both opt-ins on, MD5 gate arbitrates)
    val both = Flac.encode(Array(l, rCorr), lpcOrder = 8, stereo = true)
    val (_, _, out3) = Flac.decode(both)
    assert(out3(0).sameElements(l) && out3(1).sameElements(rCorr))
    assert(both.length <= dec.length)
  }

  test("constant and near-constant blocks compress far below raw") {
    val pcm = Array.fill(8192)(1234)
    val bytes = Flac.encode(Array(pcm))
    assert(bytes.length < 8192 * 2 / 8,
      s"constant signal should collapse, got ${bytes.length} bytes")
    val (_, _, out) = Flac.decode(bytes)
    assert(out(0).sameElements(pcm))
  }

  /** Bit writer mirroring the encoder's (test-local, hand fixtures). */
  private final class TW {
    val out = new java.io.ByteArrayOutputStream
    private var acc = 0
    private var n = 0
    def put(v: Long, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >>> i) & 1L).toInt
        n += 1
        if (n == 8) { out.write(acc); acc = 0; n = 0 }
        i -= 1
      }
    }
    def putUnary(q: Int): Unit = { (0 until q).foreach(_ => put(0, 1)); put(1, 1) }
    def align(): Unit = while (n != 0) put(0, 1)
  }

  private def crc8(b: Array[Byte]): Int = {
    var c = 0
    b.foreach { x =>
      c ^= (x & 0xff)
      (0 until 8).foreach(_ => c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff)
    }
    c
  }
  private def crc16(b: Array[Byte]): Int = {
    var c = 0
    b.foreach { x =>
      c ^= (x & 0xff) << 8
      (0 until 8).foreach(_ => c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff else (c << 1) & 0xffff)
    }
    c
  }

  /** Hand-assemble a single-frame mono stream holding one LPC
    * subframe, per the spec's bit layout — the decoder path our
    * encoder (fixed predictors only) never emits. */
  test("hand-built LPC subframe reconstructs the spec formula exactly") {
    // order-2 LPC: coefficients c0=3, c1=-1, shift=1 →
    // s[n] = r[n] + ((3·s[n-1] − s[n-2]) >> 1)
    val warm = Array(100, 110)
    val res = Array(5, -3, 0, 7, -2, 1) // 6 residuals → block size 8
    val bs = 8
    val expect = new Array[Int](bs)
    expect(0) = warm(0); expect(1) = warm(1)
    for (i <- 2 until bs)
      expect(i) = res(i - 2) + ((3 * expect(i - 1) - expect(i - 2)) >> 1)

    val fw = new TW
    fw.put(0x3ffe, 14); fw.put(0, 1); fw.put(0, 1)
    fw.put(0x7, 4)  // 16-bit block size follows
    fw.put(0, 4)    // sample rate from STREAMINFO
    fw.put(0, 4)    // mono
    fw.put(0x4, 3)  // 16 bps
    fw.put(0, 1)
    fw.put(0, 8)    // UTF-8 frame number 0
    fw.put(bs - 1, 16)
    val head = fw.out.toByteArray
    fw.put(crc8(head), 8)
    // subframe: pad 0, type LPC order 2 (0b100000 | 1), no wasted bits
    fw.put(0, 1); fw.put(32 + 1, 6); fw.put(0, 1)
    fw.put(warm(0), 16); fw.put(warm(1), 16)
    fw.put(4 - 1, 4)  // precision 4 bits
    fw.put(1, 5)      // shift 1
    fw.put(3L & 0xf, 4); fw.put(-1L & 0xf, 4) // coefs, two's complement
    fw.put(0, 2)      // 4-bit rice
    fw.put(0, 4)      // partition order 0
    fw.put(2, 4)      // rice parameter 2
    res.foreach { r =>
      val f = if (r >= 0) 2L * r else -2L * r - 1
      fw.putUnary((f >>> 2).toInt); fw.put(f & 3, 2)
    }
    fw.align()
    val body = fw.out.toByteArray
    val frame = new java.io.ByteArrayOutputStream
    frame.write(body, 0, body.length)
    val c16 = crc16(body)
    frame.write((c16 >> 8) & 0xff); frame.write(c16 & 0xff)

    // STREAMINFO for 8 samples mono 16-bit @8000 Hz + matching MD5
    val md = java.security.MessageDigest.getInstance("MD5")
    expect.foreach { s => md.update((s & 0xff).toByte); md.update(((s >> 8) & 0xff).toByte) }
    val si = new TW
    si.put(4096, 16); si.put(4096, 16); si.put(0, 24); si.put(0, 24)
    si.put(8000, 20); si.put(0, 3); si.put(15, 5); si.put(bs.toLong, 36)
    val out = new java.io.ByteArrayOutputStream
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    out.write(si.out.toByteArray, 0, 18)
    out.write(md.digest(), 0, 16)
    out.write(frame.toByteArray)

    val (sr, ch, pcm) = Flac.decode(out.toByteArray)
    assert(sr == 8000 && ch == 1)
    assert(pcm(0).sameElements(expect),
      s"${pcm(0).toSeq} != ${expect.toSeq}")
  }

  /** Assemble a complete 2-channel single-frame stream with the given
    * channel assignment and verbatim subframes (side channel at 17
    * bits per the spec), plus STREAMINFO + MD5 of the expected L/R. */
  private def stereoFixture(chanAsn: Int, ch0: Array[Int], ch1: Array[Int],
                            bps0: Int, bps1: Int,
                            expectL: Array[Int], expectR: Array[Int]): Array[Byte] = {
    val bs = ch0.length
    val fw = new TW
    fw.put(0x3ffe, 14); fw.put(0, 1); fw.put(0, 1)
    fw.put(0x7, 4); fw.put(0, 4)
    fw.put(chanAsn, 4)
    fw.put(0x4, 3); fw.put(0, 1)
    fw.put(0, 8) // frame number 0
    fw.put(bs - 1, 16)
    val head = fw.out.toByteArray
    fw.put(crc8(head), 8)
    for ((ch, bps) <- Seq((ch0, bps0), (ch1, bps1))) {
      fw.put(0, 1); fw.put(1, 6); fw.put(0, 1) // VERBATIM, no wasted bits
      ch.foreach(v => fw.put(v.toLong & ((1L << bps) - 1), bps))
    }
    fw.align()
    val body = fw.out.toByteArray
    val frame = new java.io.ByteArrayOutputStream
    frame.write(body, 0, body.length)
    val c16 = crc16(body)
    frame.write((c16 >> 8) & 0xff); frame.write(c16 & 0xff)
    val md = java.security.MessageDigest.getInstance("MD5")
    for (i <- 0 until bs; s <- Seq(expectL(i), expectR(i))) {
      md.update((s & 0xff).toByte); md.update(((s >> 8) & 0xff).toByte)
    }
    val si = new TW
    si.put(4096, 16); si.put(4096, 16); si.put(0, 24); si.put(0, 24)
    si.put(8000, 20); si.put(1, 3); si.put(15, 5); si.put(bs.toLong, 36)
    val out = new java.io.ByteArrayOutputStream
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    out.write(si.out.toByteArray, 0, 18)
    out.write(md.digest(), 0, 16)
    out.write(frame.toByteArray)
    out.toByteArray
  }

  test("hand-built stereo decorrelation: mid/side, left/side, right/side") {
    // libFLAC's default stereo modes — the decoder legs our (subset,
    // independent-channels) encoder never emits; expected L/R worked
    // out by hand from the spec's reconstruction formulas, extremes
    // included (the mid channel drops a bit, side's LSB restores it)
    val l = Array(100, -50, 3, 32767)
    val r = Array(90, -60, 4, -32768)
    val mid = Array.tabulate(4)(i => (l(i) + r(i)) >> 1)
    val side = Array.tabulate(4)(i => l(i) - r(i))
    val ms = Flac.decode(stereoFixture(10, mid, side, 16, 17, l, r))
    assert(ms._3(0).sameElements(l) && ms._3(1).sameElements(r), "mid/side")
    val ls = Flac.decode(stereoFixture(8, l, side, 16, 17, l, r))
    assert(ls._3(0).sameElements(l) && ls._3(1).sameElements(r), "left/side")
    val rs = Flac.decode(stereoFixture(9, side, r, 17, 16, l, r))
    assert(rs._3(0).sameElements(l) && rs._3(1).sameElements(r), "right/side")
  }

  test("corruption fails loudly: frame CRC, MD5, magic, truncation") {
    val pcm = triangle(1000, 9)
    val bytes = Flac.encode(Array(pcm))
    // magic
    val bad0 = bytes.clone(); bad0(1) = 'X'
    intercept[IllegalArgumentException](Flac.decode(bad0))
    // flip a bit in the last frame body → CRC-16 or MD5 trips
    val bad1 = bytes.clone(); bad1(bytes.length - 10) = (bad1(bytes.length - 10) ^ 0x10).toByte
    intercept[IllegalArgumentException](Flac.decode(bad1))
    // flip a bit in the STREAMINFO MD5 → stream MD5 mismatch
    val bad2 = bytes.clone(); bad2(20) = (bad2(20) ^ 1).toByte
    intercept[IllegalArgumentException](Flac.decode(bad2))
    // truncate mid-frame
    intercept[Exception](Flac.decode(bytes.take(bytes.length - 40)))
  }
}
