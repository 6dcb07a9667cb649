package graft

import graft.ops.Multimodal

/** IMA/DVI ADPCM (WAV format 0x11): the predictive codec. Pins
  * (1) decode∘encode ≡ an independent spelling of the closed-loop
  * encoder simulation (the same state machine `q_adpcm_features`'
  * recursive-CTE oracle replays), on random full-range noise, smooth
  * ramps, and constant signals; (2) block-boundary checkpointing
  * (first sample of every 505-block decodes EXACTLY, step index
  * carries across); (3) container plumbing (fact-chunk length,
  * detectFormat routing, partial final block); (4) golden bytes for
  * a pinned input. */
class AdpcmSpec extends SparkSpec {

  /** Independent transliteration of the recursive-CTE oracle's state
    * machine: successive step/2^k magnitude quantize, vpdiff
    * reconstruction, int16 clamp, index-table walk. */
  private def oracleDecoded(samples: Array[Int], spb: Int = 505): Array[Int] = {
    val step = Multimodal.adpcmStepTable
    val itab = Multimodal.adpcmIndexTable
    val out = new Array[Int](samples.length)
    var pred = 0
    var idx = 0
    var i = 0
    while (i < samples.length) {
      if (i % spb == 0) { pred = samples(i); out(i) = pred }
      else {
        val st = step(idx)
        val d0 = samples(i) - pred
        val neg = d0 < 0
        var ad = if (neg) -d0 else d0
        var delta = 0
        if (ad >= st) { delta = 4; ad -= st }
        if (ad >= (st >> 1)) { delta |= 2; ad -= st >> 1 }
        if (ad >= (st >> 2)) delta |= 1
        var vp = st >> 3
        if ((delta & 4) != 0) vp += st
        if ((delta & 2) != 0) vp += st >> 1
        if ((delta & 1) != 0) vp += st >> 2
        pred = if (neg) pred - vp else pred + vp
        if (pred > 32767) pred = 32767 else if (pred < -32768) pred = -32768
        idx = math.max(0, math.min(88, idx + itab(delta)))
        out(i) = pred
      }
      i += 1
    }
    out
  }

  private def noise(n: Int, seed: Long): Array[Int] =
    Array.tabulate(n)(i => ((seed * 40503L + i.toLong * 2654435761L) % 65536L - 32768L).toInt)

  test("round trip equals the oracle state machine on noise, ramps, constants") {
    val cases = Seq(
      noise(1024, 3),                                   // 3 blocks, full range
      noise(505, 7),                                    // exactly one block
      noise(506, 11),                                   // one nibble into block 2
      Array.tabulate(900)(i => i * 36 - 16000),         // smooth ramp
      Array.fill(700)(1234),                            // constant
      Array.tabulate(1024)(i => if (i % 2 == 0) 32767 else -32768)) // worst case
    for (samples <- cases) {
      val wav = Multimodal.encodeWavAdpcm(samples, 8000)
      val (sr, got) = Multimodal.decodeWav(wav)
      assert(sr == 8000 && got.length == samples.length)
      val want = oracleDecoded(samples)
      var i = 0
      while (i < samples.length) {
        assert(got(i) == want(i), s"i=$i got=${got(i)} oracle=${want(i)}")
        i += 1
      }
    }
  }

  test("block starts decode exactly; index carries across the boundary") {
    val samples = noise(1024, 42)
    val (_, got) = Multimodal.decodeWav(Multimodal.encodeWavAdpcm(samples, 8000))
    assert(got(0) == samples(0) && got(505) == samples(505) && got(1010) == samples(1010))
    // index carry: decoding block 2 with a RESET index must differ
    // (full-range noise drives the index high by i=505; a fresh 0
    // index cannot reproduce the same quantization path)
    val iso = oracleDecoded(samples.slice(505, 1010), spb = 505)
    val cont = got.slice(505, 1010)
    assert(!iso.sameElements(cont),
      "block 2 decoded identically with a reset index — carry not exercised")
  }

  test("quantizer tracks: error bounded by the current step on smooth signals") {
    // a ramp with |Δ| below the mid-table step keeps the quantizer in
    // lock; decoded error stays under one max step of the signal's
    // operating range (coarse sanity that the predictor FOLLOWS)
    val samples = Array.tabulate(2000)(i => (math.sin(i / 40.0) * 12000).toInt)
    val (_, got) = Multimodal.decodeWav(Multimodal.encodeWavAdpcm(samples, 8000))
    var worst = 0
    var i = 10 // skip attack transient
    while (i < samples.length) {
      worst = math.max(worst, math.abs(got(i) - samples(i))); i += 1
    }
    assert(worst < 2000, s"lock lost: worst tracking error $worst")
  }

  test("container: fact-length partial block, detectFormat, feature routing") {
    val samples = noise(777, 5) // partial final block (777 = 505 + 272)
    val wav = Multimodal.encodeWavAdpcm(samples, 16000)
    assert(Multimodal.detectFormat(wav) == "wav")
    val (sr, got) = Multimodal.decodeWav(wav)
    assert(sr == 16000 && got.length == 777)
    val (n, rate, _) = Multimodal.decodeFeatures(wav)
    assert(n == 777 && rate == 16000)
    // container size: 2 blocks of 256 bytes + 60-byte header
    assert(wav.length == 60 + 2 * 256)
  }

  test("golden: pinned bytes for a fixed 8-sample input") {
    val wav = Multimodal.encodeWavAdpcm(Array(0, 100, -200, 300, -400, 500, 32767, -32768), 8000)
    // header predictor = 0, index 0; then 7 nibbles (low-first pairs)
    assert((wav(20) & 0xff) == 0x11, "format tag")
    assert((wav(48) & 0xff) == 8, "fact sample count")
    val data = wav.slice(60, 68).map(_ & 0xff).toSeq
    // block header: pred=0 (2 bytes), idx=0, reserved
    assert(data.take(4) == Seq(0, 0, 0, 0))
    val (_, got) = Multimodal.decodeWav(wav)
    assert(got.toSeq == oracleDecoded(Array(0, 100, -200, 300, -400, 500, 32767, -32768)).toSeq)
  }
}
