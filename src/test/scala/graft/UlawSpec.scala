package graft

import graft.ops.Multimodal

/** G.711 µ-law: exhaustive sweep against an independent spelling of
  * the oracle formulas, golden vs javax.sound, WAV round trip. */
class UlawSpec extends SparkSpec {

  /** Independent transliteration of the SQL-oracle compander (range
    * CASE for the segment, arithmetic shifts) — the spelling
    * `q_ulaw_features`' DuckDB oracle executes. */
  private def oracleRoundTrip(v: Int): Int = {
    val neg = v < 0
    val mag = math.min(math.abs(v.toLong), 32635L).toInt + 132
    val e =
      if (mag >= 16384) 7 else if (mag >= 8192) 6 else if (mag >= 4096) 5
      else if (mag >= 2048) 4 else if (mag >= 1024) 3 else if (mag >= 512) 2
      else if (mag >= 256) 1 else 0
    val d = ((((mag >> (e + 3)) & 15) * 8 + 132) << e) - 132
    if (neg) -d else d
  }

  test("exhaustive: codec round trip equals the oracle spelling on all 65536 inputs") {
    var v = -32768
    while (v <= 32767) {
      val got = Multimodal.ulawDecode(Multimodal.ulawEncode(v))
      val want = oracleRoundTrip(v)
      assert(got == want, s"v=$v got=$got oracle=$want")
      // quantization error bound: top segment step is 2^(7+3)/2^3=...
      // the largest mantissa step is 8<<7 = 1024, so |err| < 1024
      assert(math.abs(got - math.max(-32635, math.min(32635, v))) < 1024,
        s"v=$v decoded $got outside the segment error bound")
      v += 1
    }
  }

  test("codes are 8-bit and idempotent through a second compander pass") {
    // decode output is a quantization fixed point: re-encoding a
    // decoded value must reproduce the same code (standard compander
    // law; guards segment boundary off-by-ones)
    var c = 0
    while (c < 256) {
      val s = Multimodal.ulawDecode(c)
      val c2 = Multimodal.ulawEncode(s)
      assert(Multimodal.ulawDecode(c2) == s, s"code $c not a fixed point")
      c += 1
    }
  }

  test("golden: javax.sound expands our µ-law WAV to the same PCM") {
    val samples = Array.tabulate(1000)(i => ((i * 2654435761L) % 65536L - 32768L).toInt)
    val wav = Multimodal.encodeWavUlaw(samples, 8000)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(in.getFormat.getEncoding ==
      javax.sound.sampled.AudioFormat.Encoding.ULAW)
    val pcmFmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, false)
    val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(pcmFmt, in)
    val buf = pcm.readAllBytes()
    assert(buf.length == samples.length * 2)
    val (_, mine) = Multimodal.decodeWav(wav)
    var i = 0
    while (i < samples.length) {
      val ref = ((buf(2 * i) & 0xff) | (buf(2 * i + 1) << 8)).toShort.toInt
      assert(ref == mine(i),
        s"sample $i: javax.sound=$ref ours=${mine(i)} (in=${samples(i)})")
      i += 1
    }
  }

  test("WAV container: format-7 round trip and decodeFeatures routing") {
    val samples = Array(-32768, -32635, -133, -132, -1, 0, 1, 131, 132, 32635, 32767)
    val wav = Multimodal.encodeWavUlaw(samples, 16000)
    assert(Multimodal.detectFormat(wav) == "wav")
    val (sr, out) = Multimodal.decodeWav(wav)
    assert(sr == 16000 && out.length == samples.length)
    assert(out.toSeq == samples.map(s =>
      Multimodal.ulawDecode(Multimodal.ulawEncode(s))).toSeq)
    val (n, rate, _) = Multimodal.decodeFeatures(wav)
    assert(n == samples.length && rate == 16000)
  }
}
