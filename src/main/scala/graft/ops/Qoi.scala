package graft.ops

/** QOI ("Quite OK Image") codec — pure JVM, written from the public
  * one-page specification (qoiformat.org, "Specification" PDF).
  * Third compressed image family next to PNG (filters + DEFLATE) and
  * GIF (LZW): QOI is a byte-aligned single-pass format whose five ops
  * cover run-length (RUN), a 64-slot recent-color hash table (INDEX),
  * small per-channel deltas (DIFF), green-anchored deltas (LUMA) and
  * literal pixels (RGB). LOSSLESS, so `q_qoi_features` oracles the
  * decoded pixel sums with no tolerance band, exactly like PNG/GIF.
  *
  * Scope: RGB (channels=3, alpha fixed 255), which also keeps every
  * emitted chunk standard — a reference decoder reproduces our
  * pixels bit-for-bit. Deltas are computed without wraparound on the
  * encode side (out-of-range pairs fall through to LUMA/RGB — still
  * canonical ops); the decoder masks to a byte, so reference-encoded
  * files with wrapped deltas decode correctly too. */
object Qoi {

  @inline private def hash(r: Int, g: Int, b: Int, a: Int): Int =
    (r * 3 + g * 5 + b * 7 + a * 11) % 64

  /** Encode top-down row-major RGB triples (0..255) into QOI. */
  def encode(w: Int, h: Int, rgb: Array[Int]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"qoi encode: ${rgb.length} != ${w}x$h*3")
    val out = new java.io.ByteArrayOutputStream(22 + w * h)
    def u32(v: Int): Unit = {
      out.write(v >>> 24); out.write((v >> 16) & 0xff)
      out.write((v >> 8) & 0xff); out.write(v & 0xff)
    }
    out.write('q'); out.write('o'); out.write('i'); out.write('f')
    u32(w); u32(h)
    out.write(3) // channels
    out.write(0) // colorspace: sRGB w/ linear alpha
    val tr = new Array[Int](64); val tg = new Array[Int](64)
    val tb = new Array[Int](64); val ta = new Array[Int](64)
    var pr = 0; var pg = 0; var pb = 0 // previous pixel; alpha fixed 255
    var run = 0
    val n = w * h
    var p = 0
    var i = 0
    while (i < n) {
      val r = rgb(p); val g = rgb(p + 1); val b = rgb(p + 2); p += 3
      if (r == pr && g == pg && b == pb) {
        run += 1
        if (run == 62) { out.write(0xc0 | (run - 1)); run = 0 }
      } else {
        if (run > 0) { out.write(0xc0 | (run - 1)); run = 0 }
        val hx = hash(r, g, b, 255)
        if (tr(hx) == r && tg(hx) == g && tb(hx) == b && ta(hx) == 255) {
          out.write(hx) // OP_INDEX (top bits 00)
        } else {
          tr(hx) = r; tg(hx) = g; tb(hx) = b; ta(hx) = 255
          val dr = r - pr; val dg = g - pg; val db = b - pb
          if (dr >= -2 && dr <= 1 && dg >= -2 && dg <= 1 && db >= -2 && db <= 1) {
            out.write(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
          } else {
            val vgr = dr - dg; val vgb = db - dg
            if (dg >= -32 && dg <= 31 && vgr >= -8 && vgr <= 7
              && vgb >= -8 && vgb <= 7) {
              out.write(0x80 | (dg + 32))
              out.write(((vgr + 8) << 4) | (vgb + 8))
            } else {
              out.write(0xfe); out.write(r); out.write(g); out.write(b)
            }
          }
        }
        pr = r; pg = g; pb = b
      }
      i += 1
    }
    if (run > 0) out.write(0xc0 | (run - 1))
    var z = 0
    while (z < 7) { out.write(0); z += 1 }
    out.write(1) // end marker 00×7 01
    out.toByteArray
  }

  /** Decode QOI → (w, h, top-down row-major RGB). Accepts channels 3
    * or 4 (alpha decoded, then dropped — the table hash still uses
    * it, as the spec requires). */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    require(bytes.length >= 22 && bytes(0) == 'q' && bytes(1) == 'o'
      && bytes(2) == 'i' && bytes(3) == 'f', "qoi: bad magic")
    def u32(off: Int): Int =
      ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
        ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
    val w = u32(4); val h = u32(8)
    val ch = bytes(12) & 0xff
    require(w > 0 && h > 0 && (ch == 3 || ch == 4), s"qoi: bad header $w $h $ch")
    val n = w * h
    val out = new Array[Int](n * 3)
    val tr = new Array[Int](64); val tg = new Array[Int](64)
    val tb = new Array[Int](64); val ta = new Array[Int](64)
    var pr = 0; var pg = 0; var pb = 0; var pa = 255
    var pos = 14
    var run = 0
    var i = 0
    while (i < n) {
      if (run > 0) run -= 1
      else {
        val b0 = bytes(pos) & 0xff; pos += 1
        if (b0 == 0xfe) {
          pr = bytes(pos) & 0xff; pg = bytes(pos + 1) & 0xff
          pb = bytes(pos + 2) & 0xff; pos += 3
        } else if (b0 == 0xff) {
          pr = bytes(pos) & 0xff; pg = bytes(pos + 1) & 0xff
          pb = bytes(pos + 2) & 0xff; pa = bytes(pos + 3) & 0xff; pos += 4
        } else (b0 >> 6) match {
          case 0 =>
            pr = tr(b0); pg = tg(b0); pb = tb(b0); pa = ta(b0)
          case 1 =>
            pr = (pr + ((b0 >> 4) & 3) - 2) & 0xff
            pg = (pg + ((b0 >> 2) & 3) - 2) & 0xff
            pb = (pb + (b0 & 3) - 2) & 0xff
          case 2 =>
            val vg = (b0 & 0x3f) - 32
            val b1 = bytes(pos) & 0xff; pos += 1
            pr = (pr + vg + ((b1 >> 4) & 0xf) - 8) & 0xff
            pb = (pb + vg + (b1 & 0xf) - 8) & 0xff
            pg = (pg + vg) & 0xff
          case _ =>
            run = b0 & 0x3f // this pixel + `run` more
        }
        val hx = hash(pr, pg, pb, pa)
        tr(hx) = pr; tg(hx) = pg; tb(hx) = pb; ta(hx) = pa
      }
      out(i * 3) = pr; out(i * 3 + 1) = pg; out(i * 3 + 2) = pb
      i += 1
    }
    require(pos + 8 <= bytes.length, "qoi: truncated before end marker")
    (w, h, out)
  }
}
