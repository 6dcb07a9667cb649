package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Zip
import java.nio.charset.StandardCharsets.UTF_8

/** PKZIP container: round trip, CRC gate, and cross-implementation
  * goldens in BOTH directions against the JDK's own java.util.zip —
  * the PNG-vs-javax.imageio posture for archives. */
class ZipSpec extends AnyFunSuite {

  private def mk(entries: (String, String)*): Array[Byte] =
    Zip.encode(entries.map { case (n, t) => (n, t.getBytes(UTF_8)) })

  test("round trip preserves names, order, and payload bytes") {
    val in = Seq(
      "000000000001.txt" -> "hello zip",
      "empty.txt"        -> "",
      "big.txt"          -> ("lorem ipsum " * 400), // compressible
      "uni/cøde.txt"     -> "héllo wörld ✓")
    val dec = Zip.decode(mk(in: _*))
    assert(dec.map(_._1) == in.map(_._1))
    assert(dec.map(p => new String(p._2, UTF_8)) == in.map(_._2))
  }

  test("corrupted payload fails the CRC gate; bad EOCD fails loudly") {
    val good = mk("a.txt" -> ("content that compresses " * 50))
    // flip a byte in the middle of the deflate stream
    val bad = good.clone(); bad(60) = (bad(60) ^ 0x40).toByte
    intercept[Exception](Zip.decode(bad))
    intercept[IllegalArgumentException](Zip.decode(good.take(10)))
  }

  test("golden: java.util.zip reads our archives byte-exactly") {
    val body = "the quick brown fox jumps over the lazy dog\n" * 20
    val bytes = mk("docs/one.txt" -> body, "docs/two.txt" -> "second")
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val got = Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
      .map(e => (e.getName, new String(zin.readAllBytes(), UTF_8))).toSeq
    assert(got == Seq("docs/one.txt" -> body, "docs/two.txt" -> "second"))
    // and via ZipFile (central-directory path, like unzip -l)
    val f = java.nio.file.Files.createTempFile("zipspec", ".zip")
    java.nio.file.Files.write(f, bytes)
    val zf = new java.util.zip.ZipFile(f.toFile)
    try {
      val e = zf.getEntry("docs/one.txt")
      assert(e.getSize == body.getBytes(UTF_8).length)
      assert(new String(zf.getInputStream(e).readAllBytes(), UTF_8) == body)
    } finally zf.close()
  }

  test("golden: we read what java.util.zip writes (deflated and stored)") {
    val bos = new java.io.ByteArrayOutputStream()
    val zout = new java.util.zip.ZipOutputStream(bos)
    val body = "written by the jdk\n" * 30
    zout.putNextEntry(new java.util.zip.ZipEntry("member.txt"))
    zout.write(body.getBytes(UTF_8)); zout.closeEntry()
    // a STORED entry exercises method 0 on our reader
    val storedData = "stored, not deflated".getBytes(UTF_8)
    val se = new java.util.zip.ZipEntry("stored.txt")
    se.setMethod(java.util.zip.ZipOutputStream.STORED)
    se.setSize(storedData.length)
    se.setCompressedSize(storedData.length)
    val crc = new java.util.zip.CRC32; crc.update(storedData)
    se.setCrc(crc.getValue)
    zout.putNextEntry(se); zout.write(storedData); zout.closeEntry()
    zout.close()
    val dec = Zip.decode(bos.toByteArray)
    assert(dec.map(_._1) == Seq("member.txt", "stored.txt"))
    assert(new String(dec(0)._2, UTF_8) == body)
    assert(new String(dec(1)._2, UTF_8) == "stored, not deflated")
  }
}
