package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Tar
import java.nio.charset.StandardCharsets.UTF_8

/** USTAR container: round trip, block/size arithmetic, header
  * checksum, corruption detection — and a cross-implementation golden
  * against GNU tar (listing AND extracted payload), the same posture
  * as PNG-vs-javax.imageio. */
class TarSpec extends AnyFunSuite {

  private def mk(entries: (String, String)*): Array[Byte] =
    Tar.encode(entries.map { case (n, t) => (n, t.getBytes(UTF_8)) })

  test("round trip preserves names, order, and payload bytes") {
    val in = Seq(
      "000000000001.txt" -> "hello tar",
      "000000000002.txt" -> "",                   // empty member
      "000000000003.txt" -> ("x" * 512),          // exact block boundary
      "000000000004.txt" -> ("y" * 513),          // one past the boundary
      "unicode.txt"      -> "héllo wörld ✓")
    val dec = Tar.decode(mk(in: _*))
    assert(dec.map(_._1) == in.map(_._1))
    assert(dec.map(p => new String(p._2, UTF_8)) == in.map(_._2))
  }

  test("archive size follows USTAR arithmetic exactly") {
    // header 512 + payload padded to 512, per member, + 1024 trailer
    def expected(sizes: Seq[Int]): Int =
      sizes.map(n => 512 + (n + 511) / 512 * 512).sum + 1024
    for (sizes <- Seq(Seq(0), Seq(1), Seq(511, 512, 513), Seq(100, 0, 1000))) {
      val bytes = Tar.encode(sizes.zipWithIndex.map { case (n, i) =>
        (s"m$i", Array.fill[Byte](n)(('a' + i % 26).toByte)) })
      assert(bytes.length == expected(sizes), s"sizes=$sizes")
    }
  }

  test("corrupted payload or header fails the checksum/magic gate") {
    val good = mk("a.txt" -> "some content here")
    // flip a byte inside the HEADER (name field) -> checksum mismatch
    val badHdr = good.clone(); badHdr(3) = (badHdr(3) ^ 0x01).toByte
    intercept[IllegalArgumentException](Tar.decode(badHdr))
    // wreck the magic
    val badMagic = good.clone(); badMagic(257) = 'X'.toByte
    intercept[IllegalArgumentException](Tar.decode(badMagic))
    // truncation: drop the trailer
    intercept[IllegalArgumentException](
      Tar.decode(good.take(good.length - 1025)))
  }

  test("golden: GNU tar lists and extracts our archives byte-exactly") {
    val tarBin = new java.io.File("/usr/bin/tar")
    assume(tarBin.canExecute, "system tar not present")
    val dir = java.nio.file.Files.createTempDirectory("tarspec")
    val f = dir.resolve("a.tar")
    val body = "the quick brown fox\njumps over 13 lazy dogs\n"
    java.nio.file.Files.write(f,
      mk("docs/one.txt" -> body, "docs/two.txt" -> "second member"))
    def run(args: String*): String = {
      val p = new ProcessBuilder(args: _*).redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes(), UTF_8)
      assert(p.waitFor() == 0, s"${args.mkString(" ")} failed:\n$out")
      out
    }
    val listing = run("/usr/bin/tar", "-tf", f.toString)
    assert(listing.linesIterator.toSeq == Seq("docs/one.txt", "docs/two.txt"))
    val extracted = run("/usr/bin/tar", "-xOf", f.toString, "docs/one.txt")
    assert(extracted == body)
  }

  test("golden: we decode what GNU tar encodes (ustar format)") {
    val tarBin = new java.io.File("/usr/bin/tar")
    assume(tarBin.canExecute, "system tar not present")
    val dir = java.nio.file.Files.createTempDirectory("tarspec2")
    val payload = "written by gnu tar\n" * 40
    java.nio.file.Files.write(dir.resolve("member.txt"), payload.getBytes(UTF_8))
    val p = new ProcessBuilder("/usr/bin/tar", "--format=ustar", "-cf",
      dir.resolve("g.tar").toString, "-C", dir.toString, "member.txt").start()
    assert(p.waitFor() == 0)
    val dec = Tar.decode(java.nio.file.Files.readAllBytes(dir.resolve("g.tar")))
    assert(dec.map(_._1) == Seq("member.txt"))
    assert(new String(dec.head._2, UTF_8) == payload)
  }

  test("tar.gz: gz round trip equals the plain decode and compresses") {
    val entries = Seq(
      "a.txt" -> ("lorem ipsum " * 50).getBytes(UTF_8),
      "b.txt" -> "short".getBytes(UTF_8))
    val gz = Tar.encodeGz(entries)
    // RFC 1952 magic + deflate method
    assert((gz(0) & 0xff) == 0x1f && (gz(1) & 0xff) == 0x8b && gz(2) == 8)
    assert(gz.length < Tar.encode(entries).length, "gzip did not compress")
    assert(Tar.gunzip(gz).sameElements(Tar.encode(entries)))
    val dec = Tar.decodeGz(gz)
    assert(dec.map(_._1) == entries.map(_._1))
    assert(dec.zip(entries).forall { case ((_, a), (_, b)) => a.sameElements(b) })
    // a truncated gz stream fails loudly, not quietly short
    intercept[Exception](Tar.decodeGz(gz.take(gz.length - 5)))
  }

  test("tar.gz: trailing garbage and concatenated members fail loudly") {
    val gz = Tar.encodeGz(Seq("a.txt" -> "payload".getBytes(UTF_8)))
    // junk suffix after the member (GZIPInputStream would swallow this)
    val junk = gz ++ Array[Byte](1, 2, 3)
    val eJunk = intercept[IllegalArgumentException](Tar.gunzip(junk))
    assert(eJunk.getMessage.contains("trailing bytes"))
    // a concatenated second member would silently vanish under the JDK
    // stream's multi-member decode — it must be rejected, not merged
    val eCat = intercept[IllegalArgumentException](Tar.gunzip(gz ++ gz))
    assert(eCat.getMessage.contains("trailing bytes"))
    // a flipped CRC trailer byte fails the trailer verification
    val badCrc = gz.clone()
    badCrc(gz.length - 8) = (badCrc(gz.length - 8) ^ 0x01).toByte
    intercept[IllegalArgumentException](Tar.gunzip(badCrc))
    // clean member still inflates after all the guards
    assert(Tar.gunzip(gz).sameElements(
      Tar.encode(Seq("a.txt" -> "payload".getBytes(UTF_8)))))
  }

  test("golden: GNU tar -z reads our .tar.gz; we decode GNU's .tar.gz") {
    val tarBin = new java.io.File("/usr/bin/tar")
    assume(tarBin.canExecute, "system tar not present")
    val dir = java.nio.file.Files.createTempDirectory("targz")
    val body = "compressed shard member body\n" * 30
    java.nio.file.Files.write(dir.resolve("ours.tar.gz"),
      Tar.encodeGz(Seq("shard/doc.txt" -> body.getBytes(UTF_8))))
    def run(args: String*): String = {
      val p = new ProcessBuilder(args: _*).redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes(), UTF_8)
      assert(p.waitFor() == 0, s"${args.mkString(" ")} failed:\n$out")
      out
    }
    assert(run("/usr/bin/tar", "-tzf", dir.resolve("ours.tar.gz").toString)
      .linesIterator.toSeq == Seq("shard/doc.txt"))
    assert(run("/usr/bin/tar", "-xzOf", dir.resolve("ours.tar.gz").toString,
      "shard/doc.txt") == body)
    // and the reverse: GNU writes, we decode
    java.nio.file.Files.write(dir.resolve("member.txt"), body.getBytes(UTF_8))
    val p = new ProcessBuilder("/usr/bin/tar", "--format=ustar", "-czf",
      dir.resolve("g.tar.gz").toString, "-C", dir.toString, "member.txt").start()
    assert(p.waitFor() == 0)
    val dec = Tar.decodeGz(
      java.nio.file.Files.readAllBytes(dir.resolve("g.tar.gz")))
    assert(dec.map(_._1) == Seq("member.txt"))
    assert(new String(dec.head._2, UTF_8) == body)
  }
}
