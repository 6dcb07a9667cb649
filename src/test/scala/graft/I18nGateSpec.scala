package graft

import org.apache.spark.sql.functions._
import graft.ops.{Hashing, TextOps}

/** The multilingual oracle-gate derivation (TextOps.textI18n + the
  * `uchr` expression): pins the exact codepoint arithmetic the DuckDB
  * twin replays, the NFC parity-twin merge law the q_dedup_nfc gate
  * rides, and the Latin-1 row asymmetry that silently broke merging in
  * the first cut (e-row packs diaeresis at +3; a-row skips ã so it
  * lands at +4 — getting that wrong produced ì for ë, and both engines
  * agreed on the wrong bytes, so only the MERGE law catches it). */
class I18nGateSpec extends SparkSpec {
  import spark.implicits._

  test("uchr: codepoint-native (builtin chr is mod-256 byte-bound)") {
    val r = spark.range(1).select(
      call_function("uchr", lit(0x4E16L)).as("han"),
      call_function("uchr", lit(0x00EBL)).as("edia"),
      call_function("uchr", lit(0x0301L)).as("comb"),
      call_function("uchr", lit(0x1F600L)).as("supp"), // surrogate pair
      call_function("uchr", lit(97L)).as("ascii")).head()
    assert(r.getString(0) == "世")
    assert(r.getString(1) == "ë")
    assert(r.getString(2) == "́")
    assert(r.getString(3) == new String(Character.toChars(0x1F600)))
    assert(r.getString(4) == "a")
  }

  test("uchr: out-of-range longs fail loudly, never truncate (round-10 advice)") {
    // 2^32 + 97 used to silently narrow to 'a'; surrogate halves and
    // beyond-U+10FFFF values surfaced a bare toChars exception
    def boom(cp: Long): String = intercept[Exception] {
      spark.range(1).select(call_function("uchr", lit(cp))).head()
    }.getMessage
    assert(boom(4294967393L).contains("not a valid Unicode codepoint"))
    assert(boom(-1L).contains("not a valid Unicode codepoint"))
    assert(boom(0x110000L).contains("not a valid Unicode codepoint"))
    assert(boom(0xD800L).contains("not a valid Unicode codepoint"))
    // boundary values still work
    val ok = spark.range(1).select(
      call_function("uchr", lit(0x10FFFFL)).as("mx"),
      call_function("uchr", lit(0L)).as("nul")).head()
    assert(ok.getString(0) == new String(Character.toChars(0x10FFFF)))
    assert(ok.getString(1) == "\u0000")
  }

  test("textI18n: JVM replay of the shift/mod arithmetic is byte-exact") {
    // independent scalar replay of the derivation (same 60-bit hash)
    def replay(text: String, docId: Long): String = {
      val h = Hashing.h64(text)
      val sb = new StringBuilder(text)
      if ((h >> 35) % 4 != 3) {
        sb += ' '
        sb += (97 + ((h >> 27) % 16)).toChar
        sb += (97 + ((h >> 31) % 16)).toChar
        val mark = (h % 4).toInt
        val vowelE = ((h >> 2) % 2).toInt
        if (docId % 2 == 1) {
          sb += (97 + vowelE * 4).toChar
          sb += (768 + (if (mark == 3) 8 else mark)).toChar
        } else if (vowelE == 1) sb += (232 + mark).toChar
        else sb += (224 + (if (mark == 3) 4 else mark)).toChar
      }
      if ((h >> 37) % 4 != 3) {
        sb += ' '
        sb += (19968 + ((h >> 3) % 512)).toChar
        sb += (12354 + ((h >> 21) % 64)).toChar
        sb += (19968 + ((h >> 12) % 512)).toChar
      }
      sb.result()
    }
    val texts = (0 until 64).map(i => (i.toLong, s"sample doc $i with words"))
    val got = texts.toDF("doc_id", "text")
      .select($"doc_id", $"text",
        TextOps.textI18n($"text", $"doc_id").as("t18"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    got.foreach { case (id, t, t18) =>
      assert(t18 == replay(t, id), s"doc $id derivation drifted")
    }
    // the derivation must actually leave ASCII on a healthy fraction
    val nonAscii = got.count { case (_, _, t) => t.exists(_ > 127) }
    assert(nonAscii > got.length / 2, s"only $nonAscii non-ASCII rows")
  }

  test("parity-twin NFC merge law: composed and decomposed encodings unify") {
    // every text twice, with ODD-offset re-keys (the q_dedup_nfc shape):
    // accent rows are byte-different across the parity pair yet
    // NFC-identical; CJK-only rows are byte-identical
    val texts = (0 until 128).map(i => s"twin fixture $i body")
    val rows = texts.zipWithIndex.flatMap { case (t, i) =>
      Seq((i.toLong, t), (i.toLong + 10000001L, t)) }
    val got = rows.toDF("doc_id", "text")
      .select($"doc_id", $"text",
        TextOps.textI18n($"text", $"doc_id").as("t18"),
        call_function("nfc_normalize",
          TextOps.textI18n($"text", $"doc_id")).as("nfc"))
      .collect()
      .map(r => (r.getLong(0) % 10000001L, r.getString(2), r.getString(3)))
      .groupBy(_._1).values.toSeq
    var merged = 0
    got.foreach { pair =>
      assert(pair.length == 2)
      val Seq(a, b) = pair.toSeq
      assert(a._3 == b._3, s"parity twins must be NFC-equal: ${a._2} / ${b._2}")
      if (a._2 != b._2) merged += 1
    }
    // ~75% of texts carry the accent suffix → byte-different twins
    assert(merged > texts.length / 2, s"only $merged byte-different NFC merges")
  }

  test("Latin-1 row asymmetry regression pin: e+diaeresis composes to U+00EB") {
    // mark=3 (diaeresis): a-row composed target is U+00E4 (+4, ã skipped),
    // e-row target is U+00EB (+3, packed). U+00EC is ì — the bug's output.
    val r = spark.range(1).select(
      call_function("nfc_normalize", concat(lit("e"),
        call_function("uchr", lit(0x0308L)))).as("e"),
      call_function("nfc_normalize", concat(lit("a"),
        call_function("uchr", lit(0x0308L)))).as("a")).head()
    assert(r.getString(0) == "ë", "e+̈ must compose to ë (not ì)")
    assert(r.getString(1) == "ä")
  }
}
