package graft

import org.apache.spark.sql.functions._
import graft.ops.{DataQueries, DedupOps}

/** Behavioral checks for the round-3 corpus operators: passage-level
  * exact dedup (chunk-hash stats), the bigram-LM quality score (pinned
  * against a hand-computed fixture), and token-budget selection
  * invariants.
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("passage stats: exact-copy docs are fully duplicated, unique docs clean") {
    // docs 1 and 2 are byte-identical (every aligned passage repeats);
    // doc 3 shares no 4-token window with them
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j"),
      (3L, "q r s t u v w x y z")
    ).toDF("doc_id", "text")
    val out = DedupOps.passageStats(docs, "doc_id", "text", w = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((3L, 3L, 1.0)), s"copy A: ${out(1L)}")
    assert(out(2L) == ((3L, 3L, 1.0)), s"copy B: ${out(2L)}")
    assert(out(3L) == ((3L, 0L, 0.0)), s"unique: ${out(3L)}")
  }

  test("windowed dedup cap: a duplication storm drops its stop-shingles, the rest survive") {
    // the crawl re-visit regime ScaleProbe measured at 10×: many
    // copies of one page land in one batch. Uncapped, their shared
    // (shingle, batch) keys fan out quadratically; capped (docFreq > 4
    // in-window), every storm shingle drops so the storm contributes
    // ZERO candidate pairs — while an unrelated small near-dup pair in
    // the same window is untouched (its keys sit under the cap).
    val storm = (0 until 20).map(i =>
      (i * 10L, "alpha beta gamma delta epsilon zeta")) // all batch 0
    val pair = Seq(
      (1L, "one two three four five six"),   // batch 1
      (2L, "one two three four five seven")) // batch 2, adjacent window
    val docs = (storm ++ pair).toDF("doc_id", "text")
    val un = DataQueries.windowedPairsOf(docs, None)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val cap = DataQueries.windowedPairsOf(docs, Some(4L))
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(un.length == 20 * 19 / 2 + 1, s"uncapped: ${un.length}")
    assert(cap.toSeq == Seq((1L, 2L)),
      s"capped kept the storm or lost the honest pair: ${cap.toSeq}")
  }

  test("CDC chunks survive a head insertion that blinds fixed windows") {
    import graft.ops.Hashing
    // pick boundary/non-boundary words by their actual h64 (mod 8)
    val words = (0 until 400).map(i => s"w$i")
    val bnd = words.filter(w => Hashing.h64(w) % 8 == 0)
    val plain = words.filterNot(w => Hashing.h64(w) % 8 == 0)
    assert(bnd.size >= 2 && plain.size >= 6, "fixture vocabulary too small")
    val (b1, b2) = (bnd(0), bnd(1))
    val Seq(a1, a2, a3, a4, a5, x) = plain.take(6)
    val docA = s"$a1 $a2 $b1 $a3 $a4 $b2 $a5"
    val docB = s"$x $docA" // one token prepended
    val docs = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
    // CDC: chunks re-sync at b1/b2 — 2 of A's 3 chunks survive in B
    val cdc = DedupOps.cdcStats(docs, "doc_id", "text", m = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(cdc(1L) == ((3L, 2L)), s"doc A: ${cdc(1L)}")
    assert(cdc(2L) == ((3L, 2L)), s"doc B: ${cdc(2L)}")
    // fixed windows: the same insertion shifts every window — zero dups
    val fixed = DedupOps.passageStats(docs, "doc_id", "text", w = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(fixed(1L) == 0L && fixed(2L) == 0L,
      s"fixed windows unexpectedly matched: $fixed")
  }

  test("passage stats: within-doc repetition counts as duplication") {
    // one doc whose two 4-token passages are identical — boilerplate
    // self-repetition is exactly what the pass should flag
    val docs = Seq((1L, "x y z w x y z w")).toDF("doc_id", "text")
    val r = DedupOps.passageStats(docs, "doc_id", "text", w = 4).collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L && r.getDouble(3) == 1.0)
  }

  test("bigram LM score matches the hand computation on a tiny corpus") {
    // corpus: "a b a b" and "x y"; V = 4
    // bigram counts: (a,b)=2, (b,a)=1, (x,y)=1
    // context counts: a=2, b=1, x=1
    // lp(a,b) = ln((2+1)/(2+4)) = ln(0.5); lp(b,a) = ln((1+1)/(1+4)) = ln(0.4)
    // lp(x,y) = ln((1+1)/(1+4)) = ln(0.4)
    // doc1 nll = -(2·ln0.5 + ln0.4)/3 = 0.767528; doc2 nll = 0.916291
    val docs = Seq((1L, "a b a b"), (2L, "x y")).toDF("doc_id", "text")
    val out = DataQueries.lmScoreOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L)._1 == 3L && math.abs(out(1L)._2 - 0.767528) < 1e-5,
      s"doc1: ${out(1L)}")
    assert(out(2L)._1 == 1L && math.abs(out(2L)._2 - 0.916291) < 1e-5,
      s"doc2: ${out(2L)}")
  }

  test("lm score: sub-2-token docs drop out, all scores finite") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "two tokens here")).toDF("doc_id", "text")
    val rows = DataQueries.lmScoreOf(docs).collect()
    assert(rows.map(_.getLong(0)).toSet == Set(3L))
    assert(rows.forall(r => !r.getDouble(2).isNaN && !r.getDouble(2).isInfinite))
  }

  test("token budget: selection respects the cap and is selective per source") {
    val rows = DataQueries.tokenBudget(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._4 <= 800), "cum_tok exceeds the budget")
    val perSource = rows.groupBy(_._1).view.mapValues(_.length).toMap
    val totals = Tables.documents(spark, sf).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every source is present and none selected wholesale
    assert(perSource.keySet == totals.keySet)
    perSource.foreach { case (src, n) =>
      assert(n < totals(src), s"$src selected all $n docs — budget not binding")
    }
    // cum_tok equals the running sum of the selected docs' n_tok in
    // greedy order (the selected set is a closed prefix)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val inOrder = rs.sortBy(_._4)
      assert(inOrder.map(_._3).sum == inOrder.last._4)
    }
  }
}
