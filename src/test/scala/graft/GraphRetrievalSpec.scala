package graft

import org.apache.spark.sql.functions._
import graft.ops.{DataQueries, GraphOps, RetrievalOps, TextOps}

/** Fixture-level checks for the round-5 additions: fixed-point
  * PageRank (hand-computed micro-unit values on tiny graphs), BM25
  * (hand-computed Okapi scores), snapshot-diff partition laws, and the
  * positional-shingle / diversity invariants. The DuckDB oracles gate
  * end-to-end equality; these pin the semantics a green hash alone
  * wouldn't explain.
  */
class GraphRetrievalSpec extends SparkSpec {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("pagerank: 2-cycle is a fixed point at 1.0; isolated node sits at teleport") {
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = GraphOps.pageRankFixed(nodes, edges, 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // contrib along the cycle: (17·1e6) div (20·1) = 850000; +150000 = 1e6
    assert(r(1L) == 1000000L && r(2L) == 1000000L, s"cycle: $r")
    assert(r(3L) == 150000L, s"isolated: $r")
  }

  test("pagerank: 3-star micro-unit values match the hand computation") {
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val r = GraphOps.pageRankFixed(nodes, edges, 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // it1: leaf = 150000 + (17e6 div 60) = 433333; center = 150000 + 3·850000
    // it2: leaf = 150000 + (17·2700000 div 60) = 915000
    //      center = 150000 + 3·((17·433333) div 20) = 150000 + 3·368333
    assert(r(1L) == 1254999L, s"center: $r")
    assert(r(2L) == 915000L && r(3L) == 915000L && r(4L) == 915000L, s"leaves: $r")
  }

  test("doc pagerank on the real table: teleport floor, mass ordering, determinism") {
    val out = GraphOps.docPageRank(spark, sf).collect()
    assert(out.nonEmpty)
    val byDoc = out.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // isolated docs sit exactly at the teleport floor; connected ones above it
    byDoc.foreach { case (id, deg, pr) =>
      if (deg == 0) assert(pr == 0.15, s"doc $id deg=0 pr=$pr")
      else assert(pr > 0.15, s"doc $id deg=$deg pr=$pr")
    }
    // output is rank-desc ordered with doc_id tiebreak
    val key = out.map(r => (-r.getDouble(2), r.getLong(0)))
    assert(key.sameElements(key.sorted), "not rank-ordered")
  }

  test("bm25: hand-computed scores and tf-over-length ordering") {
    val docs = Seq(
      (1L, "apple banana"),
      (2L, "apple apple banana"),
      (3L, "cherry")).toDF("doc_id", "text")
    val out = RetrievalOps.bm25TopKOf(docs, Seq(1 -> "apple"), topK = 5)
      .collect().map(r => r.getLong(2) -> (r.getInt(1), r.getDouble(4))).toMap
    // N=3, df=2, idf = ln(1 + 1.5/2.5); avgdl = 2
    // doc2: tf=2, dl=3 → idf·4.4/3.65 = 0.566580 (micro-rounded)
    // doc1: tf=1, dl=2 → idf·2.2/2.2  = idf = 0.470004
    assert(out(2L)._1 == 1 && math.abs(out(2L)._2 - 0.56658) < 1e-6, s"$out")
    assert(out(1L)._1 == 2 && math.abs(out(1L)._2 - 0.470004) < 1e-6, s"$out")
    assert(!out.contains(3L), "no-hit doc must not appear")
  }

  test("bm25: term present in every doc still scores positive (Lucene idf)") {
    val docs = Seq((1L, "x y"), (2L, "x z")).toDF("doc_id", "text")
    val out = RetrievalOps.bm25TopKOf(docs, Seq(7 -> "x"), topK = 5).collect()
    assert(out.length == 2 && out.forall(_.getDouble(4) > 0))
  }

  test("snapshot diff: partition laws on the real table") {
    val ids = graft.Tables.documents(spark, sf).select("doc_id")
      .as[Long].collect().toSet
    val out = DataQueries.snapshotDiff(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    val byStatus = out.groupBy(_._2)
    assert(byStatus.keySet == Set("added", "removed", "changed"))
    assert(byStatus("removed").map(_._1).toSet == ids.filter(_ % 17 == 0))
    assert(byStatus("added").map(_._1).toSet ==
      ids.filter(_ % 23 == 0).map(_ + 1000000L))
    assert(byStatus("changed").map(_._1).toSet ==
      ids.filter(i => i % 10 == 0 && i % 17 != 0))
    // the ' rev2' suffix is exactly 5 chars; added/removed carry nulls
    assert(byStatus("changed").forall(x => x._4 == x._3 + 5))
    assert(byStatus("removed").forall(_._4 == -1L))
    assert(byStatus("added").forall(_._3 == -1L))
  }

  test("positional shingles keep duplicates; short docs yield empty") {
    val df = Seq((1L, "a b c d"), (2L, "a a a a"), (3L, "a b"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.shinglesAll(col("text"), 3).as("g"))
    val m = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(m(1L) == Seq("a b c", "b c d"))
    assert(m(2L) == Seq("a a a", "a a a"), "duplicates must be kept")
    assert(m(3L).isEmpty)
  }

  test("balanced sample flattens the language mix and is reproducible") {
    val before = graft.Tables.documents(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = DataQueries.balancedSample(spark, sf)
    val after = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val uniform = before.values.sum.toDouble / before.size
    // every over-represented language moves TOWARD uniform, never past
    // double the target; under-represented languages keep everything
    after.foreach { case (lang, n) =>
      assert(n <= before(lang))
      if (before(lang) <= uniform) assert(n == before(lang), s"$lang dropped")
    }
    val spreadBefore = before.values.max - before.values.min
    val spreadAfter = after.values.max - after.values.min
    assert(spreadAfter < spreadBefore, s"no flattening: $before -> $after")
    // rand()-free: a second run is row-identical
    val again = DataQueries.balancedSample(spark, sf).collect()
    assert(out.collect().sameElements(again))
  }

  test("hard negatives: nearest other-label wins, same-label never appears") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.9f, 0.1f), 0),    // same label as 1 — must not appear
      (3L, Array(0.95f, 0.05f), 1),  // confusable cross-label — the hard negative
      (4L, Array(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = graft.ops.VectorOps
      .hardNegatives(vecs.filter($"vec_id" === 1), vecs,
        "vec_id", "embedding", "label", k = 2)
      .collect().map(r => (r.getLong(2), r.getInt(3), r.getInt(5)))
    assert(out.length == 2)
    assert(out.forall(_._2 == 1), s"same-label leak: ${out.toSeq}")
    assert(out.toSeq == Seq((3L, 1, 1), (4L, 1, 2)), s"ranking: ${out.toSeq}")
  }

  test("ngram diversity: totals reconcile against an independent columnar sum") {
    val docs = graft.Tables.documents(spark, sf)
    val expected = docs
      .select(col("source"),
        greatest(TextOps.tokenCount(col("text")) - 2, lit(0)).as("n3"))
      .groupBy("source").agg(sum("n3").as("t3"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = DataQueries.ngramDiversity(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (src, t3, u3, ttr) =
        (r.getString(0), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(t3 == expected(src), s"$src total mismatch")
      assert(u3 <= t3 && u3 > 0)
      assert(ttr > 0 && ttr <= 1.0)
    }
  }
}
