package graft

import org.apache.spark.sql.functions._
import graft.ops.{Hashing, TextOps, TimeSeries, VectorOps}

/** As-of join semantics, IVF ANN sanity, and JVM↔SQL hash parity. */
class AsofIvfSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin: backward match, equal-ts inclusive, no prior → null") {
    val left = Seq(
      (1L, "a", 10L), // before any right row
      (2L, "a", 20L), // equal ts matches (<=)
      (3L, "a", 35L), // latest prior (30) wins over 20
      (4L, "b", 25L)  // other key, isolated
    ).toDF("event_id", "k", "t")
    val right = Seq(
      ("a", 20L, 2.0), ("a", 30L, 3.0), ("b", 40L, 9.0)
    ).toDF("k", "t", "v")
    val out = TimeSeries.asofJoin(left, right, "k", "t", "t", Seq("v"))
      .orderBy("event_id")
      .select("event_id", "r_t", "r_v").collect()
    assert(out(0).isNullAt(1) && out(0).isNullAt(2))
    assert(out(1).getLong(1) == 20L && out(1).getDouble(2) == 2.0)
    assert(out(2).getLong(1) == 30L && out(2).getDouble(2) == 3.0)
    assert(out(3).isNullAt(1)) // b@25 precedes b@40
  }

  test("asofJoin: duplicate right (key, ts) resolved by tiebreak (greatest wins)") {
    val left = Seq((1L, "a", 10L)).toDF("event_id", "k", "t")
    val right = Seq(("a", 10L, 1.0, 7L), ("a", 10L, 2.0, 9L), ("a", 10L, 3.0, 8L))
      .toDF("k", "t", "v", "seq")
    val out = TimeSeries.asofJoin(left, right, "k", "t", "t", Seq("v"),
      tiebreak = Some("seq")).select("r_v").head()
    assert(out.getDouble(0) == 2.0) // seq=9 row
  }

  test("ivfTopK: broadcast-assignment path equals the literal path") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    // threshold 0 forces the broadcast cross-join + max_by strategy;
    // cosines are bit-identical between paths, so so are the results
    val lit = VectorOps.ivfTopK(e, "vec_id", "embedding",
        nlists = 8, nprobe = 4, k = 5, queryPred = col("vec_id") < 20)
      .as[(Long, Long, Double, Int)].collect().toSet
    val bcast = VectorOps.ivfTopK(e, "vec_id", "embedding",
        nlists = 8, nprobe = 4, k = 5, queryPred = col("vec_id") < 20,
        broadcastThreshold = 0)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(bcast == lit)
  }

  test("ivfTopKKmeans: k-means lists recover the brute-force top-1 for most queries") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val ivf = VectorOps.ivfTopKKmeans(e, "vec_id", "embedding",
      nlists = 8, nprobe = 4, k = 5, queryPred = col("vec_id") < 20)
    val brute = VectorOps.cosineTopK(
      e.filter(col("vec_id") < 20), e, "vec_id", "embedding", k = 5)
    val ivfTop = ivf.filter(col("rank") === 1)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toMap
    val bruteTop = brute.filter(col("rank") === 1)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toMap
    val hits = ivfTop.count { case (q, c) => bruteTop.get(q).contains(c) }
    assert(hits >= ivfTop.size / 2, s"recall@1 too low: $hits/${ivfTop.size}")
    // broadcast-assignment route (threshold 0) agrees with the literal
    // route given the same seeded centers
    val bcast = VectorOps.ivfTopKKmeans(e, "vec_id", "embedding",
        nlists = 8, nprobe = 4, k = 5, queryPred = col("vec_id") < 20,
        broadcastThreshold = 0)
      .as[(Long, Long, Double, Int)].collect().toSet
    val lit = ivf.as[(Long, Long, Double, Int)].collect().toSet
    assert(bcast == lit)
  }

  test("ivfTopK: self-list hit rate is sane and ranks are exact cosine order") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val ivf = VectorOps.ivfTopK(e, "vec_id", "embedding",
      nlists = 8, nprobe = 4, k = 5, queryPred = col("vec_id") < 20)
    val brute = VectorOps.cosineTopK(
      e.filter(col("vec_id") < 20), e, "vec_id", "embedding", k = 5)
    val ivfTop = ivf.filter(col("rank") === 1)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toMap
    val bruteTop = brute.filter(col("rank") === 1)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toMap
    // probing half the lists must recover the true top-1 for most queries
    val hits = ivfTop.count { case (q, c) => bruteTop.get(q).contains(c) }
    assert(hits >= ivfTop.size / 2, s"recall@1 too low: $hits/${ivfTop.size}")
    // within a query, ranks strictly follow descending cosine
    val byQuery = ivf.select("query_id", "rank", "cos")
      .as[(Long, Int, Double)].collect().groupBy(_._1)
    byQuery.values.foreach { rows =>
      val sorted = rows.sortBy(_._2).map(_._3)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
    }
  }

  test("hash sampling: deterministic under repartition, disjoint bucket ranges") {
    import graft.ops.SamplingOps
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = SamplingOps.hashSample(docs, "doc_id", 20)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = SamplingOps.hashSample(docs.repartition(7), "doc_id", 20)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b && a.nonEmpty) // partition-layout independent
    // disjoint ranges → disjoint samples (the train/val split contract)
    val lo = a.toSet
    val hi = docs.filter(
        SamplingOps.hashBucket(col("doc_id"), 100) >= 20 &&
        SamplingOps.hashBucket(col("doc_id"), 100) < 40)
      .select("doc_id").as[Long].collect().toSet
    assert(lo.intersect(hi).isEmpty && hi.nonEmpty)
    // quota sample: exactly `quota` rows per stratum (when available)
    val q = SamplingOps.stratifiedQuota(
        docs.withColumn("parity", col("doc_id") % 2), "parity", "doc_id", 5)
    assert(q.groupBy("parity").count().as[(Long, Long)].collect()
      .forall(_._2 == 5))
  }

  test("winnowing guarantee: shared run of >= w+n-1 tokens shares a fingerprint") {
    import graft.ops.TextOps
    // n=3, w=4 → any common run of 6+ tokens must yield a common fp
    val shared = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"one two $shared three four"),
      (2L, s"$shared totally different tail here"),
      (3L, "no overlap with anything at all okay")).toDF("doc_id", "text")
    val fps = docs.select(col("doc_id"),
        TextOps.winnowingFingerprints(col("text"), 3, 4).as("fps"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fps(1L).toSet.intersect(fps(2L).toSet).nonEmpty)
    assert(fps(3L).toSet.intersect(fps(1L).toSet).isEmpty)
    // ascending distinct
    assert(fps.values.forall(f => f == f.distinct.sorted))
    // fewer than n tokens → empty
    val tiny = Seq((9L, "one two")).toDF("doc_id", "text")
      .select(TextOps.winnowingFingerprints(col("text"), 3, 4).as("fps"))
      .as[Seq[Long]].head()
    assert(tiny.isEmpty)
  }

  test("connectedComponents: path graph, disjoint components, min labels") {
    import graft.ops.DedupOps
    // path 1-2-3-4 (diameter 3, needs multiple rounds), pair 10-11,
    // and edge order/orientation mixed
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val cc = DedupOps.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(cc(_) == 1L))
    assert(cc(10L) == 10L && cc(11L) == 10L)
    assert(cc.size == 6)
  }

  test("contraction CC solves a path deeper than propagation's round budget") {
    import graft.ops.DedupOps
    // 61-node path: diameter 60. Label propagation pays one round per
    // hop and overruns its default 25-round budget; large-star /
    // small-star contraction collapses it in O(log n) rounds.
    // localEdgeLimit=0 forces the distributed loops (the default would
    // short-circuit a graph this small to the driver fast path).
    val path = (0L until 60L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    intercept[IllegalStateException] {
      DedupOps.connectedComponents(path, localEdgeLimit = 0)
    }
    val cc = DedupOps.connectedComponentsContract(path, localEdgeLimit = 0)
      .as[(Long, Long)].collect().toMap
    assert(cc.size == 61 && cc.values.forall(_ == 0L))
    // the driver fast path (default limit) agrees
    val local = DedupOps.connectedComponents(path)
      .as[(Long, Long)].collect().toMap
    assert(local == cc)
  }

  test("self-loop-only nodes survive both CC variants identically") {
    import graft.ops.DedupOps
    val edges = Seq((5L, 5L), (1L, 2L)).toDF("doc_a", "doc_b")
    val want = Map(1L -> 1L, 2L -> 1L, 5L -> 5L)
    for (limit <- Seq(0L, DedupOps.DefaultLocalEdgeLimit)) {
      assert(DedupOps.connectedComponents(edges, localEdgeLimit = limit)
        .as[(Long, Long)].collect().toMap == want)
      assert(DedupOps.connectedComponentsContract(edges, localEdgeLimit = limit)
        .as[(Long, Long)].collect().toMap == want)
    }
  }

  test("Hashing.h64 / planeWeight match the SQL column forms exactly") {
    val samples = Seq("", "a", "the quick brown fox", "0,63", "τok unicode ☃")
    val fromSql = samples.toDF("s")
      .select(TextOps.h64(col("s")).as("h")).as[Long].collect()
    samples.zip(fromSql).foreach { case (s, expected) =>
      assert(Hashing.h64(s) == expected, s"h64 mismatch for '$s'")
    }
    // plane weights: JVM precompute vs the column expression
    val pw = (0 until 4).flatMap(p => (0 until 8).map(d => (p, d)))
    val sqlW = pw.toDF("p", "d")
      .select(VectorOps.planeWeight(col("p"), col("d")).as("w"))
      .as[Long].collect()
    pw.zip(sqlW).foreach { case ((p, d), expected) =>
      assert(Hashing.planeWeight(p, d) == expected, s"weight mismatch ($p,$d)")
    }
  }

  test("shingleHashes matches transform(shingles, h64) and minhash parity") {
    val docs = Seq((1L, "a b c d e a b c"), (2L, "x y"), (3L, "one two three"))
      .toDF("id", "text")
    val fast = docs.select(col("id"),
      TextOps.shingleHashes(col("text"), 3).as("hs"))
    val slow = docs.select(col("id"),
      transform(TextOps.shingles(col("text"), 3), s => TextOps.h64(s)).as("hs"))
    val f = fast.as[(Long, Seq[Long])].collect().toMap
    val s = slow.as[(Long, Seq[Long])].collect().toMap
    assert(f == s)
  }
}
