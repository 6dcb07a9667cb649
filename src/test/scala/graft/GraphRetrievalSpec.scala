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

  test("hybrid rrf: integer fusion scores, per-query ranking laws, determinism") {
    val out = RetrievalOps.hybridRrf(spark, sf).collect()
    assert(out.length == 20, s"4 queries x top-5: ${out.length}")
    // every fused score decomposes into at most two legal RRF terms
    val legal = (1 to 20).map(r => 1000000L / (60 + r)).toSet
    out.foreach { r =>
      val (fx, nSrc) = (r.getLong(3), r.getInt(4))
      assert(nSrc == 1 || nSrc == 2, s"n_src: $nSrc")
      if (nSrc == 1) assert(legal(fx), s"single-source score $fx not 1e6//(60+r)")
      else assert(legal.exists(a => legal(fx - a)), s"two-source score $fx")
    }
    // rank-desc within each query, rnk dense 1..5
    out.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to 5), s"q$q ranks")
      val fxs = sorted.map(_.getLong(3))
      assert(fxs.zip(fxs.tail).forall { case (a, b) => a >= b }, s"q$q order")
    }
    val again = RetrievalOps.hybridRrf(spark, sf).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("dup coverage: exact-duplicate docs are fully covered; bounds hold") {
    val out = DataQueries.dupCoverage(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out.nonEmpty)
    out.values.foreach { case (n, d, c) =>
      assert(n > 0 && d >= 0 && d <= n)
      assert(c >= 0.0 && c <= 1.0)
    }
    // fixture: a copied doc is fully covered, a unique one not at all,
    // and a half-copied one covers exactly its shared shingles
    val fx = Seq(
      (1L, "aa bb cc dd ee"),            // copied verbatim by doc 2
      (2L, "aa bb cc dd ee"),
      (3L, "xx yy zz ww vv"),            // unique
      (4L, "aa bb cc qq rr ss tt"))      // shares exactly "aa bb cc" with 1/2
      .toDF("doc_id", "text")
    val f = DataQueries.dupCoverageOf(fx).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(f(1L) == ((3L, 3L, 1.0)) && f(2L) == ((3L, 3L, 1.0)), s"$f")
    assert(f(3L) == ((3L, 0L, 0.0)), s"$f")
    assert(f(4L) == ((5L, 1L, 0.2)), s"$f")
  }

  test("k-anon: grp_n is the true published-group size; non-star groups pass k") {
    val docs = graft.Tables.documents(spark, sf)
    val n = docs.count()
    val k = math.max(5L, n / 100)
    val out = DataQueries.kAnon(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.length == n)
    val published = out.groupBy(t => (t._2, t._3)).map { case (g, rows) =>
      g -> rows.length.toLong
    }
    out.foreach { case (id, lk, sk, grpN) =>
      assert(grpN == published((lk, sk)),
        s"doc $id claims grp_n=$grpN but published group ${(lk, sk)} has ${published((lk, sk))}")
      // any group still carrying real identifiers satisfies k-anonymity;
      // only the last-resort ('*','*') bucket may fall below k
      if (lk != "*") assert(grpN >= k, s"group ${(lk, sk)} size $grpN < k=$k")
      if (sk != "*") assert(lk != "*", "source kept but lang suppressed")
    }
  }

  test("minhash err: estimates are multiples of 1/32 and err is |est - exact|") {
    val out = DataQueries.minhashErr(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(out.nonEmpty)
    out.foreach { case (a, b, est, jac, err) =>
      assert(a < b)
      // 32-component signature: agreement fraction is m/32
      assert((est * 32).round / 32.0 == est, s"($a,$b) est $est not m/32")
      assert(jac >= 0.0 && jac <= 1.0)
      assert(math.abs(err - math.abs(est - jac)) < 1.5e-6,
        s"($a,$b) err $err vs |$est - $jac|")
    }
    // the LSH screen threshold story holds: most candidates are real
    // near-dups, so the mean abs error stays well under the tau=0.3 gap
    val meanErr = out.map(_._5).sum / out.length
    assert(meanErr < 0.25, s"mean |est-exact| $meanErr — estimator broken?")
  }

  test("skew report: per-domain totals reconcile; fan-out bounds hold") {
    val out = DataQueries.skewReport(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
      .toMap
    assert(out.keySet == Set("band", "shingle", "simseg"))
    val docs = graft.Tables.documents(spark, sf)
      .select(TextOps.tokenCount(col("text")).as("nt"))
    val nDocsShingled = docs.filter(col("nt") >= 3).count()
    val nDocsTok = docs.filter(col("nt") > 0).count()
    // every doc with >=3 tokens lands in exactly 16 band buckets (k=32, r=2)
    assert(out("band")._2 == 16 * nDocsShingled,
      s"band rows ${out("band")._2} vs 16*$nDocsShingled")
    // and in exactly 5 simhash segments when it has any token
    assert(out("simseg")._2 == 5 * nDocsTok,
      s"simseg rows ${out("simseg")._2} vs 5*$nDocsTok")
    out.foreach { case (dom, (nKeys, nRows, maxB, meanB, fanout)) =>
      assert(nKeys > 0 && nRows >= nKeys && maxB >= 1)
      assert(math.abs(meanB - nRows.toDouble / nKeys) < 1e-6, s"$dom mean")
      // the heaviest bucket alone contributes max*(max-1)/2 pairs
      assert(fanout >= maxB * (maxB - 1) / 2, s"$dom fanout lower bound")
      assert(fanout <= nRows * (nRows - 1) / 2, s"$dom fanout upper bound")
    }
  }

  test("para pairs: exactly the cross-source subset of the jaccard pairs") {
    val all = graft.ops.DedupOps
      .jaccardPairs(graft.Tables.documents(spark, sf), "doc_id", "text", 3, 0.1,
        maxDocFreq = None)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val srcOf = graft.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val para = DataQueries.paraPairs(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getString(2), r.getString(3), r.getDouble(4))))
    assert(para.nonEmpty)
    para.foreach { case (k @ (a, b), (sa, sb, j)) =>
      assert(sa != sb, s"same-source pair $k leaked")
      assert(sa == srcOf(a) && sb == srcOf(b), s"source mismatch $k")
      assert(all.contains(k), s"pair $k not in the jaccard set")
      assert(math.abs(all(k) - j) < 1e-6)
    }
    val expected = all.keys.count { case (a, b) => srcOf(a) != srcOf(b) }
    assert(para.length == expected,
      s"cross-source subset: got ${para.length}, expected $expected")
  }

  test("cluster sample: quota per cluster, dense ranks, deterministic") {
    val out = DataQueries.clusterSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.nonEmpty)
    assert(out.map(_._3).distinct.length == out.length, "member repeated")
    out.groupBy(_._1).foreach { case (cl, rows) =>
      val rks = rows.map(_._2).sorted
      assert(rks.length <= 20, s"cluster $cl over quota")
      assert(rks.toSeq == (1 to rks.length), s"cluster $cl ranks not dense")
    }
    val again = DataQueries.clusterSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.sameElements(again), "sample not deterministic")
  }

  test("bloom screen: no false negatives; exact counts reconcile with decontam") {
    val out = DataQueries.bloomScreen(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out.nonEmpty)
    out.foreach { case (doc, (bloom, exact, fp)) =>
      // a Bloom filter can over-approximate, never under-approximate
      assert(bloom >= exact, s"doc $doc: false negative ($bloom < $exact)")
      assert(fp == bloom - exact)
    }
    // the exact side IS decontam's hit count (same split, same 5-grams)
    val dec = DataQueries.decontam(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.keySet == dec.keySet)
    out.foreach { case (doc, (_, exact, _)) =>
      assert(exact == dec(doc), s"doc $doc: exact $exact vs decontam ${dec(doc)}")
    }
  }

  test("skew report's pair fan-out equals the actual candidate-join emission") {
    val fanout = DataQueries.skewReport(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(5)).toMap
    // the shingle domain's Σ c·(c−1)/2 must be EXACTLY the row count the
    // inverted-index self-join emits before pair aggregation — the
    // prediction is the join's work, not an estimate of it
    val ex = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), explode(TextOps.shingleHashes(col("text"), 3)).as("h"))
    val emitted = ex.toDF("a", "h").join(ex.toDF("b", "h"), Seq("h"))
      .filter(col("a") < col("b")).count()
    assert(fanout("shingle") == emitted,
      s"predicted ${fanout("shingle")} vs emitted $emitted")
  }

  test("cms err: never underestimates; exact counts match a driver recount") {
    val out = DataQueries.cmsErr(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.length == 20)
    out.foreach { case (_, ng, exact, est, over) =>
      assert(est >= exact, s"'$ng': CMS underestimated ($est < $exact)")
      assert(over == est - exact)
    }
    // independent recount: whitespace-tokenize driver-side, slide 3-grams
    val counts = scala.collection.mutable.Map.empty[String, Long]
    graft.Tables.documents(spark, sf).select("text").collect().foreach { r =>
      val tk = r.getString(0).split("\\s+").filter(_.nonEmpty)
      tk.sliding(3).filter(_.length == 3)
        .foreach { w => val g = w.mkString(" "); counts(g) = counts.getOrElse(g, 0L) + 1 }
    }
    out.foreach { case (_, ng, exact, _, _) =>
      assert(counts(ng) == exact, s"'$ng': $exact vs recount ${counts(ng)}")
    }
    // the top-20 really are the heaviest grams
    val floor = out.map(_._3).min
    val heavier = counts.valuesIterator.count(_ > floor)
    assert(heavier <= 20, s"missed a heavy hitter (floor $floor, $heavier above)")
  }

  test("weighted sample: matches an independent exponential-keys recompute") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), TextOps.tokenCount(col("text")).as("nt"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong)
      .filter(_._2 > 0)
    // reimplement the key independently: driver-side h64 + scala math
    // (grid-rounded log, then pure integer division — the engine spec)
    val expected = docs.map { case (id, w) =>
      val m = graft.ops.Hashing.h64(s"wsample:$id") % 1000000L + 1L
      val lfx = math.round(-math.log(m.toDouble / 1e6) * 1e6)
      val key = lfx * 1000000000L / w
      (key, id, w)
    }.sorted.take(50)
    val out = DataQueries.weightedSample(spark, sf).collect()
      .map(r => (r.getLong(3), r.getLong(1), r.getLong(2)))
    assert(out.length == 50)
    assert(out.toSeq == expected.toSeq, "engine vs driver-side recompute")
    // the sample is weight-biased: winners' mean token count clearly
    // exceeds the corpus mean (exponential keys shrink with weight)
    val corpusMean = docs.map(_._2).sum.toDouble / docs.length
    val sampleMean = out.map(_._3).sum.toDouble / out.length
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean vs corpus mean $corpusMean")
  }

  test("curriculum: phases partition each language's token mass into thirds") {
    val out = DataQueries.curriculum(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3),
        r.getLong(4)))
    assert(out.nonEmpty)
    assert(out.forall(t => t._5 >= 0 && t._5 <= 2))
    out.groupBy(_._2).foreach { case (lang, rows) =>
      // phase is monotone along the curriculum order; the output carries
      // ROUNDED quality, so compare across distinct quality values only
      // (rounding is monotone, so distinct rounded values order exactly)
      val byQ = rows.groupBy(_._3).toSeq.sortBy(-_._1)
        .map { case (q, rs) => (q, rs.map(_._5)) }
      byQ.zip(byQ.tail).foreach { case ((qHi, hi), (qLo, lo)) =>
        assert(hi.max <= lo.min,
          s"$lang: phase not monotone across quality $qHi -> $qLo")
      }
      val total = rows.map(_._4).sum
      if (total > 0) {
        val maxDoc = rows.map(_._4).max
        val p0 = rows.filter(_._5 == 0L).map(_._4).sum
        // the straddling doc is the only slack around the exact third
        assert(math.abs(p0 - total / 3) <= maxDoc,
          s"$lang: phase-0 mass $p0 vs third ${total / 3} (maxDoc $maxDoc)")
      }
    }
  }

  test("kcore: triangle survives 2-core peeling, pendant path peels off") {
    // triangle {1,2,3} + path 3-4-5: 5 peels in round 1 (deg 1), 4 in
    // round 2 (its only surviving neighbor is 3), triangle is stable
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val r = GraphOps.kCoreFixed(edges, 2, 4)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), s"core: $r")
  }

  test("kcore: k=1 with enough rounds keeps every non-isolated vertex") {
    val und = Seq((1L, 2L), (3L, 4L), (4L, 5L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val r = GraphOps.kCoreFixed(edges, 1, 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.keySet == Set(1L, 2L, 3L, 4L, 5L), s"core: $r")
    assert(r(4L) == 2L && r(1L) == 1L, s"degrees: $r")
  }

  test("doc kcore ⊆ deg≥2 docs of the same near-dup graph; deterministic") {
    val core = GraphOps.docKCore(spark, sf).collect()
    core.foreach(r => assert(r.getLong(1) >= 2L, s"in-core deg < k: $r"))
    val deg2 = GraphOps.docPageRank(spark, sf).collect()
      .filter(_.getLong(1) >= 2).map(_.getLong(0)).toSet
    core.foreach(r => assert(deg2.contains(r.getLong(0)),
      s"core doc ${r.getLong(0)} has global degree < 2"))
    val again = GraphOps.docKCore(spark, sf).collect()
    assert(core.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("label prop converged: early stop on the corpus graph ≡ fixed-round there") {
    // the corpus near-dup graph contains 2-node duplicate-pair
    // components, which 2-cycle forever under sync LPA — so the
    // detector must stop EARLY (cycle or fixpoint, never the valve)
    // and its output must equal the fixed-round form at the stop
    // round: the bridging law that makes the data-dependent stop
    // auditable against the SQL-oracle-able fixed-round contract
    val docs = Tables.documents(spark, sf).select(col("doc_id").as("id"))
    val edges = GraphOps.neardupEdges(spark, sf, None).localCheckpoint(true)
    val (lab, rounds, why) =
      GraphOps.labelPropConvergedOf(docs, edges, maxRounds = 20)
    info(s"corpus LPA stopped: $why after $rounds rounds")
    assert(why != "valve" && rounds < 20,
      s"expected an early stop on the corpus graph, got $why@$rounds")
    val conv = lab.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val fixed = GraphOps.labelPropOf(docs, edges, rounds).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(conv.sameElements(fixed),
      s"converged ≠ fixed-round@$rounds: ${conv.diff(fixed).take(3).toSeq}")
  }

  test("collocations: hand-computed integer PMI ratios and tie order") {
    // "a b a b c": bigrams ab×2 ba×1 bc×1, N=4; unigrams a=2 b=2 c=1
    val docs = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val r = DataQueries.collocationsOf(docs, minCount = 1, topK = 10)
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getLong(5)))
    // ab: ((2e6 div 2)·4) div 2 = 2e6; bc: ((1e6 div 2)·4) div 1 = 2e6;
    // ba: ((1e6 div 2)·4) div 2 = 1e6 — tie broken by (w1, w2)
    assert(r.toSeq == Seq(
      ("a", "b", 2L, 2L, 2L, 2000000L),
      ("b", "c", 1L, 2L, 1L, 2000000L),
      ("b", "a", 1L, 2L, 2L, 1000000L)), s"got: ${r.toSeq}")
  }

  test("vocab growth: cumulative docs/tokens/types over id-range buckets") {
    // ids 1..10 with max_id 10 land one per bucket; vocab grows only
    // when a never-seen token appears
    val texts = Seq("x", "x", "y", "x y", "z", "z", "w", "x", "q", "q")
    val docs = texts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }
      .toDF("doc_id", "text")
    val r = DataQueries.vocabGrowthOf(docs, 10)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.length == 10)
    assert(r(0) == (1L, 1L, 1L, 1L), s"b1: ${r(0)}")
    assert(r(2) == (3L, 3L, 3L, 2L), s"b3: ${r(2)}")   // +y
    assert(r(3) == (4L, 4L, 5L, 2L), s"b4: ${r(3)}")   // "x y": 2 tokens, 0 new
    assert(r(9) == (10L, 10L, 11L, 5L), s"b10: ${r(9)}") // vocab {x,y,z,w,q}
    // cumulative columns are monotone non-decreasing
    r.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 <= b._2 && a._3 <= b._3 && a._4 <= b._4, s"$a !<= $b") }
  }

  test("phrase search: finds every occurrence of the corpus-top trigram") {
    val docs = Seq(
      (1L, "the quick fox jumps"),
      (2L, "the quick fox"),
      (3L, "quick fox now the quick fox")).toDF("doc_id", "text")
    val r = DataQueries.phraseSearchOf(docs)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2)))
    assert(r.forall(_._3 == "the quick fox"), s"phrase: ${r.toSeq}")
    assert(r.map(t => (t._1, t._2)).toSeq == Seq((1L, 1L), (2L, 1L), (3L, 4L)),
      s"occurrences: ${r.toSeq}")
  }

  test("hyperball: 2-round register merge sees exactly the distance-≤2 ball") {
    // path 1-2-3-4-5: ball2(1)={1,2,3}, ball2(3)=all five
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val out = GraphOps.hyperBallOf(edges, 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(1L)._1 == 3L && out(3L)._1 == 5L && out(2L)._1 == 4L,
      s"exact balls wrong: $out")
    // small-ball law: register hits never exceed the true ball size,
    // and with 512 registers over ≤5 ids collisions are possible but
    // the hit count must be ≥ 1
    out.foreach { case (v, (exact, hits, _)) =>
      assert(hits <= exact && hits >= 1L, s"node $v: hits=$hits exact=$exact")
    }
    // register law: a node's hit count equals the number of DISTINCT
    // buckets its ball members' id-hashes land in (elementwise max of
    // singleton register files) — independent recompute per node
    val buckets = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
      .select(col("id"),
        TextOps.h64(col("id").cast("string")).bitwiseAND(511L).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val balls = Map(
      1L -> Set(1L, 2L, 3L), 2L -> Set(1L, 2L, 3L, 4L),
      3L -> Set(1L, 2L, 3L, 4L, 5L), 4L -> Set(2L, 3L, 4L, 5L),
      5L -> Set(3L, 4L, 5L))
    balls.foreach { case (v, ball) =>
      assert(out(v)._2 == ball.map(buckets).size.toLong,
        s"node $v: hits ${out(v)._2} != distinct buckets of $ball")
    }
    // deterministic: same call twice
    val again = GraphOps.hyperBallOf(edges, 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out == again)
  }

  test("hyperball: rounds=0-equivalent singleton registers estimate 1-balls") {
    // two disconnected 2-cliques: every 2-ball is the clique itself
    val und = Seq((1L, 2L), (3L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val out = GraphOps.hyperBallOf(edges, 2).collect()
    out.foreach { r =>
      assert(r.getLong(1) == 2L, s"clique ball must be 2: $r")
      assert(r.getLong(2) >= 1L && r.getLong(2) <= 2L, s"hits: $r")
      // err column is consistent: hll_raw - n_exact
      assert(r.getLong(4) == r.getLong(3) - r.getLong(1), s"err law: $r")
    }
  }

  test("entity match: symmetric-free pairs, blocked candidates only, exact distances") {
    val out = graft.ops.Relational.entityMatch(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (ka, kb, d) = (r.getLong(0), r.getLong(1), r.getLong(5))
      assert(ka < kb, s"unordered pair: $r")
      assert(d >= 0 && d <= 2, s"distance outside gate: $r")
      // blocking invariant: same brand and same head noun
      assert(r.getString(3).split(" ")(1) == r.getString(4).split(" ")(1),
        s"cross-block pair: $r")
    }
    // distance is the real Levenshtein of the two names (spot-check all)
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1)((i, j) => i.max(j))
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j), dp(i)(j - 1)) + 1,
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    out.foreach(r => assert(lev(r.getString(3), r.getString(4)) == r.getLong(5),
      s"distance mismatch: $r"))
  }

  test("token simpson: uniform tokens give eff = uniq; skew collapses it") {
    val rows = DataQueries.tokenSimpson(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, u, sq, eff) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      // Cauchy–Schwarz: N²/Σc² ≤ uniq, and ≥ 1
      assert(eff <= u * 1000000L, s"eff above type count: $r")
      assert(eff >= 1000000L || n == 0, s"eff below 1: $r")
      assert(sq >= n, s"Σc² < N impossible: $r")
    }
    // hand fixture: "a a a b" → N=4, Σc²=10, eff=1 600 000
    import spark.implicits._
    val one = Seq((1L, "a a a b", "s")).toDF("doc_id", "text", "source")
    // route through the same pipeline via a temp table? tokenSimpson is
    // directory-bound; recompute its algebra directly instead
    val c = one.select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").count().collect().map(_.getLong(1))
    val (n, sq) = (c.sum, c.map(x => x * x).sum)
    assert((n * n * 1000000L) / sq == 1600000L)
  }

  test("bpe merges: hand-computed first two merges and symbol accounting") {
    // corpus: "the the the that" -> words the×3, that×1
    // round 1 pairs: (t,h)×4, (h,e)×3, (h,a)×1, (a,t)×1 -> merge (t,h)
    //   the -> [th, e], that -> [th, a, t]; symbols 3·3+4=13 -> 3·2+3=9
    // round 2 pairs: (th,e)×3, (th,a)×1, (a,t)×1 -> merge (th,e)
    //   the -> [the]; symbols 9 -> 3·1+3=6
    val docs = Seq((1L, "the the the that")).toDF("doc_id", "text")
    val r = DataQueries.bpeMergesOf(docs, 2).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2), x.getLong(3),
        x.getLong(4), x.getLong(5)))
    assert(r.toSeq == Seq(
      (1L, "t", "h", 4L, 13L, 9L),
      (2L, "th", "e", 3L, 9L, 6L)), s"got ${r.toSeq}")
  }

  test("bpe merges: adjacent same-pair sites merge independently (no overlap)") {
    // "abab": (a,b)×2 and (b,a)×1 -> merge (a,b) BOTH sites: ab ab (4->2)
    val docs = Seq((1L, "abab")).toDF("doc_id", "text")
    val r = DataQueries.bpeMergesOf(docs, 1).collect()
      .map(x => (x.getString(1), x.getString(2), x.getLong(3), x.getLong(4),
        x.getLong(5)))
    assert(r.toSeq == Seq(("a", "b", 2L, 4L, 2L)), s"got ${r.toSeq}")
  }

  test("bpe merges: self-pair wins and merges with run-length parity") {
    // "aaaaa ab": pairs (a,a)×4 (overlapping occurrences all counted,
    // Sennrich get_stats), (a,b)×1 -> merge (a,a). Left-to-right
    // non-overlapping on the run of 5: [aa][aa]a -> "aaaaa" becomes
    // [aa, aa, a] (5 syms -> 3); "ab" untouched. 7 -> 5 total.
    val docs = Seq((1L, "aaaaa ab")).toDF("doc_id", "text")
    val r = DataQueries.bpeMergesOf(docs, 1).collect()
      .map(x => (x.getString(1), x.getString(2), x.getLong(3), x.getLong(4),
        x.getLong(5)))
    assert(r.toSeq == Seq(("a", "a", 4L, 7L, 5L)), s"got ${r.toSeq}")
  }

  test("bpe merges: even-length run merges fully, odd leaves a tail") {
    // round 1 on "aaaa": (a,a)×3 wins -> [aa][aa] (4 -> 2);
    // round 2: pairs (aa,aa)×1 wins -> [aaaa] (2 -> 1)
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val r = DataQueries.bpeMergesOf(docs, 2).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2), x.getLong(3),
        x.getLong(4), x.getLong(5)))
    assert(r.toSeq == Seq(
      (1L, "a", "a", 3L, 4L, 2L),
      (2L, "aa", "aa", 1L, 2L, 1L)), s"got ${r.toSeq}")
  }

  test("phrase search: overlapping occurrences inside one document") {
    // top trigram "a a a" occurs at positions 1,2,3 of the 5-a doc
    val docs = Seq((1L, "a a a a a"), (2L, "b c d")).toDF("doc_id", "text")
    val r = DataQueries.phraseSearchOf(docs)
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(r.toSeq == Seq((1L, 1L), (1L, 2L), (1L, 3L)), s"got ${r.toSeq}")
  }
}
