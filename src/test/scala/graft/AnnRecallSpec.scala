package graft

import graft.ops.VectorOps
import org.apache.spark.sql.functions._

/** Recall of the LSH ANN paths against the exact brute force — all
  * deterministic (content-seeded hyperplanes), so the measured recall
  * is stable across runs. */
class AnnRecallSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"
  private def truth: Map[Long, Set[Long]] = {
    val e = Tables.embeddings(spark, d)
    VectorOps.cosineTopK(e.filter(col("vec_id") < 20), e, "vec_id", "embedding", k = 5)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
  }

  private def recallOf(got: Array[org.apache.spark.sql.Row]): Double = {
    val t = truth
    val byQ = got.groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val hits = t.map { case (q, exp) => (byQ.getOrElse(q, Set.empty) & exp).size }.sum
    hits.toDouble / t.map(_._2.size).sum
  }

  test("int8 scalar quantization barely perturbs the exact top-k") {
    val e = Tables.embeddings(spark, d)
    val sq = VectorOps.sq8TopK(e, "vec_id", "embedding", k = 5, nQueries = 20)
      .collect()
    val r = recallOf(sq)
    info(f"sq8 recall=$r%.3f")
    // 8-bit per-dim resolution on 64-dim unit-ish vectors: the
    // quantization error is ~0.2% of the value range, so the exact
    // top-5 should survive nearly intact
    assert(r >= 0.9, f"sq8 recall too low: $r%.3f")
    // and the dequantized cosines stay within quantization tolerance
    val exact = VectorOps.cosineTopK(
        e.filter(col("vec_id") < 20), e, "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("cand_id"), col("cos")).collect()
      .map(row => (row.getLong(0), row.getLong(1)) -> row.getDouble(2)).toMap
    sq.foreach { row =>
      exact.get((row.getLong(0), row.getLong(1))).foreach { c =>
        assert(math.abs(row.getDouble(2) - c) < 0.01,
          s"cos drifted: ${row.getDouble(2)} vs $c")
      }
    }
  }

  test("multi-table ANN recall beats single-table and clears a floor") {
    val e = Tables.embeddings(spark, d)
    val single = VectorOps.annTopK(e, "vec_id", "embedding",
      planes = 8, k = 5, queryPred = col("vec_id") < 20).collect()
    val multi = VectorOps.annTopKMulti(e, "vec_id", "embedding",
      planes = 4, tables = 16, k = 5, queryPred = col("vec_id") < 20).collect()
    val rs = recallOf(single)
    val rm = recallOf(multi)
    info(f"recall single-table=$rs%.3f multi-table=$rm%.3f")
    assert(rm >= rs)
    assert(rm >= 0.4, f"multi-table recall too low: $rm%.3f")
  }

  test("knn graph LSH twin: cell-identical to the exact form at the declared settings") {
    // the q_knn_graph_lsh contract: at (planes=2, tables=16) the SRP
    // candidate set covers every node's true top-5 on this corpus
    // (verified diff=0 at sf0.001/0.01/0.1 in the round-8 sweep), so
    // edges, cosines AND ranks all match the exact form — recall 1.0,
    // not approximately
    val e = Tables.embeddings(spark, d)
    val exact = VectorOps.knnGraphMutual(e, "vec_id", "embedding", 5)
      .collect().map(_.toString).sorted
    val lsh = VectorOps.knnGraphMutualLsh(e, "vec_id", "embedding", 5,
      planes = 2, tables = 16, maxBucket = None).collect().map(_.toString).sorted
    assert(exact.length > 0 && exact.sameElements(lsh),
      s"LSH twin diverged: ${exact.diff(lsh).take(3).toSeq} vs ${lsh.diff(exact).take(3).toSeq}")
  }

  test("knn graph LSH twin: bucketed equi-join plan, no quadratic operator") {
    val e = Tables.embeddings(spark, d)
    val p = VectorOps.knnGraphMutualLsh(e, "vec_id", "embedding", 5,
      planes = 2, tables = 16, maxBucket = None).queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"quadratic candidate join in the LSH twin:\n$p")
    // and not the blocked all-pairs generator either: its signature is
    // the explode(sequence(blk, ...)) block-pair fan-out
    assert(!p.contains("sequence("),
      s"block-pair fan-out leaked into the LSH twin:\n$p")
  }

  // ---------------------------------------------------------------
  // Clustered-corpus fixture: the regime the shipped near-uniform
  // embeddings table can't show (its 5th-neighbor cosines sit at
  // 0.24-0.35, forcing full-recall settings where SRP pruning is
  // weak). Real corpora cluster; here top-k neighbors are high-cosine
  // (~0.997), so tight settings keep recall 1.0 AND prune hard —
  // turning the twin's 100× claim from plan shape into measurement.
  // ---------------------------------------------------------------

  /** Mixture of Gaussians on the unit sphere: `clusters` seeded unit
    * centers, points = center + noise·(random unit) — within-cluster
    * cosine ≈ 1/(1+noise²) ≈ 0.995+, cross-cluster ≈ N(0, dims^-1/2).
    * Deterministic (fixed seed). */
  private def clusteredFixture(n: Int, clusters: Int, dims: Int,
                               noise: Double): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def unit(): Array[Double] = {
      val v = Array.fill(dims)(rnd.nextGaussian())
      val nm = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / nm)
    }
    val centers = Array.fill(clusters)(unit())
    (0 until n).map { i =>
      val c = centers(i % clusters)
      val p = unit()
      (i.toLong, c.zip(p).map { case (a, b) => (a + noise * b).toFloat })
    }.toDF("vec_id", "embedding").repartition(8)
  }

  test("clustered corpus: LSH twin recall 1.0 at tight settings AND candidate mass ≪ all-pairs") {
    val n = 1500
    val emb = clusteredFixture(n, clusters = 30, dims = 64, noise = 0.05)
      .localCheckpoint(true)
    // tight settings: 8 planes/table × 8 tables — miss prob per true
    // top-5 pair ≈ (1-0.978^8)^8 ≈ 7e-7, random-pair collision ≈ 3%
    val planes = 8; val tables = 8
    val exact = VectorOps.knnGraphMutual(emb, "vec_id", "embedding", 5)
      .collect().map(_.toString).sorted
    val lsh = VectorOps.knnGraphMutualLsh(emb, "vec_id", "embedding", 5,
      planes, tables, maxBucket = None).collect().map(_.toString).sorted
    assert(exact.length > 0 && exact.sameElements(lsh),
      s"clustered twin diverged: ${exact.diff(lsh).take(3).toSeq} vs ${lsh.diff(exact).take(3).toSeq}")
    // the measured pruning claim: candidates ≪ N(N-1)/2
    val allPairs = n.toLong * (n - 1) / 2
    val cand = VectorOps.lshCandidatesForProfile(
      emb, "vec_id", "embedding", planes, tables).count()
    val ratio = cand.toDouble / allPairs
    info(f"candidates=$cand of $allPairs all-pairs (ratio=$ratio%.4f)")
    assert(ratio < 0.15,
      f"LSH candidate mass not ≪ all-pairs on a clustered corpus: $ratio%.4f")
  }

  test("q_knn_clustered: the DECLARED clustered gate prunes hard and stays bucketed") {
    // the oracle proves recall 1.0 (edge set = brute force) — this
    // re-asserts the PRUNING side so regenerated testdata can't
    // silently drift the gate into a no-prune regime, and pins the
    // plan shape (one bucketed equi-join; the only BNLJs are the two
    // deliberate 1-row stats joins: cand-count × n-count, then the
    // broadcast of that single row onto the edges)
    val g = VectorOps.knnGraphClusteredGate(
      Tables.embeddings(spark, d), "vec_id", 5)
    val r = g.select("cand_pairs", "all_pairs").head()
    val ratio = r.getLong(0).toDouble / r.getLong(1)
    info(f"cand=${r.getLong(0)} all=${r.getLong(1)} ratio=$ratio%.4f")
    assert(ratio < 0.15,
      f"declared clustered gate no longer prunes: $ratio%.4f")
    val p = g.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      "BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2,
      s"unexpected quadratic operator in the clustered gate:\n$p")
  }

  test("sorted-window candidates: a duplication storm stays LINEAR and connected") {
    // the capped generator's contract under the ScaleProbe ×99 regime:
    // m identical vectors in one bucket must yield ≤ m·window pairs
    // per (table) pass — not m²/2 — while every duplicate stays
    // reachable from every other (identical sort keys → adjacent in
    // EVERY pass → the lead-chain spans the block)
    import spark.implicits._
    val m = 200; val window = 8; val tables = 4
    val dup = (0 until m).map(i => (i.toLong,
      Array.fill(16)(0.25f))) // one exact-duplicate block
      .toDF("vec_id", "embedding")
    val cand = VectorOps.sortedWindowCandidates(
      VectorOps.normalizedForTest(dup, "vec_id", "embedding"),
      planes = 4, tables = tables, window = window)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // identical vectors share every bucket AND every sort key, so all
    // passes produce the SAME vid-ordered chain: exactly m·window - Σ
    // tail shortfall pairs, far under m²/2 = 19,900
    assert(cand.length <= m * window,
      s"storm pair count not linear: ${cand.length} > ${m * window}")
    assert(cand.length >= m - 1, s"storm lost connectivity: ${cand.length}")
    // chain connectivity: union-find over the pairs spans the block
    val parent = Array.tabulate(m)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    cand.foreach { case (a, b) => parent(find(a.toInt)) = find(b.toInt) }
    assert((0 until m).map(find).distinct.size == 1,
      "duplicates not all connected by the window chain")
  }

  test("q_knn_graph_capped: recall and pruning ride the gate; plan stays bounded") {
    // the oracle hash-proves the edge set, candidate mass AND the
    // fixed-panel recall columns; this re-asserts the values so a
    // testdata regeneration can't silently drift the gate regime, and
    // pins the plan (no quadratic operator beyond the deliberate
    // 1-row stats broadcasts and the bounded 100-node panel scan)
    val g = VectorOps.knnGraphCappedGate(
      Tables.embeddings(spark, d), "vec_id", 5)
    val r = g.select("cand_pairs", "all_pairs", "recall_num", "recall_den")
      .head()
    val ratio = r.getLong(0).toDouble / r.getLong(1)
    info(f"cand=${r.getLong(0)} all=${r.getLong(1)} ratio=$ratio%.4f " +
      f"recall=${r.getLong(2)}/${r.getLong(3)}")
    assert(ratio < 0.15, f"capped gate no longer prunes: $ratio%.4f")
    assert(r.getLong(2) == r.getLong(3),
      s"fixed-panel recall below 1.0: ${r.getLong(2)}/${r.getLong(3)}")
    val p = g.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cartesian in capped gate:\n$p")
  }

  test("clustered corpus: LSH twin measured FASTER than the exact form") {
    // 4000 vectors so the exact form's N(N-1)/2 ≈ 8M scored pairs
    // dominate fixed per-query overhead — at 1500 vectors both paths
    // were overhead-bound and the comparison was noise (seen flaking
    // at 2.24s vs 2.14s); the candidate-mass ratio in the sibling
    // test is the scale-free form of the same claim
    val emb = clusteredFixture(4000, clusters = 40, dims = 64, noise = 0.05)
      .localCheckpoint(true)
    def timeMin(f: () => Unit): Long = (1 to 2).map { _ =>
      val t0 = System.nanoTime(); f(); System.nanoTime() - t0
    }.min
    // warm both paths once (codegen + broadcast warm-up off the clock)
    VectorOps.knnGraphMutualLsh(emb, "vec_id", "embedding", 5, 8, 8, maxBucket = None).count()
    VectorOps.knnGraphMutual(emb, "vec_id", "embedding", 5).count()
    val tExact = timeMin(() =>
      VectorOps.knnGraphMutual(emb, "vec_id", "embedding", 5).count())
    val tLsh = timeMin(() =>
      VectorOps.knnGraphMutualLsh(emb, "vec_id", "embedding", 5, 8, 8, maxBucket = None).count())
    info(f"exact=${tExact / 1e9}%.2fs lsh=${tLsh / 1e9}%.2fs speedup=${tExact.toDouble / tLsh}%.1f×")
    assert(tLsh < tExact,
      f"LSH twin not faster on the clustered fixture: lsh=${tLsh / 1e9}%.2fs exact=${tExact / 1e9}%.2fs")
  }

  test("kmeans: hand-traced 2-cluster fixture, determinism, and Lloyd improvement") {
    import spark.implicits._
    // two tight groups on a line; init = the two lowest-id vectors,
    // which both sit in the LEFT group — round 1 pulls centroid 1 to
    // the right group's mass, the final assignment recovers {1,2}|{3,4}
    val emb = Seq(
      (1L, Array(0.0f, 0.0f)),
      (2L, Array(0.1f, 0.0f)),
      (3L, Array(10.0f, 0.0f)),
      (4L, Array(10.1f, 0.0f))).toDF("vec_id", "embedding")
    val got = VectorOps.kmeansAssign(emb, "vec_id", "embedding", k = 2, rounds = 1)
      .collect().map(r => r.getLong(1) -> (r.getLong(0), r.getLong(3)))
    val byCluster = got.groupBy(_._1).view.mapValues(_.map(_._2._1).toSet).toMap
    assert(byCluster(0L) == Set(1L, 2L) && byCluster(1L) == Set(3L, 4L),
      s"got $byCluster")
    assert(got.forall(_._2._2 == 2L), "both clusters hold 2 vectors")
    // real table: deterministic across runs, and Lloyd rounds do not
    // worsen the exact integer inertia (they should sharply improve it
    // from the arbitrary lowest-id init)
    val e = Tables.embeddings(spark, d)
    def inertia(rounds: Int): Long =
      VectorOps.kmeansAssign(e, "vec_id", "embedding", k = 8, rounds = rounds)
        .agg(org.apache.spark.sql.functions.sum("dist2")).head().getLong(0)
    val i0 = inertia(0); val i2 = inertia(2)
    info(s"inertia rounds=0: $i0, rounds=2: $i2")
    assert(i2 <= i0, s"Lloyd rounds worsened inertia: $i0 -> $i2")
    val a = VectorOps.kmeansAssign(e, "vec_id", "embedding", 8, 2).collect()
      .map(_.toString)
    val b = VectorOps.kmeansAssign(e, "vec_id", "embedding", 8, 2).collect()
      .map(_.toString)
    assert(a.sameElements(b), "kmeans must be run-deterministic")
  }

  test("pca power iteration: hand-computed integer trace on a 2-d fixture") {
    import spark.implicits._
    // dominant axis e0 (two unit vectors), minor axis e1 (one half vector)
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.0f), 0),
      (3L, Array(0.0f, 0.5f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = VectorOps.pcaProject(emb).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // cq = [[2e6, 0], [0, 250000]]; w0=(1e6,1e6)
    // it1: wp=(2e12, 2.5e11)  m=2e6 -> w=(1e6, 125000)
    // it2: wp=(2e12, 3.125e10)      -> w=(1e6, 15625)
    // it3: wp=(2e12, 3.90625e9)     -> w=(1e6, 1953)   [trunc div]
    assert(out(1L) == 1000000000000L, s"$out")
    assert(out(2L) == 1000000000000L, s"$out")
    assert(out(3L) == 500000L * 1953L, s"$out")
  }

  test("pca on the real table: projections are sign-pinned and discriminative") {
    val out = VectorOps.pcaProject(Tables.embeddings(spark, d)).collect()
    assert(out.length == 500)
    val projs = out.map(_.getLong(2))
    assert(projs.distinct.length > 400, "projections should spread")
    // deterministic: a second run is bit-identical
    val again = VectorOps.pcaProject(Tables.embeddings(spark, d)).collect()
      .map(_.getLong(2))
    assert(projs.sameElements(again))
  }
}
