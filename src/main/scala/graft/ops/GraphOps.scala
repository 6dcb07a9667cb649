package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Iterative graph analytics over corpus-derived graphs.
  *
  * The motivating use is webgraph-style importance weighting for
  * training-data curation (rank pages/documents by link or similarity
  * structure, then sample high-rank strata harder) — the same family of
  * signal as Common Crawl's harmonic-centrality lists. Here the graph
  * is the near-dup similarity graph the dedup operators already build,
  * so the rank doubles as a "how central is this document in its
  * duplication neighborhood" score.
  *
  * Everything is integer fixed point so the DuckDB oracle replays it
  * bit-for-bit: ranks live in micro-units (1e6 = rank 1.0), damping
  * 0.85 is applied as the exact rational 17/20 with floor division
  * (`div` on longs in Spark, `//` on BIGINTs in DuckDB — both floor for
  * non-negative operands), and every per-node sum is a sum of longs —
  * immune to accumulation order on both engines.
  */
object GraphOps {

  /** Fixed-iteration damped PageRank in integer micro-units.
    *
    * `edges` is a DIRECTED edge list `(src, dst)`; pass both directions
    * for an undirected graph. `nodes` is the full vertex set `(id)` —
    * isolated vertices stay in the result at the bare teleport rank.
    *
    * Per iteration: each node sends `floor(17·r / (20·deg))` along each
    * out-edge and every node restarts from the teleport term
    * `0.15 · 1e6 = 150000`. (Dangling mass is dropped, not
    * redistributed — the standard simplification when the rank is used
    * as a relative ordering signal; documented so the oracle matches.)
    *
    * Scale shape: out-degree is joined into the edge table ONCE before
    * the loop (edges carry `deg`, so iterations don't re-aggregate it).
    * Each iteration is one equi-join of the node-sized rank table
    * against the edge table on `src`, one map-combined sum by `dst`,
    * and one node-sized left join — 100 TB of edges means the edge
    * table dominates and each iteration is two edge shuffles, the
    * textbook distributed PageRank round. K is a constant (monitoring
    * signal, not convergence-to-epsilon), so the lineage stays bounded.
    */
  def pageRankFixed(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    // AQE picks broadcast vs shuffle for the deg attach at runtime; at
    // corpus scale deg is node-sized (≪ edges) but not literal-sized.
    // The deg-annotated edge table is read by EVERY iteration — cut it
    // out of the lineage once (same eager-localCheckpoint idiom as the
    // connected-components rounds; the textbook "cache the edges before
    // the PageRank loop"). Without this, each iteration re-executes the
    // whole upstream edge derivation (for the near-dup graph that is
    // the full Jaccard-pair pipeline): measured 2.5 s → 1.0 s for
    // q_pagerank at sf0.1.
    // plain checkpoint, NOT compactCheckpoint: the deg-annotated edge
    // table is the MAP SIDE of every iteration's rank join — coalescing
    // it serialized that map work (measured 1.53 → 1.74-2.52 s at
    // sf0.1/c32 when compacted; the byte-tracking helper is for
    // node-sized iteration STATE, not for a table feeding heavy joins)
    val edgesDeg = edges.join(deg, Seq("src")).localCheckpoint(true)
    val ids = nodes.select(col("id"))
    var ranks = ids.select(col("id"), lit(1000000L).as("r"))
    for (_ <- 1 to iters) {
      val contrib = edgesDeg
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst"), expr("(17 * r) div (20 * deg)").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("sc"))
      ranks = ids
        .join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"), (lit(150000L) + coalesce(col("sc"), lit(0L))).as("r"))
    }
    ranks
  }

  /** Triangle counting over the near-dup graph (node clustering
    * coefficient): how clique-like each document's duplication
    * neighborhood is — a template/mirror cluster closes almost every
    * wedge (coefficient → 1), while a hub document bridging unrelated
    * near-dup groups closes few (→ 0). The signal that separates
    * "family of boilerplate variants" from "chain of pairwise
    * paraphrases" when deciding what a dedup representative stands for.
    *
    * Standard distributed shape: edges come ordered (a < b); wedges =
    * edge ⋈ edge on the middle vertex (fan-out Σ deg² — exactly the
    * number `q_skew_report` publishes; cap the pair generator's doc
    * freq on duplication-heavy corpora, same lever as everywhere);
    * triangles = wedge ⋈ edge on the closing pair. Every triangle
    * (a<b<c) is found exactly once. The coefficient is exact integer
    * micro-units: (2·t·10⁶) div (deg·(deg−1)). */
  def triangles(s: SparkSession, d: String,
                maxDocFreq: Option[Long] = Scale.DocFreqCap): DataFrame = {
    val docs = Tables.documents(s, d)
    // plain checkpoint, NOT compactCheckpoint: e is the map side of the
    // wedge and closing joins below — coalescing it serialized those
    // joins (measured 1.36 → 1.50-1.57 s at sf0.1/c32 when compacted)
    val e = DedupOps.jaccardPairs(docs, "doc_id", "text", 3, 0.1, maxDocFreq)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
      .localCheckpoint(true) // read three times below; pairs are tiny
    val wedges = e.as("e1").join(e.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("wa"), col("e1.b").as("wb"), col("e2.b").as("wc"))
    val tri = wedges.join(e.as("e3"),
      col("wa") === col("e3.a") && col("wc") === col("e3.b"))
      .select(col("wa").as("a"), col("wb").as("b"), col("wc").as("c"))
    val perNode = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("doc"))
      .groupBy("doc").agg(count(lit(1)).as("n_triangles"))
    val deg = e.select(col("a").as("doc"))
      .unionByName(e.select(col("b").as("doc")))
      .groupBy("doc").agg(count(lit(1)).as("deg"))
    deg.filter(col("deg") >= 2)
      .join(perNode, Seq("doc"), "left")
      .select(col("doc"), col("deg"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .withColumn("clust_micro",
        expr("(2 * n_triangles * 1000000) div (deg * (deg - 1))"))
      .orderBy("doc")
  }

  /** Fixed-round k-core peeling: iteratively drop vertices whose degree
    * within the surviving induced subgraph is < k. After R rounds the
    * survivors approximate the k-core (exactly the k-core once the
    * peeling has converged; R is a fixed constant so the DuckDB oracle
    * can replay the rounds as unrolled CTEs, the same
    * monitoring-signal-not-convergence contract as [[pageRankFixed]]).
    *
    * Dense cores = template/mirror families whose duplication survives
    * aggressive peeling — the strongest "this whole neighborhood is one
    * boilerplate artifact" signal on the near-dup graph, one level up
    * from connected components (a CC can be a long weak chain; a k-core
    * cannot).
    *
    * Scale shape: each round is two semi-shaped equi-joins of the edge
    * table against the node-sized survivor set (AQE broadcasts the
    * survivor side once peeling shrinks it) and one map-combined count
    * by src — no wedges, no pair blowup. The survivor set is
    * localCheckpointed per round so round r+1 doesn't replay rounds
    * 1..r (bounded lineage, the CC-loop idiom).
    *
    * `edges` is the symmetrized (src,dst) list; output is one row per
    * surviving vertex with its qualifying in-core degree. */
  def kCoreFixed(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(rounds >= 1, "kCoreFixed needs at least one peeling round")
    var survivors = edges.select(col("src").as("doc")).distinct()
    var out: DataFrame = null
    for (_ <- 1 to rounds) {
      val deg = edges
        .join(survivors.withColumnRenamed("doc", "src"), Seq("src"))
        .join(survivors.withColumnRenamed("doc", "dst"), Seq("dst"))
        .groupBy("src").agg(count(lit(1)).as("deg"))
      out = Scale.compactCheckpoint(deg.filter(col("deg") >= k))
      survivors = out.select(col("src").as("doc"))
    }
    out.select(col("src").as("doc"), col("deg"))
  }

  /** The shared document near-dup edge set: symmetrized 3-gram Jaccard
    * pairs at τ=0.1 (exactly `q_jaccard_pairs`' pair set, both
    * directions), eager-localCheckpointed because every iterative
    * consumer (PageRank / k-core / HyperBall rounds) re-reads it.
    * Symmetrization is ONE pass over the pair stream (explode of the
    * two directions), not a self-union that would run the Jaccard
    * pipeline twice. */
  private[graft] def neardupEdges(s: SparkSession, d: String,
                                maxDocFreq: Option[Long]): DataFrame = {
    val docs = Tables.documents(s, d)
    val pairs = DedupOps.jaccardPairs(docs, "doc_id", "text", 3, 0.1, maxDocFreq)
    val sym = pairs.select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    Scale.compactCheckpoint(sym)
  }

  /** k-core over the document near-dup graph (same edge set as
    * [[docPageRank]]), k=2, 4 peeling rounds. `maxDocFreq` is the
    * usual duplication-skew lever on the pair generator. */
  def docKCore(s: SparkSession, d: String, k: Int = 2, rounds: Int = 4,
               maxDocFreq: Option[Long] = Scale.DocFreqCap): DataFrame = {
    kCoreFixed(neardupEdges(s, d, maxDocFreq), k, rounds)
      .select(col("doc").as("doc_id"), col("deg"))
      .orderBy("doc_id")
  }

  /** HyperBall-style neighborhood function (Boldi–Vigna): per node,
    * the estimated size of its distance-≤2 ball, computed by merging
    * per-node HLL REGISTER FILES along edges for two rounds — never by
    * materializing the 2-hop pair set. This is the algorithm that
    * makes centrality/ball-size telemetry feasible on a 100 TB graph:
    * per round the state is O(nodes·registers-hit), merges are
    * per-register `max` (associative, partial-aggregating map-side),
    * and the round is one edge join + one hash-agg — the exact-ball
    * side below (a deg² wedge expansion) exists only as the small-sf
    * calibration twin, the `q_hll_err` pattern.
    *
    * Register law is identical to [[DataQueries.hllErr]] (m=512,
    * trailing-zero rank via pure bit ops, exact-integer harmonic sum,
    * IEEE-exact raw estimate — no transcendentals), so the DuckDB
    * oracle replays registers, merge rounds, and estimate
    * bit-for-bit. Two readouts ship side by side: `n_regs_hit` is the
    * small-ball estimate (for ball ≪ m, collisions are ~n²/2m and the
    * hit count ≈ the ball size), `hll_raw` is the raw sketch that
    * takes over at scale; `err` is the raw sketch's signed error vs
    * the exact ball — the small-cardinality bias the (ln-requiring,
    * so deliberately absent) linear-counting correction would remove.
    */
  def hyperBall(s: SparkSession, d: String, rounds: Int = 2,
                maxDocFreq: Option[Long] = Scale.DocFreqCap): DataFrame =
    hyperBallOf(neardupEdges(s, d, maxDocFreq), rounds)

  /** Register states after EACH of `rounds` merge rounds, rolled up
    * per node: Seq of (v, n_regs_hit, s_hit), element r−1 = radius-r
    * ball sketch. The ONLY corpus-scale work in the HyperBall family —
    * per-round cost is one edge join plus a per-register max (map-side
    * combining), state is nodes×512 registers. */
  private def hyperBallRegRounds(edges: DataFrame,
                                 rounds: Int): Seq[DataFrame] = {
    val nodes = edges.select(col("src").as("v")).distinct()
    var regs = nodes
      .withColumn("h", graft.ops.TextOps.h64(col("v").cast("string")))
      .select(col("v"), expr("h & 511").as("b"),
        when(expr("shiftright(h, 9)") === 0, lit(52))
          .otherwise(expr(
            "bit_count((shiftright(h, 9) & -shiftright(h, 9)) - 1) + 1"))
          .cast("int").as("r"))
      .localCheckpoint(true)
    (1 to rounds).map { _ =>
      val recv = edges.join(regs.withColumnRenamed("v", "dst"), Seq("dst"))
        .select(col("src").as("v"), col("b"), col("r"))
      regs = recv.unionByName(regs.select("v", "b", "r"))
        .groupBy("v", "b").agg(max("r").as("r"))
        .localCheckpoint(true)
      regs.groupBy("v").agg(
        count(lit(1)).as("n_regs_hit"),
        sum(expr("shiftleft(cast(1 as bigint), 52 - r)")).as("s_hit"))
    }
  }

  private def hyperBallRegs(edges: DataFrame, rounds: Int): DataFrame =
    hyperBallRegRounds(edges, rounds).last

  private def hllRawCol: Column = expr(
    "cast(round((719783e0 * 262144 * 4503599627370496e0)" +
    " / (cast(s_total as double) * 1e6)) as bigint)")

  /** Production HyperBall: sketch only — per node the register-hit
    * count and raw-HLL ball estimate, no exact-ball computation
    * anywhere in the plan. THIS is the entry point for a real graph;
    * [[hyperBallOf]] (which inlines the deg² exact-ball wedge next to
    * the sketch) is the small-sf calibration twin, same split as
    * `bandIndex`/`q_state_probe` vs the exact probes. */
  def hyperBallSketch(s: SparkSession, d: String, rounds: Int = 2,
                      maxDocFreq: Option[Long] = Scale.DocFreqCap): DataFrame =
    hyperBallSketchOf(neardupEdges(s, d, maxDocFreq), rounds)

  /** [[hyperBallSketch]] over an arbitrary symmetrized edge list. */
  def hyperBallSketchOf(edges: DataFrame, rounds: Int): DataFrame =
    hyperBallRegs(edges, rounds)
      .withColumn("s_total",
        col("s_hit") + (lit(512L) - col("n_regs_hit"))
          * expr("shiftleft(cast(1 as bigint), 52)"))
      .withColumn("hll_raw", hllRawCol)
      .select(col("v").as("doc_id"), col("n_regs_hit"), col("hll_raw"))
      .orderBy("doc_id")

  /** HARMONIC CENTRALITY via HyperBall — the sketch family's canonical
    * application (Boldi & Vigna, "In-Core Computation of Geometric
    * Centralities with HyperBall", 2013): with ball estimates b_r at
    * radius r, harmonic centrality ≈ Σ_r (b_r − b_{r−1})/r. Two rounds
    * here (the near-dup graph's diameter is short); the per-radius
    * shell estimates come from the SAME register merges as
    * [[hyperBallSketch]] — register files only grow under max-merge,
    * so b_2 ≥ b_1 and the shells are non-negative by construction
    * except for the raw-sketch small-cardinality bias at b_1 < 1,
    * which the greatest(0, ·) floor absorbs (documented, same bias
    * q_hll_err calibrates). Micro-unit integer output, fully oracled.
    *
    * At 100 TB this ranks every page by "how close is everything
    * else" in ONE register-merge pass per radius — the centrality
    * Common Crawl publishes for its host graph. */
  def harmonicCentrality(s: SparkSession, d: String,
                         maxDocFreq: Option[Long] = Scale.DocFreqCap): DataFrame = {
    val rounds = hyperBallRegRounds(neardupEdges(s, d, maxDocFreq), 2)
    def ball(df: DataFrame, bn: String): DataFrame = df
      .withColumn("s_total",
        col("s_hit") + (lit(512L) - col("n_regs_hit"))
          * expr("shiftleft(cast(1 as bigint), 52)"))
      .select(col("v"), hllRawCol.as(bn))
    ball(rounds(0), "b1").join(ball(rounds(1), "b2"), Seq("v"))
      .select(col("v").as("doc_id"), col("b1"), col("b2"),
        expr("greatest(b1 - 1, 0) * 1000000" +
          " + (greatest(b2 - b1, 0) * 1000000) div 2")
          .as("harmonic_micro"))
      .orderBy(col("harmonic_micro").desc, col("doc_id"))
  }

  /** [[hyperBall]] over an arbitrary symmetrized (src,dst) edge list —
    * calibration twin: sketch PLUS the exact distance-≤2 ball and the
    * signed error. The wedge expansion is deg² — never run this form
    * on a production graph; use [[hyperBallSketchOf]]. */
  def hyperBallOf(edges: DataFrame, rounds: Int): DataFrame = {
    val nodes = edges.select(col("src").as("v")).distinct()
    val sk = hyperBallRegs(edges, rounds)
    // exact distance-≤2 ball (self ∪ N ∪ N²) — calibration twin only
    val d1 = edges.select(col("src").as("a"), col("dst").as("c"))
      .unionByName(nodes.select(col("v").as("a"), col("v").as("c")))
    val d2 = d1.join(edges.withColumnRenamed("src", "c"), Seq("c"))
      .select(col("a"), col("dst").as("c"))
      .unionByName(d1)
    val exact = d2.distinct().groupBy(col("a").as("v"))
      .agg(count(lit(1)).as("n_exact"))
    sk.join(exact, Seq("v"))
      .withColumn("s_total",
        col("s_hit") + (lit(512L) - col("n_regs_hit"))
          * expr("shiftleft(cast(1 as bigint), 52)"))
      .withColumn("hll_raw", hllRawCol)
      .select(col("v").as("doc_id"), col("n_exact"), col("n_regs_hit"),
        col("hll_raw"), (col("hll_raw") - col("n_exact")).as("err"))
      .orderBy("doc_id")
  }

  /** Synchronous label propagation (fixed unrolled rounds) over the
    * near-dup graph: every node starts as its own label; each round it
    * adopts its neighbors' PLURALITY label, ties resolved to the
    * smallest label (a total order, so the sync schedule is fully
    * deterministic and the DuckDB twin replays every round).
    * Community detection is the soft complement of the hard CC dedup
    * groups: CC fuses anything connected, LPA splits weakly-bridged
    * template families, and (community, size) next to the CC id is
    * the "is this one family or two glued by a bridge doc" signal.
    * Isolated documents keep their own id.
    *
    * Scale shape: per round ONE edge-sized hash join against the
    * (node, label) frame plus a map-combined (node, label) count —
    * labels are 8 bytes, strings never shuffle; per-round
    * localCheckpoint truncates the iteration lineage exactly like
    * PageRank/k-core. `maxDocFreq` is the same skew lever as every
    * consumer of [[neardupEdges]]. */
  def labelProp(s: SparkSession, d: String, rounds: Int = 3,
                maxDocFreq: Option[Long] = Scale.DocFreqCap): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"))
    val edges = neardupEdges(s, d, maxDocFreq)
    // Per-round EAGER checkpoints stay: a lazy rounds-deep chain was
    // measured SLOWER at sf0.1/c32 (q_label_prop_capped 2.5 → 3.3 s,
    // q_modularity 2.7 → 3.5 s in a same-window A/B) — ReuseExchange
    // already dedups the repeated per-round subtrees, and the deep
    // single job loses AQE's per-stage runtime re-planning.
    var labels = lpSeed(edges).localCheckpoint(true)
    for (_ <- 1 to rounds)
      labels = lpRound(edges, labels).localCheckpoint(true)
    val alln = docs
      .join(labels.withColumnRenamed("v", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("lbl"), col("doc_id")).as("community"))
    lpSized(alln)
  }

  /** [[labelProp]] run to CONVERGENCE instead of a fixed round count:
    * the same deterministic sync schedule, stopping at the first
    * FIXPOINT (a round that changes no label) or the first PERIOD-2
    * CYCLE (this round's labels equal those two rounds ago). The cycle
    * check is not an optional nicety: synchronous
    * take-the-neighborhood-majority LPA provably 2-cycles on bipartite
    * components, and a near-dup corpus graph is FULL of 2-node
    * duplicate-pair components (EdgeCaseSpec pins the K2 oscillation as
    * the deterministic contract) — a fixpoint-only loop would exhaust
    * its entire `maxRounds` valve on every real dedup graph. With the
    * cycle stop, duplicate-heavy corpora settle in a handful of rounds.
    * `maxRounds` stays as the final safety valve (longer cycles exist).
    * Detection price: two existence-check jobs per round over the
    * 16-byte (node, label) frames — far cheaper than the wasted rounds
    * of a conservative fixed count. The declared fixed-round queries
    * stay unchanged as the oracle-able twins (a SQL oracle replays k
    * rounds, not a data-dependent stop); the bridging law, pinned by
    * GraphRetrievalSpec on the corpus graph, is that the converged form
    * output ≡ the fixed-round form at the stop round it reports. */
  def labelPropConverged(s: SparkSession, d: String, maxRounds: Int = 20,
                         maxDocFreq: Option[Long] = Scale.DocFreqCap): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id").as("id"))
    val edges = neardupEdges(s, d, maxDocFreq).localCheckpoint(true)
    val (lab, _, _) = labelPropConvergedOf(docs, edges, maxRounds)
    lpSized(lab.select(col("id").as("doc_id"), col("community")))
  }

  /** Partition-quality telemetry: per-community NEWMAN-MODULARITY
    * terms for two partitions of the SAME near-dup graph — connected
    * components ('cc') vs label propagation ('lp') — the number a
    * pipeline reads before trusting dedup groups as training shards.
    * Exact integers only: with m undirected edges, E_c intra edges
    * and D_c the community degree sum, the community's contribution
    * to Q is (4·m·E_c − D_c²) / 4m² — emitted as the `q_num` /
    * `q_den` pair, NO division in the artifact (floor-vs-truncate
    * semantics diverge across engines on negative numerators; the
    * caller sums q_num and divides once). CC is the upper bound on
    * coverage (E_c = m exactly, every edge internal); LP trades
    * coverage for balance — the comparison IS the telemetry. All
    * hash-join algebra on the shared checkpointed edge list; the only
    * driver value is the 1-row edge count. */
  def modularity(s: SparkSession, d: String, rounds: Int = 3,
                 maxDocFreq: Option[Long] = Scale.DocFreqCap): DataFrame = {
    val edges = neardupEdges(s, d, maxDocFreq)
    val und = edges.filter(col("src") < col("dst")).localCheckpoint(true)
    val m = und.count()
    val deg = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val cc = DedupOps.connectedComponents(und)
      .select(col("node").as("id"), col("comp").as("community"))
    // lp stays LAZY although read three times below: ReuseExchange
    // dedups the repeated LPA subtrees, and a checkpoint here was
    // measured SLOWER at sf0.1/c32 (q_modularity 2.7 → 3.5 s,
    // same-window A/B) — the materialization job serializes what the
    // final job runs as parallel shared stages.
    val lp = labelPropOf(deg.select("id"), edges, rounds)
      .select(col("id"), col("community"))
    def stats(part: DataFrame, scheme: String): DataFrame = {
      val dsum = part.join(deg, Seq("id"))
        .groupBy("community")
        .agg(count(lit(1)).as("n_nodes"), sum("deg").as("d_sum"))
      val ein = und
        .join(part.select(col("id").as("src"), col("community").as("ca")),
          Seq("src"))
        .join(part.select(col("id").as("dst"), col("community").as("cb")),
          Seq("dst"))
        .filter(col("ca") === col("cb"))
        .groupBy(col("ca").as("community")).agg(count(lit(1)).as("e_in"))
      dsum.join(ein, Seq("community"), "left")
        .select(lit(scheme).as("scheme"), col("community"), col("n_nodes"),
          coalesce(col("e_in"), lit(0L)).as("e_in"), col("d_sum"))
    }
    stats(cc, "cc").unionByName(stats(lp, "lp"))
      .withColumn("q_num",
        lit(4L * m) * col("e_in") - col("d_sum") * col("d_sum"))
      .withColumn("q_den", lit(4L * m * m))
      .orderBy("scheme", "community")
  }

  /** Initial LPA labels: every node its own label. */
  private def lpSeed(edges: DataFrame): DataFrame =
    edges.select(col("src").as("v")).distinct().withColumn("lbl", col("v"))

  /** One synchronous LPA round: each node takes its neighborhood's
    * most frequent label, ties to the smallest (the shared kernel of
    * the fixed-round and converged forms — one edge-sized hash join +
    * a map-combined (node, label) count). */
  private def lpRound(edges: DataFrame, labels: DataFrame): DataFrame = {
    val nb = edges.join(labels.withColumnRenamed("v", "dst"), Seq("dst"))
      .groupBy(col("src").as("v"), col("lbl"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("v").orderBy(col("c").desc, col("lbl").asc)
    nb.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("v"), col("lbl"))
  }

  /** Attach community sizes, the declared-query output shape. */
  private def lpSized(alln: DataFrame): DataFrame = {
    val sizes = alln.groupBy("community").agg(count(lit(1)).as("comm_size"))
    alln.join(sizes, Seq("community"))
      .select(col("doc_id"), col("community"), col("comm_size"))
      .orderBy("doc_id")
  }

  /** [[labelProp]] over an arbitrary symmetrized edge list plus a node
    * frame (for the property spec). */
  private[graft] def labelPropOf(nodes: DataFrame, edges: DataFrame,
                                 rounds: Int): DataFrame = {
    var labels = lpSeed(edges)
    for (_ <- 1 to rounds)
      labels = lpRound(edges, labels)
    nodes.join(labels.withColumnRenamed("v", "id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("lbl"), col("id")).as("community"))
  }

  /** Convergence-detecting core shared by [[labelPropConverged]]:
    * iterates [[lpRound]] with per-round localCheckpoint (lineage
    * truncation, same discipline as the fixed-round form) until a
    * fixpoint, a repeated state (cycle of ANY period), or `maxRounds`.
    * Returns (assignment, rounds actually run, stop reason ∈
    * {fixpoint, cycle, valve}). The returned assignment is exactly
    * [[labelPropOf]] at the returned round count — the bridging law
    * the spec pins, which holds for EVERY stop reason.
    *
    * Cycle detection is a 64-bit state signature per round —
    * bit_xor(xxhash64(v, lbl)), one scalar aggregate (XOR: overflow-
    * free under ANSI mode, order-independent, and sound here because
    * (v, lbl) rows are unique per v — no self-cancelling duplicates) —
    * kept in a driver-side set: a repeat means the dynamics re-entered a
    * previous state, so every later round stays inside the cycle and
    * nothing new can be learned. This upgrades round-8's exact
    * period-2 probe to arbitrary periods at the SAME two jobs per
    * round (one fixpoint existence check + one signature aggregate).
    * On undirected (symmetrized) edges, synchronous plurality dynamics
    * with a fixed tie order has eventual period ≤ 2 (Poljak & Sůra
    * 1983, "On periodical behaviour in societies with symmetric
    * influences" — the classic Goles-Olivos threshold argument
    * extended to plurality), so there the signature only re-derives
    * the period-2 stop; the general detector matters for DIRECTED
    * edge lists fed through [[labelPropConvergedOf]] directly, where
    * rotations of any period occur (EdgeCaseSpec pins a period-4
    * directed ring). A signature collision (≈2⁻⁶⁴ per comparison)
    * would stop early with a valid fixed-round assignment — the same
    * semantics as the maxRounds valve, so soundness is unaffected.
    * Fixpoint keeps its EXACT existence check: `fixpoint` is a
    * stability CLAIM callers may act on, never probabilistic. */
  private[graft] def labelPropConvergedOf(nodes: DataFrame, edges: DataFrame,
      maxRounds: Int): (DataFrame, Int, String) = {
    def differs(a: DataFrame, b: DataFrame): Boolean = a
      .join(b.withColumnRenamed("lbl", "prev"), Seq("v"))
      .filter(col("lbl") =!= col("prev"))
      .limit(1).count() > 0
    def sig(df: DataFrame): Long = df
      .agg(coalesce(expr("bit_xor(xxhash64(v, lbl))"), lit(0L)))
      .head().getLong(0)
    var labels = lpSeed(edges).localCheckpoint(true)
    val seen = scala.collection.mutable.Set(sig(labels))
    var r = 0
    var reason = "valve"
    while (reason == "valve" && r < maxRounds) {
      val next = lpRound(edges, labels).localCheckpoint(true)
      r += 1
      if (!differs(next, labels)) reason = "fixpoint"
      else if (!seen.add(sig(next))) reason = "cycle"
      labels = next
    }
    (nodes.join(labels.withColumnRenamed("v", "id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("lbl"), col("id")).as("community")),
      r, reason)
  }

  /** PageRank over the document near-dup graph: edges = symmetrized
    * 3-gram Jaccard pairs at τ=0.1 (exactly `q_jaccard_pairs`' pair
    * set), 3 iterations. Output carries the degree so the rank is
    * interpretable (deg=0 rows receive no contributions and sit at
    * exactly the 150000-micro-unit teleport floor after iteration 1).
    *
    * `maxDocFreq` is the duplication-skew lever inherited from the
    * pair generator: uncapped pairs are the small-sf oracle baseline,
    * but on a duplication-heavy corpus candidate pairs grow as
    * docFreq² per shingle — at scale pass the cap (a small multiple of
    * the expected duplication factor), exactly as `q_jaccard_capped`
    * does for the dedup path. The iteration shape is unaffected. */
  def docPageRank(s: SparkSession, d: String, iters: Int = 3,
                  maxDocFreq: Option[Long] = Scale.DocFreqCap): DataFrame = {
    val docs = Tables.documents(s, d)
    val edges = neardupEdges(s, d, maxDocFreq)
    val nodes = docs.select(col("doc_id").as("id"))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    pageRankFixed(nodes, edges, iters)
      .join(deg.withColumnRenamed("src", "id"), Seq("id"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("deg"), lit(0L)).as("deg"),
        round(col("r") / 1e6, 6).as("pagerank"))
      .orderBy(col("pagerank").desc, col("doc_id"))
  }
}
