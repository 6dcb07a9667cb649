package graft.pipelines

import graft.Tables
import graft.ops.{RankKernel, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** END-TO-END training-corpus pipeline: the individual cleaning
  * operators this library ships (each oracle-gated on its own) composed
  * the way a real pre-training data build runs them, as ONE declared
  * query — because the lineage bugs of rounds 5-6 were exactly
  * cross-stage composition effects (a stage silently re-reading or
  * re-deriving what the previous stage already transformed).
  *
  * Stages, each a funnel step over the previous stage's survivors:
  *   0 raw               — the whole corpus (token mass = raw tokens)
  *   1 gopher            — Rae et al. rule gate (graft.ops.TextOps.gopherKeep)
  *   2 self_dedup        — within-doc repeated-8-token-window removal;
  *                         docs unchanged, token mass moves to the KEPT
  *                         sequence (drop_repeated_windows, one map pass)
  *   3 exact_dedup       — first occurrence per kept-content hash
  *   4 windowed_neardup  — time-windowed 3-gram Jaccard pairs (|batch
  *                         diff| ≤ 1, τ=0.1, the q_windowed_dedup shape);
  *                         the LATER doc of every pair drops
  *   5 decontam          — benchmark docs (id%20=0) and anything sharing
  *                         ≥5 distinct 5-gram shingles with them drop
  *   6 quality_deciles   — per-language ntile(10) by composite quality;
  *                         deciles 8-10 drop
  *   7 mixture           — per-language token budget: highest-quality
  *                         docs first until ≤ 50% of the language's
  *                         post-stage-6 token mass (integer floor)
  *
  * Scale shape: ALL per-document signals (gopher, kept windows, both
  * shingle sets, quality) are computed in ONE projection over the
  * corpus and eagerly localCheckpointed — the corpus parquet is
  * scanned exactly once, and every stage (including both sides of the
  * near-dup self-join and the benchmark side of decontamination) reads
  * the checkpointed signal frame. PipelineSpec pins the executed plan
  * to ZERO parquet scans (and no quadratic join). Per-stage output is
  * (stage_no, stage, n_docs, n_tokens), each an aggregate row — the
  * counts + token-mass audit a data build publishes per stage. */
object Corpus {

  /** ALL per-document signals in ONE projection over a `(doc_id, lang,
    * text)` frame — shared VERBATIM by the batch pipeline below and the
    * incremental maintainer ([[graft.streaming.StreamOps]]
    * `maintainPipeline`), so the two can never drift on a signal
    * definition. Columns: doc_id, lang, n_words, keep_gopher, shs3,
    * shs5, q, n_kept, kept_hash, is_bench. */
  private[graft] def signalFrame(docs: DataFrame): DataFrame = {
    val (nWords, meanLen, alphaFrac, stopHits) = TextOps.gopherSignals(col("text"))
    // arrival stamp pass-through: the incremental maintainer keys its
    // order-sensitive rules (first occurrence, later-doc drop) on the
    // ARRIVAL order (__arr = batch arrival index, doc_id tiebreak);
    // the batch pipeline runs with a constant 0, which reduces the
    // lexicographic (arr, doc_id) key to plain doc_id — the original
    // semantics, unchanged
    val arr = if (docs.columns.contains("__arr")) col("__arr") else lit(0L)
    docs.select(
        col("doc_id"), col("lang"), arr.as("__arr"),
        nWords.cast("long").as("n_words"),
        TextOps.gopherKeep(nWords, meanLen, alphaFrac, stopHits).as("keep_gopher"),
        call_function("drop_repeated_windows",
          TextOps.tokens(col("text")), lit(8)).as("kept"),
        TextOps.shingleHashes(col("text"), 3).as("shs3"),
        TextOps.shingleHashes(col("text"), 5).as("shs5"),
        TextOps.qualityScore(col("text")).as("q"))
      .withColumn("n_kept", size(col("kept")).cast("long"))
      .withColumn("kept_hash", TextOps.h64(array_join(col("kept"), " ")))
      .withColumn("is_bench", col("doc_id") % 20 === 0)
      .drop("kept")
  }

  /** Stages 6-7 over the stage-5 survivor frame (needs doc_id, lang,
    * q, n_kept): per-language quality deciles ≤ 7, then the 50% token
    * mixture — ONE skew-safe RankKernel pass, shared by the batch
    * pipeline and the maintainer's read face.
    *
    * One pass suffices because stage 6 is a PREFIX of the stage-5
    * ordering: the arithmetic ntile is monotone in the exact rank, so
    * "deciles 1-7" is exactly "rank ≤ per-language boundary". For any
    * stage-6 row every strictly-earlier stage-5 row is therefore also
    * in stage 6, which makes the stage-5 running token mass equal to
    * the stage-6 running mass on the surviving rows — stage 7 reuses
    * `__cum_before` verbatim and only needs stage 6's per-language
    * token total (a tiny broadcast aggregate), not a second bucketed
    * rank. Same oracle algebra, one kernel instead of two.
    *
    * The kernel input is PROJECTED to the four columns the ranking and
    * the downstream audits read (doc_id, lang, q, n_kept) — the
    * stage-5 frame still carries per-doc shingle-hash ARRAYS at this
    * point, and without the projection they ride the fan-back join,
    * the intra-bucket sort, the ranked checkpoint, and every audit
    * re-read (measured ~35% of the whole pipeline's time at sf0.1;
    * at 100 TB they're the bulk of the stage's shuffle bytes). */
  private[graft] def rankStages(s5: DataFrame): (DataFrame, DataFrame) = {
    // bucket-level prune: a score bucket whose FIRST rank already falls
    // past decile 7 contains only stage-6 rejects (the arithmetic ntile
    // is monotone in rank), so it never reaches the intra-bucket sort
    // or the checkpoint — the kernel ranks only the surviving ~70%.
    // b7 = last rank inside decile 7, the exact ntileOfRank boundary.
    val rem = pmod(col("__n"), lit(10L))
    val b7 = lit(7L) * ((col("__n").cast("double") - rem.cast("double")) / 10)
      .cast("long") + least(lit(7L), rem)
    val ranked = RankKernel.withStratumRank(
        s5.select("doc_id", "lang", "q", "n_kept"), "lang", "q", "doc_id",
        mass = Some("n_kept"), prune = Some(col("__noff") < b7))
      .localCheckpoint(true)
    val s6 = ranked
      .filter(RankKernel.ntileOfRank(col("__rank"), col("__n"), 10) <= 7)
    val tot6 = s6.groupBy("lang").agg(sum("n_kept").as("__m6"))
    val s7 = s6.join(broadcast(tot6), Seq("lang"))
      .filter(col("__cum_before") + col("n_kept") <= expr("(__m6 * 50) div 100"))
    (s6.drop("__rank", "__n", "__cum_before", "__m"),
      s7.drop("__rank", "__n", "__cum_before", "__m", "__m6"))
  }

  /** One audit row: (stage_no, stage, n_docs, n_tokens) over a stage's
    * survivor frame, token mass from `tok`. */
  private[graft] def stageAudit(df: DataFrame, no: Int, name: String,
                                tok: String): DataFrame =
    df.agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col(tok)), lit(0L)).as("n_tokens"))
      .select(lit(no.toLong).as("stage_no"), lit(name).as("stage"),
        col("n_docs"), col("n_tokens"))

  def pipelineE2e(s: SparkSession, d: String): DataFrame =
    pipelineAudit(Tables.documents(s, d))

  /** The full 8-stage funnel over any `(doc_id, lang, text)` frame —
    * optionally carrying an `__arr` arrival stamp (see [[signalFrame]]);
    * without one, every order-sensitive rule keys on doc_id, the
    * declared-query semantics. PipelineSpec uses this with PERMUTED
    * arrival stamps as the batch-recompute twin of the incremental
    * maintainer. */
  private[graft] def pipelineAudit(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // spread the corpus across the session's parallelism BEFORE the
    // signal projection: on a single-split local file the whole
    // gopher+tokens+2×shingles+quality chain ran as ONE task (774 ms
    // serial at sf0.1, the query's largest stage) feeding the base
    // checkpoint. The exchange ships the raw (doc_id, lang, text) rows
    // once — far smaller than the signal frame it unblocks — and at
    // cluster scale a corpus scan already has ≥ cores splits, where
    // AQE leaves this keyed exchange as the signal frame's natural
    // width anyway.
    val spread = docs.repartition(
      docs.sparkSession.sessionState.conf.numShufflePartitions,
      col("doc_id"))
    val base = signalFrame(spread)
      .localCheckpoint(true)

    val s1 = base.filter(col("keep_gopher"))
    val s2 = s1 // self-dedup transforms text; the metric moves to n_kept
    // stage frames feeding MULTIPLE consumers (their own audit row,
    // both sides of the pair self-join, the decontam probe, the s7
    // window pair) are checkpointed — doc-count-sized frames, and
    // without them each stage aggregate re-executes the upstream
    // join/window chain (measured: 7.5 s vs 5.2 s at sf0.1)
    val s3 = s2.withColumn("rk", row_number().over(
        Window.partitionBy("kept_hash").orderBy("__arr", "doc_id")))
      .filter(col("rk") === 1).drop("rk")
      .localCheckpoint(true)

    // windowed near-dup among stage-3 survivors: (shingle, bucket)
    // keys with {b, b+1} replication on ONE side only — the probe side
    // joins at its own bucket, so a pair with |batch diff| ≤ 1 meets
    // in at least one orientation (replicating BOTH sides would shuffle
    // the same pairs at ~1.3× the exploded volume). Orientation is then
    // NORMALIZED by arrival order instead of filtered: a |diff|=1 pair
    // may meet only in its "wrong" orientation. Exact Jaccard; the
    // later-arriving doc of each pair drops.
    val ex = s3.select(col("doc_id"),
        struct(col("__arr"), col("doc_id")).as("ord"),
        (col("doc_id") % 10).as("batch"),
        size(col("shs3")).as("sz"), explode_outer(col("shs3")).as("sh"))
      .filter(col("sh").isNotNull)
    val aSide = ex.select(col("doc_id").as("doc_a"), col("ord").as("ord_a"),
      col("sz").as("sz_a"), col("sh"), col("batch").as("ba"),
      col("batch").as("bk"))
    val bSide = ex.select(col("doc_id").as("doc_b"), col("ord").as("ord_b"),
      col("sz").as("sz_b"), col("sh"), col("batch").as("bb"),
      explode(array(col("batch"), col("batch") + 1)).as("bk"))
    // the LATER-arriving side of each pair drops: lexicographic
    // (arr, doc_id) — plain doc_id order when every __arr is 0
    val later = col("ord_a") > col("ord_b")
    // each (pair, shingle) row is UNIQUE by construction, so the
    // pre-aggregation distinct() is gone (it was a full shuffle of the
    // largest intermediate): a same-batch pair meets in both
    // orientations (probe at its own bucket hits the build replica at
    // bb in each direction) — the ord_a < ord_b filter keeps exactly
    // one — while a |batch diff| = 1 pair meets in exactly one
    // orientation (only one side's bucket equals the other's replica),
    // which the ord normalization below flips when needed
    val dropB = aSide.join(bSide, Seq("sh", "bk"))
      .filter(col("doc_a") =!= col("doc_b") &&
        (col("ba") =!= col("bb") || col("ord_a") < col("ord_b")))
      .select(
        when(later, col("doc_b")).otherwise(col("doc_a")).as("doc_a"),
        when(later, col("sz_b")).otherwise(col("sz_a")).as("sz_a"),
        when(later, col("doc_a")).otherwise(col("doc_b")).as("doc_b"),
        when(later, col("sz_a")).otherwise(col("sz_b")).as("sz_b"),
        col("sh"))
      .groupBy("doc_a", "doc_b", "sz_a", "sz_b")
      .agg(count(lit(1)).as("inter"))
      .filter(col("inter").cast("double")
        / (col("sz_a") + col("sz_b") - col("inter")) >= 0.1)
      .select(col("doc_b").as("doc_id")).distinct()
    // the one mid-pipeline materialization: everything upstream of the
    // shingle pair join is cheap to recompute from the base checkpoint,
    // but the join itself must run once, not once per stage aggregate.
    // shs3 is DONE after the pair join — dropping it here (and shs5
    // after the decontam probe below) keeps the per-doc hash arrays
    // out of every later checkpoint and audit re-read
    val s4 = s3.join(dropB, Seq("doc_id"), "left_anti")
      .drop("shs3")
      .localCheckpoint(true)

    // decontamination: the benchmark shingle set derives from the SAME
    // checkpointed frame (no second corpus scan) and broadcasts
    val benchSh = base.filter(col("is_bench"))
      .select(explode(col("shs5")).as("sh")).distinct()
      .withColumn("__hit", lit(1L))
    val contaminated = s4
      .select(col("doc_id"), explode_outer(col("shs5")).as("sh"))
      .join(broadcast(benchSh), Seq("sh"), "left")
      .groupBy("doc_id")
      .agg(sum(coalesce(col("__hit"), lit(0L))).as("n_hits"))
      .filter(col("n_hits") >= 5)
      .select("doc_id")
    val s5 = s4.filter(!col("is_bench"))
      .join(contaminated, Seq("doc_id"), "left_anti")
      .drop("shs5")
      .localCheckpoint(true)

    // stages 6-7 use the skew-safe RankKernel two-pass (bucketed exact
    // rank / running sum): no window here ever sorts a whole language
    // on one task — the only bare-`lang` windows run over the kernel's
    // tiny per-(lang, score-bucket) table. Stage 7's prune drops whole
    // buckets past the 50% token budget before the intra-bucket window.
    val (s6, s7) = rankStages(s5)

    stageAudit(base, 0, "raw", "n_words")
      .unionByName(stageAudit(s1, 1, "gopher", "n_words"))
      .unionByName(stageAudit(s2, 2, "self_dedup", "n_kept"))
      .unionByName(stageAudit(s3, 3, "exact_dedup", "n_kept"))
      .unionByName(stageAudit(s4, 4, "windowed_neardup", "n_kept"))
      .unionByName(stageAudit(s5, 5, "decontam", "n_kept"))
      .unionByName(stageAudit(s6, 6, "quality_deciles", "n_kept"))
      .unionByName(stageAudit(s7, 7, "mixture", "n_kept"))
      .orderBy("stage_no")
  }
}
