package graft

/** End-to-end corpus pipeline pins: the composition laws the
  * per-stage oracles can't see. */
class PipelineSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("pipeline: corpus parquet is scanned ONCE — stages read the checkpoint") {
    // the round-5/6 lineage-bug class was a stage silently re-deriving
    // the corpus: every signal is checkpointed up front, so the final
    // executed plan must contain NO parquet scan at all (the one scan
    // happened at checkpoint materialization) and no quadratic join
    val df = pipelines.Corpus.pipelineE2e(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Scan parquet"),
      s"a stage re-reads the corpus parquet:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"quadratic join in the pipeline:\n$p")
  }

  test("pipeline: funnel laws — counts and token mass only shrink") {
    val rows = pipelines.Corpus.pipelineE2e(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == (0L to 7L),
      s"stages out of order: ${rows.toSeq}")
    // docs never increase across the funnel (stage 2 keeps the count by
    // construction; token mass switches basis raw→kept at stage 2)
    val docs = rows.map(_._3)
    assert(docs.zip(docs.tail).forall { case (a, b) => b <= a },
      s"doc funnel grew: ${docs.toSeq}")
    val toks = rows.map(_._4)
    assert(toks.drop(1).zip(toks.drop(2)).forall { case (a, b) => b <= a },
      s"token mass grew after stage 1: ${toks.toSeq}")
    assert(docs.head > 0 && docs.last > 0, "funnel emptied entirely")
    // the mixture stage really budgets: strictly under stage 6's mass
    assert(toks(7) <= toks(6) * 50 / 100 + 1, s"mixture over budget: ${toks.toSeq}")
  }
}
