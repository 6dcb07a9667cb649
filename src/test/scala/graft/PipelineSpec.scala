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

  test("maintainPipeline: sequential micro-batches ≡ the batch recompute; replay, order, boundedness") {
    import org.apache.spark.sql.functions._
    import graft.streaming.StreamOps
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("mpipe").toString
    val ids = docs.select("doc_id").orderBy("doc_id").collect().map(_.getLong(0))
    val c1 = ids(ids.length / 3); val c2 = ids(2 * ids.length / 3)
    val batches = Seq(
      docs.filter(col("doc_id") <= c1),
      docs.filter(col("doc_id") > c1 && col("doc_id") <= c2),
      docs.filter(col("doc_id") > c2))
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamOps.applyPipelineBatch(b, dir, i.toLong)
    }
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    val got = rows(StreamOps.pipelineStateAudit(spark, dir))
    val want = rows(pipelines.Corpus.pipelineE2e(spark, sf))
    assert(got == want, s"incremental fold diverged:\n got=$got\nwant=$want")
    // at-least-once replay of an applied batch is a no-op
    StreamOps.applyPipelineBatch(batches(1), dir, 1L)
    assert(rows(StreamOps.pipelineStateAudit(spark, dir)) == want)
    // out-of-order ingest fails LOUDLY (id-ordered dedup rules)
    val e = intercept[IllegalArgumentException](
      StreamOps.applyPipelineBatch(batches.head, dir, 9L))
    assert(e.getMessage.contains("out-of-order"))
    // per-trigger boundedness: each batch's signal-row dir holds exactly
    // that batch's docs — prior text is never re-read or re-signalled
    val perDir = (0 to 2).map { b =>
      spark.read.parquet(s"$dir/rows/b=$b").count()
    }
    assert(perDir.sum == docs.count(), s"rows dirs: $perDir")
    assert(perDir == batches.map(_.count()), s"rows dirs not batch-bounded: $perDir")
    // an empty batch just advances the replay gate
    StreamOps.applyPipelineBatch(docs.filter(lit(false)), dir, 10L)
    assert(rows(StreamOps.pipelineStateAudit(spark, dir)) == want)
  }
}
