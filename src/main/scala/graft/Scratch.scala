package graft

/** Ad-hoc profiling harness (not part of the driver contract).
  * Current mode: stage-level timing of the slowest bench queries at
  * sf0.1 — each piece of the q_evm_daily pipeline, then the dedup
  * group/sample family — to find where the seconds actually go.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("32")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }
    // warm session
    SparkEntry.entry(spark).count()
    import graft.evm.LogPipeline
    time("synthesizeLogs")(LogPipeline.synthesizeLogs(Tables.events(spark, d)).count())
    time("decodeTransfers")(
      LogPipeline.decodeTransfers(LogPipeline.synthesizeLogs(Tables.events(spark, d))).count())
    time("blockTimestamps")(
      LogPipeline.blockTimestamps(LogPipeline.synthesizeLogs(Tables.events(spark, d))).count())
    time("enrichedTransfers")(LogPipeline.enrichedTransfers(spark, d).count())
    time("q_evm_daily")(LogPipeline.dailyVolume(spark, d).count())
    time("q_evm_daily again")(LogPipeline.dailyVolume(spark, d).count())
    time("q_dedup_groups")(ops.DataQueries.dedupGroups(spark, d).count())
    time("q_sample_docs")(ops.DataQueries.sampleDocs(spark, d).count())
    time("q_embed_groups")(ops.DataQueries.embedGroups(spark, d).count())
    time("q_ivf_topk")(ops.DataQueries.ivfTopK(spark, d).count())
    time("q_lang_id")(ops.DataQueries.langId(spark, d).count())
    time("q_clean_docs")(ops.DataQueries.cleanDocs(spark, d).count())
    // dedup_groups breakdown
    import org.apache.spark.sql.functions._
    val pairs = ops.DedupOps.jaccardPairs(Tables.documents(spark, d),
      "doc_id", "text", 3, 0.1).select("doc_a", "doc_b")
    time("  pairs alone")(pairs.count())
    time("  cc(pairs)")(ops.DedupOps.connectedComponents(pairs).count())
    time("  groups full")(ops.DataQueries.dedupGroups(spark, d).count())
    // ivf breakdown (inline replica of literalAssignment's pieces)
    val emb = Tables.embeddings(spark, d)
    time("  ivf base scan")(emb.count())
    val base = emb.select(col("vec_id").cast("long").as("vid"),
      expr("transform(embedding, x -> cast(x as double))").as("v"),
      (col("vec_id") < 10).as("__isq"))
    val t0 = System.nanoTime()
    val cents = base.filter(col("v").isNotNull).orderBy("vid").limit(16).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    println(f"[scratch]   ivf centroid collect        ${(System.nanoTime() - t0) / 1e9}%7.2fs dims=${cents.head._2.length}")
    def vdot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function("vec_dot", a, b)
    def vnorm(a: org.apache.spark.sql.Column) = sqrt(vdot(a, a))
    val scored = array(cents.map { case (cid, cv) =>
      val c = typedLit(cv)
      struct((vdot(col("v"), c) / (vnorm(col("v")) * vnorm(c))).as("cos"),
        lit(-cid).as("ncid"))
    }: _*)
    val assigned = base.withColumn("list_id", -array_max(scored).getField("ncid"))
    time("  ivf assign only")(assigned.count())
    time("  ivf assign again")(assigned.count())
    val probes = slice(reverse(array_sort(scored)), 1, 2)
    val q = base.filter(col("__isq"))
      .select(col("vid").as("query_id"), col("v").as("qv"), vnorm(col("v")).as("qn"),
        explode(transform(probes, s => -s.getField("ncid"))).as("list_id"))
    time("  ivf q only")(q.count())
    val c = assigned.select(col("vid").as("cand_id"), col("v").as("cv"),
      vnorm(col("v")).as("cn"), col("list_id"))
    val joined = c.join(broadcast(q), Seq("list_id"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos", vdot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    time("  ivf join only")(joined.count())
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("cand_id").asc)
    time("  ivf rerank full")(joined.withColumn("rank",
      org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rank") <= 3).count())
    val replicaFull = joined.withColumn("rank",
        org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rank") <= 3)
      .select("query_id", "cand_id", "cos", "rank")
    time("  replica full")(replicaFull.count())
    val real = ops.VectorOps.ivfTopK(emb, "vec_id", "embedding",
      16, 2, 3, col("vec_id") < 10)
    time("  ivf full")(real.count())
    java.nio.file.Files.writeString(java.nio.file.Path.of("/tmp/plan_replica.txt"),
      replicaFull.queryExecution.executedPlan.toString)
    java.nio.file.Files.writeString(java.nio.file.Path.of("/tmp/plan_real.txt"),
      real.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
