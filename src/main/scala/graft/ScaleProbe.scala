package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Scale probe (NOT part of the driver gate): replays the heaviest
  * query families at sf0.1 and at a DERIVED 10× corpus — the sf0.1
  * documents/embeddings unioned ten times with disjoint id offsets, a
  * deterministic derivation of the driver's own testdata, not new
  * synthetic data — recording, per query and per scale, the wall time
  * and the MAX shuffle-read records any single task processed.
  *
  * The point is the GROWTH of that per-task maximum: the "survives
  * 100×" plan audits argue no operator funnels a corpus-sized key
  * through one task; near-linear max-task growth under a 10× corpus is
  * that argument as data (sub-linear is fine too — more parallelism).
  * A super-linear jump is a hotspot the plan reading missed.
  *
  * Probed families (the verdict's heavy list):
  *   - q_pipeline_e2e        the 8-stage funnel (RankKernel, pair join)
  *   - q_windowed_dedup      the bounded-window pair join
  *   - q_dedup_groups_capped CC over de-skewed candidates (the scale
  *                           path; the uncapped twin is deliberately
  *                           quadratic in dup-cluster size and stays a
  *                           small-sf exactness check)
  *   - q_knn_graph_lsh       banded LSH mutual-kNN over embeddings
  *
  * Writes one JSON line to SPARK_GRAFT_SCALE_OUT (BENCH_SCALE.json).
  * The 10× corpus is written under java.io.tmpdir and removed on exit.
  */
object ScaleProbe {
  private val Probed = Seq("q_pipeline_e2e", "q_windowed_dedup",
    "q_dedup_groups_capped", "q_knn_graph_lsh")

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val sf01 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "BENCH_SCALE.json")
    val bigDir = java.nio.file.Files.createTempDirectory("graft_sf1")
    val big = bigDir.toString

    // ---- derive the 10× corpus: offsets keep doc/vec ids disjoint so
    // dedup/CC keys stay unique; text and vectors repeat, which keeps
    // the candidate-generation density realistic for a crawl re-visit
    val docs = Tables.documents(spark, sf01)
    val n = docs.agg(max("doc_id")).head().getLong(0) + 1
    (0 until 10).map(k => docs.select((col("doc_id") + lit(k * n)).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars")))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$big/documents.parquet")
    val emb = Tables.embeddings(spark, sf01)
    val m = emb.agg(max("vec_id")).head().getLong(0) + 1
    (0 until 10).map(k => emb.select((col("vec_id") + lit(k * m)).as("vec_id"),
        col("embedding"), col("label")))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$big/embeddings.parquet")

    // ---- max-task shuffle-read tracker (same listener methodology as
    // RankKernelSpec's measured skew tests)
    @volatile var maxRecords = 0L
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val tm = t.taskMetrics
        if (tm != null) maxRecords = math.max(maxRecords,
          tm.shuffleReadMetrics.recordsRead)
      }
    }
    def measure(f: => Unit): (Double, Long) = {
      maxRecords = 0L
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      try {
        f
        val sec = (System.nanoTime() - t0) / 1e9
        var last = -1L; var spins = 0
        while (last != maxRecords && spins < 20) { // listener drain
          last = maxRecords; Thread.sleep(250); spins += 1
        }
        (sec, maxRecords)
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    def sweep(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }

    // AQE partition coalescing OFF for the measurement: at probe scale
    // it legally re-merges small partitions by SIZE, the regime real
    // data never sees (same rationale as the spec's measured tests)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

    val results = Probed.map { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, "/root/testdata/sf0.001").count() // JIT/codegen warm-up
      sweep()
      val (s0, r0) = measure { fn(spark, sf01).count() }
      sweep()
      val (s1, r1) = measure { fn(spark, big).count() }
      sweep()
      val growth = if (r0 > 0) r1.toDouble / r0 else -1.0
      (name, s0, r0, s1, r1, growth)
    }
    val qs = results.map { case (name, s0, r0, s1, r1, g) =>
      s""""$name":{"sf0.1":{"sec":$s0,"max_task_records":$r0},""" +
        s""""sf1x10":{"sec":$s1,"max_task_records":$r1},""" +
        s""""max_task_growth":${math.rint(g * 100) / 100}}"""
    }.mkString("{", ",", "}")
    val json = s"""{"metric":"scale_probe","scale_ratio":10,""" +
      s""""base_sf":"$sf01","queries":$qs}"""
    println(json)
    try {
      val out = java.nio.file.Paths.get(outPath)
      val tmp = java.nio.file.Paths.get(outPath + ".tmp")
      java.nio.file.Files.writeString(tmp, json + "\n")
      java.nio.file.Files.move(tmp, out,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } catch { case _: Throwable => }
    spark.stop()
    // best-effort cleanup of the derived corpus
    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles(); if (kids != null) kids.foreach(rm); f.delete()
    }
    rm(bigDir.toFile)
  }
}
