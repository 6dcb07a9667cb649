package graft

/** Driver-run benchmark: times every SparkEntry query at the given
  * scale factor, one JSON line out. Queries run in sorted-name order
  * (deterministic cross-round comparison); failures are reported in an
  * `errors` array instead of being silently folded into the total. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = GraftSession.build(cpus)
    // Warm the session outside the timings by running the WHOLE query
    // set once at the tiny scale factor: whole-stage-codegen compiles
    // (Janino is seconds for the wide decode/decimal pipelines and is
    // keyed by generated source, so the sf0.1 plans hit the cache),
    // parquet footer/class loading, and the spark.ml + BLAS init. This
    // measures the operators, not the JIT.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    // Between queries, drop persisted blocks the finished query left
    // behind (CC-iteration localCheckpoints, fitted-split caches):
    // each query's .count() fully consumes its result, so the blocks
    // are dead weight that only raises executor memory pressure for
    // every LATER query — measured as a uniform cross-query slowdown
    // as the set grows. JVM-object caches (the fitted-model LRU) are
    // untouched, so deliberate cross-query reuse keeps its speedup.
    def sweep(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    for ((_, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try fn(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => }
      sweep()
    }
    // Each query is timed `reps` times and the MEDIAN is recorded: a
    // one-shot timing puts any background load spike directly into the
    // round artifact, indistinguishable from a real regression (round 4
    // recorded 3-6x phantom slowdowns that a controlled re-run refuted).
    // The median of 3 survives one bad run per query; a query erroring
    // in ANY rep is reported failed.
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    // optional args: restrict to named queries (local iteration on one
    // operator without replaying the whole set; the driver passes none)
    val only = args.toSet
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
    val results = selected.map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
        val dt = (System.nanoTime() - t0) / 1e9
        sweep()
        (dt, ok)
      }
      val sortedT = times.map(_._1).sorted
      (name, sortedT(sortedT.length / 2), times.forall(_._2))
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors,"sf":"$sfDir","reps":$reps}"""
    println(json)
    // Also persist the artifact to a file: a stdout-captured artifact
    // can be truncated or interleaved by the harness; the file is the
    // byte-exact record (round-4 advice).
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json")), json + "\n")
    catch { case _: Throwable => }
    spark.stop()
    // A bench with erroring queries must not look like a clean run: exit
    // nonzero so the harness records the failure machine-checkably
    // (round 3 shipped rc=0 with two dead queries in `errors`).
    if (results.exists(!_._3)) sys.exit(1)
  }
}
