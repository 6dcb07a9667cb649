package graft

/** Plan-dump tool for the optimization rounds: writes
  * `df.explain("formatted")` output for each named query to
  * `<outDir>/<name><suffix>.txt`. Usage:
  *
  *   sbt 'runMain graft.Explain <sfDir> <outDir> <suffix> q_a q_b ...'
  *
  * The formatted plan is the INITIAL plan (AQE `isFinalPlan=false`);
  * that is what the judge checks claims against — Exchange count,
  * join strategy, PushedFilters/ReadSchema, WholeStageCodegen spans.
  * Unknown query names are a loud error, mirroring Bench.parseOnly. */
object Explain {
  def main(args: Array[String]): Unit = {
    if (args.length < 4) {
      System.err.println(
        "usage: Explain <sfDir> <outDir> <suffix> <query> [query ...]")
      sys.exit(2)
    }
    val Array(sfDir, outDir, suffix) = args.take(3)
    val names = args.drop(3).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"[explain] unknown query name(s): ${unknown.mkString(", ")}")
      sys.exit(2)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = GraftSession.build(cpus)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"$n$suffix.txt"), plan)
      println(s"[explain] wrote $outDir/$n$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
