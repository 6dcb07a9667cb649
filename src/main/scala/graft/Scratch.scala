package graft

/** Ad-hoc profiling harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("32")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_jaccard_pairs", "q_lsh_pairs", "q_minhash_sig",
        "q_simhash_pairs", "q_ann_topk", "q_text_stats")
    for (name <- names; rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[scratch] $name rep$rep ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    spark.stop()
  }
}
