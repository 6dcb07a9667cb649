package graft.ml

/** Offline model-export tool: fits the fee-bot pipeline once (same path
  * as q_ml_train_eval) and prints the folded serving weights that get
  * pinned into [[PinnedModel]]. Run:
  *
  *   sbt 'runMain graft.ml.PinModel /root/testdata/sf0.01'
  *
  * Printed with Double.toString (shortest round-trip form) so pasting
  * the literals into Scala AND the DuckDB oracle SQL reconstructs the
  * exact same IEEE doubles in both engines. */
object PinModel {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.GraftSession.build(cpus)
    val (w, b) = MlPipeline.foldedWeights(spark, dir)
    println("PINNED_W=" + w.map(_.toString).mkString(","))
    println("PINNED_B=" + b.toString)
    spark.stop()
  }
}
