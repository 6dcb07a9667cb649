package graft

import graft.ops.DedupOps

/** Ad-hoc profiling harness (not part of the driver contract).
  * Current mode: does the Jaccard shingle self-join reuse one exchange
  * for both sides after AQE finalizes (ReusedExchange / shared stage)?
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("32")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val pairs = DedupOps.jaccardPairs(docs, "doc_id", "text", 3, 0.1)
    val qe = pairs.queryExecution
    val n = qe.executedPlan.executeCollect().length // finalizes THIS plan
    println(s"[scratch] rows=$n")
    println(qe.executedPlan.toString
      .linesIterator.map(_.take(110)).mkString("\n"))
    spark.stop()
  }
}
