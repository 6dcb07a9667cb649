package graft

import graft.ops.DedupOps

/** Ad-hoc profiling harness (not part of the driver contract).
  * Current mode: capped-Jaccard on the 10×-replicated corpus, after
  * the shared-shuffle rework of the doc-frequency branch.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("32")
    val docs = spark.read.parquet("/tmp/graft_big/documents.parquet")
    for (cap <- Seq(Some(60L), Some(30L))) {
      val t0 = System.nanoTime()
      val n = DedupOps.jaccardPairs(docs, "doc_id", "text", 3, 0.1, cap).count()
      println(f"[scratch] maxDocFreq=$cap%-10s ${(System.nanoTime() - t0) / 1e9}%7.2fs pairs=$n")
    }
    spark.stop()
  }
}
