package graft

import org.apache.spark.sql.functions._
import graft.ops.DedupOps

/** Ad-hoc profiling harness (not part of the driver contract).
  * Current mode: on the 10× replicated corpus (see git history for the
  * generator), measure the maxDocFreq lever on the Jaccard candidate
  * join — the documented control for duplication-driven pair blow-up.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("32")
    val big = "/tmp/graft_big"
    val docs = spark.read.parquet(s"$big/documents.parquet")
    for (cap <- Seq(None, Some(60L), Some(30L))) {
      val t0 = System.nanoTime()
      val n = DedupOps.jaccardPairs(docs, "doc_id", "text", 3, 0.1, cap).count()
      println(f"[scratch] maxDocFreq=$cap%-10s ${(System.nanoTime() - t0) / 1e9}%7.2fs pairs=$n")
    }
    spark.stop()
  }
}
