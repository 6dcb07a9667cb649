package graft

import org.apache.spark.sql.functions._
import graft.ops.DedupOps

/** Ad-hoc profiling harness (not part of the driver contract).
  * Current mode: split q_dedup_groups cost between candidate-pair
  * generation and the CC loop (propagation vs contraction) at sf0.1.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("32")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $tag%-16s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    val pairs = DedupOps.jaccardPairs(docs, "doc_id", "text", 3, 0.1)
      .select("doc_a", "doc_b")
    timed("pairs.count")(println("pairs=" + pairs.count()))
    val edges = pairs.localCheckpoint(true)
    timed("cc-propagation")(
      println("cc rows=" + DedupOps.connectedComponents(edges).count()))
    timed("cc-contraction")(
      println("cc rows=" + DedupOps.connectedComponentsContract(edges).count()))
    spark.stop()
  }
}
