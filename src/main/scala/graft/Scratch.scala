package graft

import org.apache.spark.sql.functions._

/** Ad-hoc profiling harness (not part of the driver contract).
  * Current mode: split q_ivf_topk cost between the centroid collect
  * and the assignment/probe/re-rank query at sf0.1.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("32")
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $tag%-16s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
    timed("emb.count")(println("n=" + emb.count()))
    // centroid collect alone (what ivfTopK does at plan time)
    timed("centroids") {
      emb.select(col("vec_id").cast("long").as("vid"),
          col("embedding").cast("array<double>").as("v"))
        .filter(col("v").isNotNull).orderBy("vid").limit(16).collect()
    }
    timed("ivf_topk run1")(println("rows=" +
      ops.DataQueries.ivfTopK(spark, "/root/testdata/sf0.1").count()))
    timed("ivf_topk run2")(println("rows=" +
      ops.DataQueries.ivfTopK(spark, "/root/testdata/sf0.1").count()))
    timed("evm_daily run1")(println("rows=" +
      evm.LogPipeline.dailyVolume(spark, "/root/testdata/sf0.1").count()))
    timed("evm_daily run2")(println("rows=" +
      evm.LogPipeline.dailyVolume(spark, "/root/testdata/sf0.1").count()))
    spark.stop()
  }
}
