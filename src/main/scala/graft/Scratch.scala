package graft

import org.apache.spark.sql.functions._

/** Ad-hoc profiling harness (not part of the driver contract).
  * Current mode: stage timing of the LSH near-dup scale path
  * (augment → buckets → candidate join → re-check) at sf0.1.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("32")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name%-30s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }
    SparkEntry.entry(spark).count() // warm
    SparkEntry.queries("q_ann_neardup")(spark, d).count() // warm codegen
    val base = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("ve"))
    val copies = base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("ve"), (x, i) =>
          x + (graft.ops.TextOps.h64(concat(col("vec_id"), lit("~"), i)) % 2001L
            - 1000L) / 1e7).as("ve"))
    val aug = base.unionByName(copies)
    time("augment only")(aug.count())
    time("augment forced")(aug.agg(sum(size(col("ve")))).count())
    val bk = graft.ops.VectorOps.lshBucketsMulti(aug, "vec_id", "ve", 12, 4)
    time("buckets")(bk.count())
    time("buckets again")(bk.count())
    val nd = graft.ops.VectorOps.lshNearDup(aug, "vec_id", "ve", 0.9, 12, 4)
    time("full lshNearDup")(nd.count())
    time("full lshNearDup again")(nd.count())
    time("query (with round/order)")(SparkEntry.queries("q_ann_neardup")(spark, d).count())
    spark.stop()
  }
}
