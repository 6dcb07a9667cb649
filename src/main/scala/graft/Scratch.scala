package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Ad-hoc profiling harness (not part of the driver contract).
  * Current mode: stage timing of the n-gram Jaccard pair pipeline —
  * fingerprint/explode vs candidate join vs pair aggregation — plus an
  * alternative combinations-based generator, to decide whether the
  * self-join is worth replacing.
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
    val docs = Tables.documents(spark, d)
    val arr = docs.select(col("doc_id").as("doc"),
      graft.ops.TextOps.shingleHashes(col("text"), 3).as("arr"))
    val exploded = arr.select(col("doc"), size(col("arr")).as("sz"),
      explode(col("arr")).as("s"))
    time("fingerprint+explode")(exploded.count())
    val byShingle = exploded.repartition(col("s"))
    val a = byShingle.toDF("doc_a", "sz_a", "s")
    val b = byShingle.toDF("doc_b", "sz_b", "s")
    val joined = a.join(b, Seq("s")).filter(col("doc_a") < col("doc_b"))
    time("candidate join")(joined.count())
    val agg = joined.groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"), first(col("sz_a")).as("sz_a"),
        first(col("sz_b")).as("sz_b"))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= 0.1)
    time("full join path")(agg.count())
    time("full join path again")(agg.count())

    // alternative: per-shingle doc-list combinations, pairs emitted
    // map-side after ONE groupBy on the shingle
    val lists = exploded.groupBy("s")
      .agg(sort_array(collect_list(struct(col("doc"), col("sz")))).as("ds"))
      .filter(size(col("ds")) > 1)
    val pairs = lists.select(explode(flatten(
        expr("transform(ds, (x, i) -> transform(slice(ds, i + 2, size(ds)), y -> struct(x.doc AS doc_a, x.sz AS sz_a, y.doc AS doc_b, y.sz AS sz_b)))")
      )).as("p"))
      .select(col("p.doc_a"), col("p.sz_a"), col("p.doc_b"), col("p.sz_b"))
    val agg2 = pairs.groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"), first(col("sz_a")).as("sz_a"),
        first(col("sz_b")).as("sz_b"))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= 0.1)
    time("combinations path")(agg2.count())
    time("combinations path again")(agg2.count())
    spark.stop()
  }
}
