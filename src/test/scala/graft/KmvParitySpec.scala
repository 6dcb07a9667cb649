package graft

import org.apache.spark.sql.functions._
import graft.ops.{DataQueries, TextOps}

/** Parity of the two KMV distinct-estimate forms: the mergeable
  * aggregate ([[graft.ops.KmvDistinctAgg]], the production plan) must
  * equal the relational distinct+window spelling (the DuckDB-oracle
  * form) bit-for-bit — below-k exact counts, above-k estimates, and
  * across partitionings (the merge path). */
class KmvParitySpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def exprForm(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("source")
      .agg(call_function("kmv_distinct", col("ch"), lit(k)).as("approx_uniq"))

  test("aggregate form equals relational form on the documents fixture") {
    val t = Tables.documents(spark, sf)
      .select(col("source"), TextOps.h64(col("text")).as("ch"))
    for (k <- Seq(4, 64)) { // 4 forces the estimator path, 64 the exact path
      val a = exprForm(t, k).orderBy("source").collect()
        .map(r => (r.getString(0), r.getDouble(1)))
      val b = DataQueries.kmvRelational(t, "source", "ch", k)
        .orderBy("source").collect()
        .map(r => (r.getString(0), r.getDouble(1)))
      assert(a.toSeq == b.toSeq, s"k=$k")
    }
  }

  test("merge path: estimate is partitioning-invariant") {
    val t = Tables.documents(spark, sf)
      .select(col("source"), TextOps.h64(col("text")).as("ch"))
    val one = exprForm(t.repartition(1), 8).orderBy("source").collect().toSeq
    val many = exprForm(t.repartition(13), 8).orderBy("source").collect().toSeq
    assert(one == many)
  }

  test("duplicates don't inflate the sketch (distinctness is inherent)") {
    import spark.implicits._
    val df = Seq.tabulate(200)(i => ("s", (i % 10).toLong + 1))
      .toDF("source", "ch")
    val r = exprForm(df, 64).collect()
    assert(r.length == 1 && r(0).getDouble(1) == 10.0)
  }

  test("plan is a partial/final aggregate, not distinct+window") {
    val t = Tables.documents(spark, sf)
      .select(col("source"), TextOps.h64(col("text")).as("ch"))
    val plan = exprForm(t, 64).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"))
    assert(!plan.contains("Window"))
  }

  // ---- bottomk_sample (the quantile-sample cousin) ----

  private def sampleForm(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("source")
      .agg(call_function("bottomk_sample",
        col("hk"), col("v"), lit(k)).as("smp"))

  test("bottomk_sample: partitioning-invariant and equal to the relational replay") {
    val t = Tables.documents(spark, sf)
      .select(col("source"),
        TextOps.h64(col("doc_id").cast("string")).as("hk"),
        col("n_chars").as("v"))
    val one = sampleForm(t.repartition(1), 16).orderBy("source").collect()
      .map(r => (r.getString(0), r.getSeq[Long](1)))
    val many = sampleForm(t.repartition(13), 16).orderBy("source").collect()
      .map(r => (r.getString(0), r.getSeq[Long](1)))
    assert(one.toSeq == many.toSeq, "merge order changed the sample")
    // relational replay: k smallest hk per source, values sorted
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy("hk", "v")
    val rel = t.withColumn("rk", row_number().over(w)).filter(col("rk") <= 16)
      .groupBy("source").agg(sort_array(collect_list(col("v"))).as("smp"))
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getSeq[Long](1)))
    assert(one.toSeq == rel.toSeq, "aggregate diverged from the window replay")
  }

  test("bottomk_sample: below-k groups return every value (exact degenerate case)") {
    import spark.implicits._
    val df = Seq(("s", 5L, 30L), ("s", 2L, 10L), ("s", 9L, 20L))
      .toDF("source", "hk", "v")
    val r = sampleForm(df, 64).collect()
    assert(r.length == 1 && r(0).getSeq[Long](1) == Seq(10L, 20L, 30L))
  }
}
