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
}
