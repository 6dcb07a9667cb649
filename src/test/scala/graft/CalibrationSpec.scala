package graft

import graft.ops.DataQueries

/** Laws of the two newest calibration queries, checked on the fixture
  * corpus independently of the DuckDB oracle.
  *
  * Histogram quantile: the estimate is the UPPER edge of the bin
  * holding the rank-target value, so the signed error is always in
  * [0, binW) — never an underestimate, never off by a full bin.
  *
  * Novelty: batch 0 is all-novel by construction (min-batch of any
  * gram present in batch 0 is 0), and the novel counts partition the
  * distinct gram space (Σ n_novel = global distinct grams).
  */
class CalibrationSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("calibration family survives a degenerate 1-row/empty-text corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("degen_sf").toString
    Seq((1L, "", "en", "src0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    Seq((1L, new java.sql.Timestamp(1704067200000L), 5L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    Seq((1L, 1L)).toDF("c_custkey", "c_nationkey")
      .write.parquet(s"$dir/customer.parquet")
    Seq((1L, 1L)).toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$dir/orders.parquet")
    Seq((1L, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
        new java.sql.Timestamp(1704067200000L)))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    // none of these may throw; shapes may legitimately be empty
    assert(DataQueries.hllErr(spark, dir).count() == 0) // no 3-grams
    assert(DataQueries.noveltyRate(spark, dir).count() == 0)
    val hq = DataQueries.histQuantile(spark, dir).collect()
    assert(hq.length == 3 && hq.forall(r => r.getLong(3) == 0))
    assert(graft.ops.GraphOps.triangles(spark, dir).count() == 0)
    assert(DataQueries.joinSizeEst(spark, dir).count() == 2)
    assert(DataQueries.aqpSum(spark, dir).count() == 1)
    assert(DataQueries.incrAgg(spark, dir).count() == 1)
    assert(DataQueries.tableStats(spark, dir).count() == 11)
    assert(DataQueries.zorderLayout(spark, dir).count() == 2)
  }

  test("histogram quantile error is bounded by the bin width") {
    val rows = DataQueries.histQuantile(spark, sf).collect()
    assert(rows.length >= 3)
    rows.foreach { r =>
      val err = r.getLong(5)
      assert(err >= 0 && err < 16,
        s"${r.getString(0)}/${r.getString(1)}: err=$err")
    }
  }

  test("join-size sketch upper-bounds the exact join cardinality") {
    val rows = DataQueries.joinSizeEst(spark, sf).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      // CMS inner product only ADDS non-negative collision cross-terms
      assert(est >= exact, s"${r.getString(0)}: est=$est < exact=$exact")
      // and the min-over-rows estimate should respect the expected
      // ‖a‖₁·‖b‖₁/w collision budget within a small constant factor
      assert(est - exact <= 8L * exact * exact / 32768 + exact,
        s"${r.getString(0)}: overestimate implausibly large")
    }
  }

  test("zorder layout: both layouts cover the box; the curve reads fewer files") {
    val rows = DataQueries.zorderLayout(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(rows.keySet == Set("arrival", "zorder"))
    // no false pruning: every matching row lives in a hit file
    rows.values.foreach { case (_, scanned, inBox) =>
      assert(scanned >= inBox, "layout pruned files containing box rows")
    }
    // the 2-d curve must not read MORE files than the 1-d arrival order
    assert(rows("zorder")._1 <= rows("arrival")._1,
      s"zorder hit ${rows("zorder")._1} files vs arrival ${rows("arrival")._1}")
  }

  test("triangles: per-node counts sum to 3x the triangle count; coeff in [0,1]") {
    val rows = graft.ops.GraphOps.triangles(spark, sf).collect()
    rows.foreach { r =>
      val (deg, t, cm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(cm >= 0 && cm <= 1000000L, s"coefficient out of range: $cm")
      // a node of degree d closes at most C(d,2) triangles
      assert(t <= deg * (deg - 1) / 2, s"doc ${r.getLong(0)}: t=$t deg=$deg")
    }
    // handshake law: each triangle contributes to exactly 3 nodes
    assert(rows.map(_.getLong(2)).sum % 3 == 0)
  }

  test("aqp: estimates are exact inverse-probability scalings of the sample") {
    val rows = DataQueries.aqpSum(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // n_est is 10x an integer sample count by construction
      assert(r.getLong(2) % 10 == 0)
      // fixture calibration: a 10% hash sample stays within 50% of
      // truth per event type at this scale (deterministic, not flaky)
      val (n, nEst) = (r.getLong(1), r.getLong(2))
      assert(math.abs(nEst - n).toDouble / n < 0.5,
        s"${r.getString(0)}: n=$n est=$nEst")
    }
  }

  test("shard rebalance: rendezvous moves ~1/(n+1), modulo nearly everything") {
    val r = DataQueries.shardRebalance(spark, "/root/testdata/sf0.01").head()
    val (fracMod, fracHrw) = (r.getDouble(2), r.getDouble(4))
    // theory: 8/9 ≈ .889 for modulo, 1/9 ≈ .111 for rendezvous
    assert(fracMod > 0.8, s"modulo moved only $fracMod")
    assert(fracHrw < 0.2, s"rendezvous moved $fracHrw — not consistent")
    assert(fracHrw < fracMod / 4)
  }

  test("novelty: batch 0 is all-novel; novel counts partition the gram space") {
    val rows = DataQueries.noveltyRate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.nonEmpty)
    val b0 = rows.find(_._1 == 0L).get
    assert(b0._2 == b0._3, "batch 0 must be entirely novel")
    val globalDistinct = {
      import org.apache.spark.sql.functions._
      Tables.documents(spark, sf)
        .select(explode(graft.ops.TextOps.shingles(col("text"), 3)).as("s"))
        .agg(countDistinct(col("s"))).head().getLong(0)
    }
    assert(rows.map(_._3).sum == globalDistinct,
      "sum of per-batch novel grams must equal global distinct grams")
  }
}
