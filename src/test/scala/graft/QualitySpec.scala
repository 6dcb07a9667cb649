package graft

import org.apache.spark.sql.functions._
import graft.ml.{PinnedQualityModel, QualityClassifier}

/** Quality-classifier checks: the drift gate (a refit must reproduce
  * the pinned artifact — a silent change in the featurizer or hashing
  * would otherwise leave the oracled serving queries green against a
  * stale model), plus serving-path invariants the hash gate alone
  * wouldn't explain.
  */
class QualitySpec extends SparkSpec {
  import spark.implicits._
  private val sf001 = "/root/testdata/sf0.001"

  test("drift gate: refit at sf0.01 reproduces the pinned micro-unit weights") {
    val (w, b) = QualityClassifier.fitWeights(spark, "/root/testdata/sf0.01")
    val wFx = w.map(x => math.round(x * 1e6))
    // LBFGS over a tiny dense problem is deterministic to far below a
    // micro-unit; 1000 micro-units (1e-3) of slack absorbs BLAS-order
    // noise while still failing loudly on any real feature-chain change
    wFx.zip(PinnedQualityModel.WFx).zipWithIndex.foreach { case ((a, p), i) =>
      assert(math.abs(a - p) <= 1000, s"w[$i]: refit $a vs pinned $p")
    }
    assert(math.abs(math.round(b * 1e6) - PinnedQualityModel.BFx) <= 1000,
      s"intercept: ${math.round(b * 1e6)} vs ${PinnedQualityModel.BFx}")
  }

  test("serving: keep_model is the logit sign, agreement is the equality") {
    val rows = QualityClassifier.qualityModel(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (logit, keepM, keepR, agree) =
        (r.getDouble(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4))
      assert(keepM == (logit >= 0), s"row $r")
      assert(agree == (keepM == keepR), s"row $r")
    }
  }

  test("distillation quality: the model reproduces the rule gate on >=75% of docs") {
    val ag = QualityClassifier.qualityAgreement(spark, sf001)
      .agg(sum("n_agree"), sum("n_docs")).head()
    val rate = ag.getLong(0).toDouble / ag.getLong(1)
    assert(rate >= 0.75, f"agreement $rate%.3f below the distillation floor")
  }

  test("streaming map-only scorer equals the batch weight-join form") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val docs = Tables.documents(spark, sf001)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val input = MemoryStream[(Long, String)]
    val q = QualityClassifier.scoreStream(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("q_scores")
      .outputMode("append").start()
    input.addData(docs: _*)
    q.processAllAvailable()
    val got = spark.table("q_scores").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    q.stop()
    val want = QualityClassifier.qualityModel(spark, sf001).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(got.size == want.size)
    want.foreach { case (id, wv) =>
      assert(got(id) == wv, s"doc $id: stream ${got(id)} vs batch $wv")
    }
  }

  test("hashed featurizer: counts reconstruct token totals, buckets in range") {
    val docs = Tables.documents(spark, sf001)
    val counts = QualityClassifier.hashedCounts(docs)
    val total = counts.agg(sum("cnt")).head().getLong(0)
    val expected = docs
      .select(graft.ops.TextOps.tokenCount(col("text")).as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(total == expected, s"count mass $total != token mass $expected")
    val bad = counts.filter(col("bucket") < 0 ||
      col("bucket") >= QualityClassifier.Dim).count()
    assert(bad == 0)
  }
}
