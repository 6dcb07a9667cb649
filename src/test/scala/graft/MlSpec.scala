package graft

import graft.ml.MlPipeline
import org.apache.spark.sql.functions._

class MlSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("dataset: features finite, labels binary, only negative devdt rows") {
    val ds = MlPipeline.dataset(spark, sf).cache()
    assert(ds.count() > 0)
    assert(ds.filter(col("devdt") >= 0).count() == 0)
    assert(ds.filter(!col("y").isin(0, 1)).count() == 0)
    assert(ds.filter(col("sigma") < MlPipeline.SigmaMin).count() == 0)
  }

  test("timeSplit is chronological, not random") {
    val ds = MlPipeline.dataset(spark, sf)
    val (train, test) = MlPipeline.timeSplit(ds, 0.7, "bucket")
    val maxTrain = train.agg(max("bucket")).head().getTimestamp(0)
    val minTest = test.agg(min("bucket")).head().getTimestamp(0)
    assert(!minTest.before(maxTrain) || minTest.equals(maxTrain))
    val n = ds.count()
    assert(math.abs(train.count() - (n * 0.7).toLong) <= 1)
  }

  test("trainEval produces sane metrics") {
    val m = MlPipeline.trainEval(spark, sf).head()
    val acc = m.getDouble(2)
    assert(acc >= 0.0 && acc <= 1.0)
    assert(m.getLong(0) > 0 && m.getLong(1) > 0)
  }

  test("nowSignals: one row per key with LONG/NO TRADE") {
    val s = MlPipeline.nowSignals(spark, sf).collect()
    assert(s.nonEmpty && s.length <= 5)
    assert(s.forall(r => Set("LONG", "NO TRADE").contains(r.getString(4))))
  }

  test("fitted-model LRU eviction releases executor storage") {
    // cap 1: the second fit must evict (and unpersist) the first.
    // Each fit persists ~4 blocks (ds/train/test frames + the sorted
    // base RDD); without eviction the persistent-RDD count grows by
    // that much per fit, with eviction it stays flat.
    val old = MlPipeline.MaxFitted
    MlPipeline.MaxFitted = 1
    try {
      MlPipeline.trainEval(spark, sf).count()
      val n1 = spark.sparkContext.getPersistentRDDs.size
      MlPipeline.trainEval(spark, "/root/testdata/sf0.01").count()
      val n2 = spark.sparkContext.getPersistentRDDs.size
      assert(n2 <= n1 + 1, s"eviction leaked storage: $n1 -> $n2")
    } finally MlPipeline.MaxFitted = old
  }
}
