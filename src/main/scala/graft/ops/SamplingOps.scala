package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import TextOps.h64

/** Deterministic sampling / ordering for training-data exports. A 100 TB
  * corpus job can never use `rand()`-based sampling: it is
  * partition-order dependent, unstable across retries and AQE re-plans,
  * and irreproducible between runs. Everything here keys off the
  * content-stable h64 hash instead — the same rows are selected on
  * every engine, every run, every partitioning.
  */
object SamplingOps {

  /** Uniform hash bucket in [0, buckets) for a key column — the
    * reproducible coin flip. */
  def hashBucket(key: Column, buckets: Int): Column =
    pmod(h64(key.cast("string")), lit(buckets.toLong))

  /** Deterministic ~pct% sample: keep rows whose key hashes into the
    * first `pct` of `buckets` buckets. Stable under retries, resumable,
    * and composable (disjoint bucket ranges → disjoint samples — the
    * train/val/test split idiom). */
  def hashSample(df: DataFrame, key: String, pct: Int, buckets: Int = 100): DataFrame =
    df.filter(hashBucket(col(key), buckets) < pct)

  /** Deterministic corpus shuffle: global order by (hash, key). The
    * standard pre-training interleave — breaks source/time locality —
    * as a range-partitioned sort, reproducible across runs (a
    * `rand()` sort is neither stable nor retry-safe). */
  def deterministicShuffle(df: DataFrame, key: String): DataFrame =
    df.orderBy(h64(col(key).cast("string")), col(key))

  /** Per-stratum quota sample: the first `quota` rows of each stratum
    * in deterministic hash order (balanced class subsets without a
    * global sort — one shuffle on the stratum key). */
  def stratifiedQuota(df: DataFrame, stratum: String, key: String,
                      quota: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(stratum)
      .orderBy(h64(col(key).cast("string")), col(key))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= quota)
      .drop("__rn")
  }

  /** Deterministic weighted sampling without replacement (the
    * exponential-keys / A-ES scheme, rand()-free): each row draws the
    * pseudo-uniform u = (h64(salt‖key) mod 1e6 + 1)/1e6 and ranks by
    * −ln(u)/weight — the k SMALLEST keys are a weight-proportional
    * sample. The key is quantized to integer nano-units before ranking
    * (ln and ÷ are correctly rounded on both engines; ties break by
    * id), so selection is engine/run/retry-identical like every other
    * sampler here.
    *
    * Returns the key column; the caller takes the k smallest. At scale
    * that selection must be a sort-LIMIT (TakeOrdered: per-partition
    * top-k then a k-row merge), never a global row_number window. */
  def weightedKey(key: Column, weight: Column, salt: String): Column = {
    val u = (pmod(h64(concat(lit(salt + ":"), key.cast("string"))),
      lit(1000000L)) + lit(1L)).cast("double") / lit(1000000.0)
    round(-log(u) / weight.cast("double") * lit(1e9), 0).cast("long")
  }
}
