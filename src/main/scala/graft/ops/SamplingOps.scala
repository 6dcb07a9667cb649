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
    * sample (ties break by id).
    *
    * Cross-engine determinism is by CONSTRUCTION, not by hoping libm
    * agrees: ln is evaluated only on the finite 1e6-point u-grid and
    * pre-rounded to micro-units — SamplingProps verifies exhaustively
    * that no grid point lies within 1e-6 of a .5 rounding boundary,
    * ~100× the worst-case JVM-vs-libm 1-ulp disagreement (~1.2e-8 at
    * this magnitude), so round() cannot flip between engines. The
    * weight then enters through pure INTEGER division (Spark `div`,
    * DuckDB `//`, both truncating; operands are non-negative), which
    * no floating-point step can perturb.
    *
    * Returns the key column; the caller takes the k smallest. At scale
    * that selection must be a sort-LIMIT (TakeOrdered: per-partition
    * top-k then a k-row merge), never a global row_number window. */
  def weightedKey(key: Column, weight: Column, salt: String): Column = {
    val m = pmod(h64(concat(lit(salt + ":"), key.cast("string"))),
      lit(1000000L)) + lit(1L)
    // −ln(m/1e6) in micro-units: an exact integer on both engines
    // (boundary-safety of the 1e6-point grid is exhaustively pinned)
    val lfx = round(-log(m.cast("double") / lit(1000000.0)) * lit(1e6), 0)
      .cast("long")
    call_function("div", lfx * lit(1000000000L), weight.cast("long"))
  }
}
