package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-safe EXACT per-stratum ranking / running sums.
  *
  * The naive form — `row_number()`/`sum().over(Window.partitionBy(stratum)
  * .orderBy(score))` — puts EACH STRATUM ON ONE TASK: with a
  * low-cardinality stratum key (language, source) at 100 TB, "English"
  * becomes a single task sorting half the corpus. This kernel computes
  * the SAME exact answer as that window in two passes, with the sort
  * distributed over (stratum, score-bucket) partitions:
  *
  *   1. quantize the score into `buckets` order-preserving buckets and
  *      aggregate per (stratum, bucket): row count (+ mass sum) — a
  *      map-combined shuffle producing an O(#strata × buckets) table;
  *   2. running-sum that TINY table per stratum in bucket order to get
  *      each bucket's row-rank / mass offset (a window over ≤ `buckets`
  *      rows per stratum — trivially small by construction);
  *   3. broadcast the offset table back and rank/cumsum only WITHIN
  *      (stratum, bucket): `offset + intra-bucket row_number/cumsum`.
  *
  * The intra-bucket window partitions by (stratum, bucket), so the
  * expensive sort splits into `buckets` independent tasks per stratum
  * instead of one. Equal scores always share a bucket (quantization is
  * a function of the score), so the composite ordering
  * (score desc, tie asc) inside the bucket reproduces the global order
  * exactly — this is exact rank, not an approximation, and the oracles
  * of every caller are unchanged.
  *
  * Residual skew caveat (documented, not hidden): a stratum whose score
  * distribution is one atom (every row identical score) collapses into
  * one bucket and degenerates to the naive shape. Quality/TTR scores
  * are continuous composites, so buckets split smoothly; a pathological
  * atom would need a secondary bucket key (e.g. hash of the tie column
  * + offset refinement), which no current caller needs.
  *
  * Reference behavior context: the reference pipeline ranks and budgets
  * per-group in pandas after collect (see the analytics dataframes fed
  * from /root/reference/internal/sink/csv.go:107) — single-machine by
  * construction. This kernel is the distributed form of those
  * per-group orderings.
  */
object RankKernel {

  /** Columns appended by [[withStratumRank]]. */
  final case class Cols(
      rank: String = "__rank",       // exact 1-based row_number per stratum
      n: String = "__n",             // stratum row count
      cumBefore: String = "__cum_before", // mass of strictly-earlier rows
      m: String = "__m")             // stratum mass total

  /** Append exact per-stratum rank (ordered `score` DESC, `tie` ASC) —
    * and, when `mass` is given, the exact running mass of strictly
    * earlier rows plus the stratum mass total — without ever sorting a
    * whole stratum on one task.
    *
    * `score` must be numeric in ~[0, 1] (values are clamped into the
    * bucket range, which only merges buckets and never reorders).
    * `prune` optionally filters the per-(stratum, bucket) OFFSET table
    * before the fan-back join; rows of pruned buckets vanish from the
    * output. Use it when the caller's final filter provably rejects
    * every row of a bucket (e.g. a token budget already exhausted by
    * earlier buckets) — at scale this turns "rank everything, then
    * filter" into "rank only the surviving prefix". Predicates may
    * reference the offset columns (cols.n / cols.m / `__noff` /
    * `__moff`) and `__bkt`.
    */
  def withStratumRank(
      df: DataFrame,
      stratum: String,
      score: String,
      tie: String,
      mass: Option[String] = None,
      buckets: Int = 1024,
      prune: Option[Column] = None,
      cols: Cols = Cols()): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(prune.isEmpty || mass.isDefined,
      "prune predicates reference the mass offsets (__moff/__m); pass mass")
    // order-preserving quantizer: higher score → higher bucket id
    val bkt = least(greatest(floor(col(score) * buckets), lit(0.0)),
      lit((buckets - 1).toDouble)).cast("int")
    val withBkt = df.withColumn("__bkt", bkt)

    // pass 1: tiny per-(stratum, bucket) aggregate (map-combined)
    val massAggs = mass.toSeq.map(mc => sum(col(mc)).as("__bm"))
    val tbl = withBkt.groupBy(col(stratum), col("__bkt"))
      .agg(count(lit(1)).as("__bn"), massAggs: _*)

    // pass 2: running offsets over the SMALL table — the only window
    // partitioned by the bare stratum, over ≤ `buckets` rows/stratum.
    // Bucket DESC mirrors score DESC.
    val wRun = Window.partitionBy(stratum).orderBy(col("__bkt").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(stratum)
    var off = tbl
      .withColumn("__noff", sum("__bn").over(wRun) - col("__bn"))
      .withColumn(cols.n, sum("__bn").over(wAll))
    if (mass.isDefined) off = off
      .withColumn("__moff", sum("__bm").over(wRun) - col("__bm"))
      .withColumn(cols.m, sum("__bm").over(wAll))
    val offKept = prune.fold(off)(off.filter)
    val offCols = Seq(col(stratum), col("__bkt"), col("__noff"), col(cols.n)) ++
      (if (mass.isDefined) Seq(col("__moff"), col(cols.m)) else Nil)

    // pass 3: fan the broadcast offsets back; all corpus-sized windows
    // below partition by (stratum, bucket) — the distributed sort.
    val wIn = Window.partitionBy(col(stratum), col("__bkt"))
      .orderBy(col(score).desc, col(tie).asc)
    var out = withBkt
      .join(broadcast(offKept.select(offCols: _*)), Seq(stratum, "__bkt"))
      .withColumn(cols.rank, col("__noff") + row_number().over(wIn))
    mass.foreach { mc =>
      out = out.withColumn(cols.cumBefore,
        col("__moff") +
          sum(col(mc)).over(wIn.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)) - col(mc))
    }
    out.drop("__bkt", "__noff", "__moff")
  }

  /** SQL-standard `ntile(k)` derived arithmetically from an exact rank:
    * with N rows, the first N mod k tiles hold ⌈N/k⌉ rows and the rest
    * ⌊N/k⌋ — identical to Spark's and DuckDB's NTILE. The tile is the
    * smallest t with rank ≤ t·⌊N/k⌋ + min(t, N mod k), found by k-1
    * integer comparisons (k is a small literal), so every step is exact
    * integer arithmetic. The one division, ⌊N/k⌋, divides the exactly
    * k-divisible (N − N mod k) — IEEE-exact for N ≤ 2^53, far past any
    * stratum size. Pair with [[withStratumRank]]'s rank/n columns.
    */
  def ntileOfRank(rank: Column, n: Column, k: Int): Column = {
    require(k >= 1, "ntile k must be ≥ 1")
    val rem = pmod(n.cast("long"), lit(k.toLong))
    val small = ((n.cast("double") - rem.cast("double")) / k).cast("long")
    var tile: Column = lit(k.toLong)
    var t = k - 1
    while (t >= 1) {
      val bound = lit(t.toLong) * small + least(lit(t.toLong), rem)
      tile = when(rank.cast("long") <= bound, lit(t.toLong)).otherwise(tile)
      t -= 1
    }
    tile
  }
}
