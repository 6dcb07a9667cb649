package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, NullType, StructField, StructType}

import scala.collection.mutable

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
  *      each bucket's row-rank / mass offset — computed ON THE DRIVER
  *      from the collected aggregate (≤ `buckets` rows per stratum —
  *      trivially small by construction, so no window, no exchange);
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
  * OVERSIZED cells no longer degenerate: a (stratum, bucket) cell
  * holding more than `atomBound` rows is split a second level by an
  * ORDER-PRESERVING quantization over the cell's own range (bounds
  * already in the pass-1 aggregate) — of the TIE column when the cell
  * is a single score atom (think deduped boilerplate at crawl scale:
  * millions of identical quality scores; in-cell order is pure tie
  * order there), of the SCORE when the cell holds multiple distinct
  * scores inside one primary sliver (descending quantization; equal
  * scores share a sub by construction). Either way
  * per-(stratum, bucket, sub) offsets extend the rank / cum algebra
  * exactly one level and the answer stays exact — a HASH of the tie
  * would spread the rows but lose the offset decomposition. Cells
  * containing nulls, or mixing NaN with numbers, never split. The
  * split is DATA-DEPENDENT planning done cheaply: the pass-1 aggregate
  * is COLLECTED by ONE driver action, the running offsets and the
  * split decision are plain driver arithmetic over those in-memory
  * rows (round 14 — the offset window and its exchange are gone from
  * the collect job entirely), and the fan-back broadcast ships driver
  * memory instead of re-running the aggregate.
  * With no oversized cell the emitted plan is exactly the pre-split
  * two-pass, zero extra corpus passes (and the broadcast carries only
  * the four offset columns, none of the split machinery); with one,
  * the sub-bucket counts add one extra consumer of the input, cheap
  * against the checkpointed narrow frames every caller feeds.
  * Collect-local beats both a persist and an eager localCheckpoint
  * here: one driver job, NO CacheManager entry to leak in a
  * long-lived session (persist registers a strong reference until
  * explicit unpersist — a kernel called per pipeline run accumulated
  * them), and lineage is trivially safe — the rows live on the
  * driver, so an executor lost mid-job can't lose them (a
  * non-replicated checkpoint block lost mid-job fails the query — the
  * wrong failure mode at 1000 executors). The table is already
  * broadcast-bound by construction (≤ #strata × buckets rows), so
  * collecting it moves no more data than the broadcast did.
  *
  * The split RECURSES one extra level (round-11 residual, closed): a
  * sub still holding more than `atomBound` rows tie-splits again when
  * it is a single-score ATOM — the dominant-score-inside-an-oversized-
  * multi-score-cell shape. That is exactly the set of subs where a
  * second split is both needed and valid: a mode-1 sub is an atom by
  * construction, and a mode-2 sub's in-sub order is pure tie order
  * only when it holds one score. Remaining residual (documented, not
  * hidden): an oversized mode-2 sub holding SEVERAL distinct scores —
  * >atomBound rows whose scores span less than 1/subBuckets of their
  * cell's score range — still lands on one task; raise `subBuckets`
  * if a caller ever shows that shape.
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
      atomBound: Int = 1 << 20,
      subBuckets: Int = 1024,
      cols: Cols = Cols()): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(atomBound > 0 && subBuckets > 0,
      "atomBound and subBuckets must be positive")
    require(prune.isEmpty || mass.isDefined,
      "prune predicates reference the mass offsets (__moff/__m); pass mass")
    // order-preserving quantizer: higher score → higher bucket id.
    // NaN routes to the TOP bucket explicitly: Spark orders NaN above
    // every double, but floor(NaN) narrows to long 0 — without the
    // guard a NaN score lands in the BOTTOM bucket and the kernel
    // ranks it last while the naive window ranks it first.
    val bkt = when(isnan(col(score).cast("double")), lit(buckets - 1))
      .otherwise(least(greatest(floor(col(score) * buckets), lit(0.0)),
        lit((buckets - 1).toDouble)).cast("int"))
    val withBkt = df.withColumn("__bkt", bkt)

    // pass 1: tiny per-(stratum, bucket) aggregate (map-combined);
    // tie range, score spread and NaN presence feed the oversized-cell
    // split decision
    val massAggs = mass.toSeq.map(mc => sum(col(mc)).as("__bm"))
    val tbl = withBkt.groupBy(col(stratum), col("__bkt"))
      .agg(count(lit(1)).as("__bn"),
        (Seq(count(col(score)).as("__bsn"),
          min(col(score)).as("__smin"), max(col(score)).as("__smax"),
          max(when(isnan(col(score).cast("double")), 1).otherwise(0))
            .as("__bnan"),
          min(col(tie)).as("__tmin"), max(col(tie)).as("__tmax")) ++
          massAggs): _*)

    // pass 2: running offsets over the SMALL table — ≤ `buckets` rows
    // per stratum BY CONSTRUCTION, so it runs ON THE DRIVER (round 14,
    // the r12 "fold the fast-path detection into pass 1" ask taken to
    // its end): collect the aggregate directly and compute the running
    // sums in plain arithmetic. The collect job now ENDS at the
    // map-combined aggregate — the per-stratum offset window, its
    // exchange and its sort are gone from the plan entirely — and the
    // split-mode / prune expressions below fold over the resulting
    // local relation without launching anything
    // (ConvertToLocalRelation). Long counts wrap like non-ANSI SQL sum;
    // mass sums arrive from pass 1 ALREADY WIDENED by Spark's sum()
    // (long for every integral mass, double for floating — all current
    // callers are long token counts), and the iteration order (bucket
    // DESC inside each stratum) reproduces the window frame's addition
    // order, so double rounding is bit-identical too. An exotic mass
    // sum type (decimal) keeps the original tiny-table Spark window so
    // SQL decimal arithmetic stays engine-exact. Bucket DESC mirrors
    // score DESC.
    val bmType: DataType =
      if (mass.isDefined) tbl.schema("__bm").dataType else NullType
    val driverPass2 =
      mass.isEmpty || bmType == LongType || bmType == DoubleType
    var off: DataFrame = if (driverPass2) {
      val aggSchema = tbl.schema
      val si = aggSchema.fieldIndex(stratum)
      val bki = aggSchema.fieldIndex("__bkt")
      val bni = aggSchema.fieldIndex("__bn")
      val bmi = if (mass.isDefined) aggSchema.fieldIndex("__bm") else -1
      // SQL sum semantics: nulls are skipped, an all-null run sums to
      // null; the offset subtraction then null-propagates like `-` does
      def plus(a: Any, b: Any): Any = (a, b) match {
        case (null, x) => x
        case (x, null) => x
        case (x: java.lang.Long, y: java.lang.Long) =>
          java.lang.Long.valueOf(x.longValue + y.longValue)
        case (x: java.lang.Double, y: java.lang.Double) =>
          java.lang.Double.valueOf(x.doubleValue + y.doubleValue)
      }
      def minus(a: Any, b: Any): Any =
        if (a == null || b == null) null
        else (a, b) match {
          case (x: java.lang.Long, y: java.lang.Long) =>
            java.lang.Long.valueOf(x.longValue - y.longValue)
          case (x: java.lang.Double, y: java.lang.Double) =>
            java.lang.Double.valueOf(x.doubleValue - y.doubleValue)
        }
      // boxed-value grouping matches Spark's group keys: the aggregate
      // already merged NaN strata (and normalized -0.0), so each
      // distinct collected stratum value IS one group
      val groups = mutable.LinkedHashMap.empty[Any, mutable.ArrayBuffer[Row]]
      tbl.collect().foreach { r =>
        groups.getOrElseUpdate(r.get(si), mutable.ArrayBuffer.empty[Row]) += r
      }
      val local = new java.util.ArrayList[Row]()
      groups.valuesIterator.foreach { rows =>
        val sorted = rows.sortBy(r => -r.getInt(bki))
        var totalN = 0L
        var totalM: Any = null
        sorted.foreach { r =>
          totalN += r.getLong(bni)
          if (bmi >= 0) totalM = plus(totalM, r.get(bmi))
        }
        var runN = 0L
        var runM: Any = null
        sorted.foreach { r =>
          val bn = r.getLong(bni)
          runN += bn
          var vals = r.toSeq ++ Seq(java.lang.Long.valueOf(runN - bn),
            java.lang.Long.valueOf(totalN))
          if (bmi >= 0) {
            val bm = r.get(bmi)
            runM = plus(runM, bm)
            vals = vals ++ Seq(minus(runM, bm), totalM)
          }
          local.add(Row.fromSeq(vals))
        }
      }
      val offSchema = StructType(aggSchema.fields ++
        (Seq(StructField("__noff", LongType, nullable = true),
          StructField(cols.n, LongType, nullable = true)) ++
          (if (mass.isDefined)
            Seq(StructField("__moff", bmType, nullable = true),
              StructField(cols.m, bmType, nullable = true))
          else Nil)))
      df.sparkSession.createDataFrame(local, offSchema)
    } else {
      val wRun = Window.partitionBy(stratum).orderBy(col("__bkt").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(stratum)
      var o = tbl
        .withColumn("__noff", sum("__bn").over(wRun) - col("__bn"))
        .withColumn(cols.n, sum("__bn").over(wAll))
      if (mass.isDefined) o = o
        .withColumn("__moff", sum("__bm").over(wRun) - col("__bm"))
        .withColumn(cols.m, sum("__bm").over(wAll))
      o
    }
    // OVERSIZED-cell split modes (rows > atomBound, no null scores):
    //   1 — a single score ATOM: in-cell order is pure tie order, so a
    //       tie-range quantization decomposes rank offsets exactly;
    //   2 — multiple distinct scores (no NaN mixing): in-cell order is
    //       score DESC first, so a DESCENDING score quantization over
    //       the cell's [smin, smax] decomposes the same way (equal
    //       scores share a sub by construction; tie order resolves
    //       inside the sub's window).
    // A cell mixing NaN with numbers never splits (NaN sorts above
    // every number, the quantizer arithmetic can't place it); an
    // all-NaN cell IS an atom (NaN = NaN in Spark SQL) → mode 1.
    off = off
      .withColumn("__smode", coalesce(
        when(col("__bn") > atomBound && col("__bsn") === col("__bn"),
          when(col("__smin") === col("__smax"), lit(1))
            .when(col("__bnan") === 0, lit(2))
            .otherwise(lit(0)))
          .otherwise(lit(0)), lit(0)))
      .withColumn("__w", greatest(lit(1.0),
        (col("__tmax").cast("double") - col("__tmin").cast("double") + 1.0) /
          subBuckets))
      .withColumn("__smaxd", col("__smax").cast("double"))
      .withColumn("__ws",
        (col("__smax").cast("double") - col("__smin").cast("double")) /
          subBuckets)
    // the offset table is TINY (≤ #strata × buckets rows — already
    // broadcast-bound by construction) and feeds everything below —
    // collect it in ONE driver action and rebuild it as a DRIVER-LOCAL
    // relation: the split decision reads the in-memory rows for free,
    // pass 1 + pass 2 run exactly once, the fan-back broadcast ships
    // driver memory instead of re-scanning anything, no CacheManager
    // entry leaks into a long-lived session, and executor loss can't
    // touch rows that live on the driver.
    val offCols = Seq(col(stratum), col("__bkt"), col("__noff"), col(cols.n),
      col("__smode"), col("__tmin"), col("__w"), col("__smaxd"),
      col("__ws")) ++
      (if (mass.isDefined) Seq(col("__moff"), col(cols.m)) else Nil)
    val offLocal = prune.fold(off)(off.filter).select(offCols: _*)
    val offRows = offLocal.collect()
    val spark = df.sparkSession
    val offKept = spark.createDataFrame(
      java.util.Arrays.asList(offRows: _*), offLocal.schema)
    val hasSplit = offRows.exists(_.getAs[Int]("__smode") != 0)

    // monotone sub-bucket maps. Mode 1: tie through double (monotone;
    // collisions only merge neighbors), clamp preserves order → sub
    // ASC ≡ tie ASC at sub granularity. Mode 2: (smax − score)/ws is
    // monotone DECREASING in score, so sub ASC ≡ score DESC at sub
    // granularity, and equal scores always share a sub.
    def clampSub(c: Column): Column =
      least(greatest(floor(c), lit(0.0)),
        lit((subBuckets - 1).toDouble)).cast("int")
    def subOf(tieCol: Column): Column =
      when(col("__smode") === 1,
        clampSub((tieCol.cast("double") - col("__tmin").cast("double")) /
          col("__w")))
        .when(col("__smode") === 2,
          clampSub((col("__smaxd") - col(score).cast("double")) / col("__ws")))
        .otherwise(lit(0))

    // the COMMON shape: no oversized atom anywhere → exactly the
    // pre-split plan (one fan-back join, (stratum, bucket) windows),
    // zero extra passes over the corpus — and the broadcast carries
    // ONLY the offset columns (the split machinery is known-unused
    // from the collected rows, so it never ships)
    if (!hasSplit) {
      val slimCols = Seq(col(stratum), col("__bkt"), col("__noff"),
        col(cols.n)) ++
        (if (mass.isDefined) Seq(col("__moff"), col(cols.m)) else Nil)
      val wIn = Window.partitionBy(col(stratum), col("__bkt"))
        .orderBy(col(score).desc, col(tie).asc)
      var out = withBkt
        .join(broadcast(offKept.select(slimCols: _*)), Seq(stratum, "__bkt"))
        .withColumn(cols.rank, col("__noff") + row_number().over(wIn))
      mass.foreach { mc =>
        out = out.withColumn(cols.cumBefore,
          col("__moff") +
            sum(col(mc)).over(wIn.rowsBetween(Window.unboundedPreceding,
              Window.currentRow)) - col(mc))
      }
      return out.drop("__bkt", "__noff", "__moff")
    }
    val offB = broadcast(offKept)

    // pass 2b (split cells exist): per-(stratum, bucket, sub) offsets
    // for SPLIT cells only — the aggregate input is a map-side
    // broadcast-join filter keeping split-bucket rows; the window runs
    // over ≤ subBuckets rows per cell and partitions by
    // (stratum, bucket), never the bare stratum. The aggregate also
    // carries each sub's score/tie bounds: they feed the SECOND-level
    // recursion below.
    val splitInfo = offKept.filter(col("__smode") =!= 0)
      .select(col(stratum), col("__bkt"), col("__smode"), col("__tmin"),
        col("__w"), col("__smaxd"), col("__ws"))
    val subMassAggs = mass.toSeq.map(mc => sum(col(mc)).as("__sbm"))
    val subTbl = withBkt.join(broadcast(splitInfo), Seq(stratum, "__bkt"))
      .withColumn("__sub", subOf(col(tie)))
      .groupBy(col(stratum), col("__bkt"), col("__sub"))
      .agg(count(lit(1)).as("__sbn"),
        (Seq(count(col(score)).as("__sbsn"),
          min(col(score)).as("__ssmin"), max(col(score)).as("__ssmax"),
          min(col(tie)).as("__stmin"), max(col(tie)).as("__stmax")) ++
          subMassAggs): _*)
    val wSubRun = Window.partitionBy(col(stratum), col("__bkt"))
      .orderBy(col("__sub").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var subOff = subTbl
      .withColumn("__snoff", sum("__sbn").over(wSubRun) - col("__sbn"))
    if (mass.isDefined) subOff = subOff
      .withColumn("__smoff", sum("__sbm").over(wSubRun) - col("__sbm"))
    // SECOND-level recursion (the round-11 residual, now closed): a sub
    // STILL holding more than atomBound rows tie-splits once more —
    // valid exactly when the sub is a single-score ATOM, because only
    // then is in-sub order pure tie order. A mode-1 sub always is (the
    // whole cell shares one score); a mode-2 sub is when one score
    // dominates its sliver — the shape that previously landed on one
    // task. All-NaN subs are atoms too (NaN = NaN in Spark SQL);
    // null-score rows never reach here (their cells never split).
    subOff = subOff
      .withColumn("__s2mode", coalesce(
        when(col("__sbn") > atomBound && col("__sbsn") === col("__sbn") &&
          col("__ssmin") === col("__ssmax"), lit(1)).otherwise(lit(0)),
        lit(0)))
      .withColumn("__w2", greatest(lit(1.0),
        (col("__stmax").cast("double") - col("__stmin").cast("double") + 1.0) /
          subBuckets))
    val subOffCols = Seq(col(stratum), col("__bkt"), col("__sub"),
      col("__snoff"), col("__s2mode"), col("__stmin"), col("__w2")) ++
      (if (mass.isDefined) Seq(col("__smoff")) else Nil)
    // same collect-local pattern as level 1 (the table is ≤ subBuckets
    // rows per split cell); the extra driver action exists only on the
    // already-rare split path
    val subLocal = subOff.select(subOffCols: _*)
    val subRows = subLocal.collect()
    val subKept = spark.createDataFrame(
      java.util.Arrays.asList(subRows: _*), subLocal.schema)
    val hasS2 = subRows.exists(_.getAs[Int]("__s2mode") != 0)
    val lvl1Cols = Seq(col(stratum), col("__bkt"), col("__sub"),
      col("__snoff")) ++
      (if (mass.isDefined) Seq(col("__smoff")) else Nil)

    // pass 3 (one split level — the common split shape): fan the
    // broadcast offsets back; all corpus-sized windows below partition
    // by (stratum, bucket, sub) — the distributed sort. Non-split rows
    // ride sub 0 with zero sub-offsets, reproducing the original
    // (stratum, bucket) partitioning exactly.
    if (!hasS2) {
      val wIn = Window.partitionBy(col(stratum), col("__bkt"), col("__sub"))
        .orderBy(col(score).desc, col(tie).asc)
      var out = withBkt
        .join(offB, Seq(stratum, "__bkt"))
        .withColumn("__sub", subOf(col(tie)))
        .join(broadcast(subKept.select(lvl1Cols: _*)),
          Seq(stratum, "__bkt", "__sub"), "left")
        .withColumn(cols.rank,
          col("__noff") + coalesce(col("__snoff"), lit(0L)) +
            row_number().over(wIn))
      mass.foreach { mc =>
        out = out.withColumn(cols.cumBefore,
          col("__moff") + coalesce(col("__smoff"), lit(0L)) +
            sum(col(mc)).over(wIn.rowsBetween(Window.unboundedPreceding,
              Window.currentRow)) - col(mc))
      }
      return out.drop("__bkt", "__sub", "__noff", "__moff", "__snoff",
        "__smoff", "__smode", "__tmin", "__w", "__smaxd", "__ws")
    }

    // pass 2c (an atom sub survived level 1): per-(stratum, bucket,
    // sub, sub2) offsets for s2 subs only; the window runs over ≤
    // subBuckets rows per sub and partitions by (stratum, bucket, sub)
    val s2Info = subKept.filter(col("__s2mode") =!= 0)
      .select(col(stratum), col("__bkt"), col("__sub"), col("__stmin"),
        col("__w2"))
    val s2MassAggs = mass.toSeq.map(mc => sum(col(mc)).as("__s2bm"))
    val s2Tbl = withBkt.join(broadcast(splitInfo), Seq(stratum, "__bkt"))
      .withColumn("__sub", subOf(col(tie)))
      .join(broadcast(s2Info), Seq(stratum, "__bkt", "__sub"))
      .withColumn("__sub2",
        clampSub((col(tie).cast("double") - col("__stmin").cast("double")) /
          col("__w2")))
      .groupBy(col(stratum), col("__bkt"), col("__sub"), col("__sub2"))
      .agg(count(lit(1)).as("__s2bn"), s2MassAggs: _*)
    val wS2Run = Window.partitionBy(col(stratum), col("__bkt"), col("__sub"))
      .orderBy(col("__sub2").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var s2Off = s2Tbl
      .withColumn("__s2noff", sum("__s2bn").over(wS2Run) - col("__s2bn"))
    if (mass.isDefined) s2Off = s2Off
      .withColumn("__s2moff", sum("__s2bm").over(wS2Run) - col("__s2bm"))
    val s2OffCols = Seq(col(stratum), col("__bkt"), col("__sub"),
      col("__sub2"), col("__s2noff")) ++
      (if (mass.isDefined) Seq(col("__s2moff")) else Nil)

    // pass 3 (two split levels): the corpus windows partition by
    // (stratum, bucket, sub, sub2); non-s2 rows ride sub2 0 with zero
    // offsets, so the one-level decomposition is reproduced exactly
    // and the s2 atom spreads over its tie-range quantiles
    val sub2 = when(col("__s2mode") === 1,
      clampSub((col(tie).cast("double") - col("__stmin").cast("double")) /
        col("__w2"))).otherwise(lit(0))
    val wIn = Window.partitionBy(col(stratum), col("__bkt"), col("__sub"),
        col("__sub2"))
      .orderBy(col(score).desc, col(tie).asc)
    var out = withBkt
      .join(offB, Seq(stratum, "__bkt"))
      .withColumn("__sub", subOf(col(tie)))
      .join(broadcast(subKept), Seq(stratum, "__bkt", "__sub"), "left")
      .withColumn("__sub2", sub2)
      .join(broadcast(s2Off.select(s2OffCols: _*)),
        Seq(stratum, "__bkt", "__sub", "__sub2"), "left")
      .withColumn(cols.rank,
        col("__noff") + coalesce(col("__snoff"), lit(0L)) +
          coalesce(col("__s2noff"), lit(0L)) +
          row_number().over(wIn))
    mass.foreach { mc =>
      out = out.withColumn(cols.cumBefore,
        col("__moff") + coalesce(col("__smoff"), lit(0L)) +
          coalesce(col("__s2moff"), lit(0L)) +
          sum(col(mc)).over(wIn.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)) - col(mc))
    }
    out.drop("__bkt", "__sub", "__sub2", "__noff", "__moff", "__snoff",
      "__smoff", "__s2noff", "__s2moff", "__smode", "__tmin", "__w",
      "__smaxd", "__ws", "__s2mode", "__stmin", "__w2")
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
